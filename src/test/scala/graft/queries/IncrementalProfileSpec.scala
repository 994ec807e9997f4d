package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental profile: (a) the merged snapshot states reproduce
  * the single-pass approximate profile EXACTLY (the KMV merge is
  * set-union + trim — the k smallest distinct of A ∪ B equal the k
  * smallest distinct of the two kept sets, so bit-equality is the
  * contract, not a tolerance); (b) once the states exist the nightly
  * assembly's physical plan contains no events scan; (c) planted
  * states trip each drift threshold independently.
  */
class IncrementalProfileSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("merged snapshot states == single-pass approximate profile") {
    val inc = IncrementalProfile.profileIncremental(spark, sf)
      .collect().map(_.toString).toSet
    val full = ProfileQueries.profileApprox(spark, sf)
      .collect().map(_.toString).toSet
    assert(inc == full,
      s"merged-state and single-pass profiles diverged:\nonly-inc=${inc -- full}\nonly-full=${full -- inc}")
  }

  test("the nightly profile reads no raw rows: no events scan in the plan") {
    IncrementalProfile.profileIncremental(spark, sf).count() // warm states
    val plan = IncrementalProfile.profileIncremental(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"incremental profile must not scan the events table:\n$plan")
  }

  // crafted event rows: (event_id, ts, user_id, event_type, value, props)
  private def ev(rows: Seq[(Long, String, java.lang.Long, String, java.lang.Double, String)]) =
    rows.map { case (id, ts, u, t, v, p) => (id, Timestamp.valueOf(ts), u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("planted states trip each drift threshold independently") {
    val base = ev(Seq(
      (0L, "2026-01-01 00:00:00", 1L, "view", 1.5, "{}"),
      (2L, "2026-01-01 00:00:01", 2L, "click", 2.5, "{}"),
      (4L, "2026-01-01 00:00:02", 3L, "view", 3.5, "{}"),
      (6L, "2026-01-01 00:00:03", 4L, "click", 4.5, "{}"),
    ))
    val stA = IncrementalProfile.stateOf(base)

    // null-rate shift: crawl B loses half its props values
    val nulled = ev(Seq(
      (1L, "2026-01-01 00:00:04", 5L, "view", 1.5, null),
      (3L, "2026-01-01 00:00:05", 6L, "click", 2.5, null),
      (5L, "2026-01-01 00:00:06", 7L, "view", 3.5, "{}"),
      (7L, "2026-01-01 00:00:07", 8L, "click", 4.5, "{}"),
    ))
    val d1 = IncrementalProfile.driftOf(stA, IncrementalProfile.stateOf(nulled))
      .filter(col("col_name") === "props").collect().head
    assert(d1.getAs[Double]("null_shift") === 0.5)
    assert(d1.getAs[Boolean]("drifted"), "a 0.5 null-rate shift must flag")

    // range expansion: crawl B's value field escapes history's range
    val widened = ev(Seq(
      (1L, "2026-01-01 00:00:04", 5L, "view", 99.0, "{}"),
      (3L, "2026-01-01 00:00:05", 6L, "click", 2.5, "{}"),
    ))
    val d2 = IncrementalProfile.driftOf(stA, IncrementalProfile.stateOf(widened))
      .filter(col("col_name") === "value").collect().head
    assert(d2.getAs[Boolean]("new_max") && !d2.getAs[Boolean]("new_min"))
    assert(d2.getAs[Boolean]("drifted"), "a range escape must flag")

    // cardinality collapse: crawl B's event_type field froze to one value
    val collapsed = ev((0 until 8).map(i =>
      (i * 2L + 1L, s"2026-01-01 00:01:0$i", 10L + i, "view", 1.0, "{}")))
    val d3 = IncrementalProfile.driftOf(stA, IncrementalProfile.stateOf(collapsed))
      .filter(col("col_name") === "event_type").collect().head
    assert(d3.getAs[Double]("nd_ratio") === 0.5)
    assert(d3.getAs[Boolean]("drifted") === false,
      "ratio exactly 0.5 sits ON the boundary and must not flag")

    // dead column comes alive: history's props is ALL NULL (nd_kmv_a =
    // 0 — the zero-denominator case), crawl B has values. `drifted`
    // must be a concrete TRUE (never a NULL from IEEE division) and the
    // undefined ratio stays NULL on both engines.
    val deadA = ev(Seq(
      (0L, "2026-01-01 00:00:00", 1L, "view", 1.5, null),
      (2L, "2026-01-01 00:00:01", 2L, "click", 2.5, null),
    ))
    val alive = ev(Seq(
      (1L, "2026-01-01 00:00:04", 5L, "view", 1.5, "{}"),
      (3L, "2026-01-01 00:00:05", 6L, "click", 2.5, "{}"),
    ))
    val d5 = IncrementalProfile.driftOf(IncrementalProfile.stateOf(deadA),
        IncrementalProfile.stateOf(alive))
      .filter(col("col_name") === "props").collect().head
    assert(!d5.isNullAt(d5.fieldIndex("drifted")) && d5.getAs[Boolean]("drifted"),
      s"a dead column coming alive must flag with a concrete boolean: $d5")
    assert(d5.isNullAt(d5.fieldIndex("nd_ratio")),
      s"the 0-denominator ratio is undefined and must stay NULL: $d5")

    // both dead: no cardinality signal — ratio pins to 1.0, no drift
    val deadB = ev(Seq(
      (1L, "2026-01-01 00:00:02", 1L, "view", 1.5, null),
      (3L, "2026-01-01 00:00:03", 2L, "click", 2.5, null),
    ))
    val d6 = IncrementalProfile.driftOf(IncrementalProfile.stateOf(deadA),
        IncrementalProfile.stateOf(deadB))
      .filter(col("col_name") === "props").collect().head
    assert(d6.getAs[Double]("nd_ratio") === 1.0 && !d6.getAs[Boolean]("drifted"),
      s"two dead snapshots agree (ratio 1.0, no drift): $d6")

    // an in-range, same-shape crawl does not drift
    // ids stay inside history's [0, 6] range (7 would be a genuine —
    // and correctly flagged — event_id range escape)
    val calm = ev(Seq(
      (1L, "2026-01-01 00:00:02", 3L, "view", 3.5, "{}"),
      (3L, "2026-01-01 00:00:03", 4L, "click", 4.5, "{}"),
      (5L, "2026-01-01 00:00:01", 2L, "click", 2.5, "{}"),
      (5L, "2026-01-01 00:00:00", 1L, "view", 1.5, "{}"),
    ))
    val d4 = IncrementalProfile.driftOf(stA, IncrementalProfile.stateOf(calm)).collect()
    assert(d4.forall(!_.getAs[Boolean]("drifted")),
      s"a same-shape crawl must not drift: ${d4.mkString("\n")}")
  }
}
