package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Semantics specs for the profiling / sequence-statistics operators
  * (q_profile, q_skew_report, q_transitions, q_autocorr, q_cms_topk)
  * on hand-built fixtures — the oracle gate proves cross-engine
  * parity; these pin behaviors the gate corpus may not exercise
  * (CMS one-sided error, zero-variance gating, null-key bucketing,
  * exact transition probabilities).
  */
class ProfilingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Option[Long], String, Long, Double)]): String = {
    // (event_id, user_id, event_type, ts_us, value)
    val dir = java.nio.file.Files.createTempDirectory("pev").toString
    rows.map { case (id, uid, tpe, tsUs, v) =>
      (id, new Timestamp(tsUs / 1000), uid, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---- q_transitions -------------------------------------------------

  test("transitions: per-user ordered bigrams with exact conditional probabilities") {
    val dir = writeEvents(Seq(
      (1L, Some(1L), "A", 1000000L, 0.0),
      (2L, Some(1L), "B", 2000000L, 0.0),
      (3L, Some(1L), "A", 3000000L, 0.0),
      (4L, Some(1L), "B", 4000000L, 0.0),
      (5L, Some(2L), "A", 1000000L, 0.0),
      (6L, Some(2L), "B", 2000000L, 0.0),
      (7L, None, "A", 9000000L, 0.0), // null user contributes no pair
    ))
    val out = TemporalQueries.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 2)
    assert(out(("A", "B")) == ((3L, 3L, 1.0))) // A->B from both users
    assert(out(("B", "A")) == ((1L, 1L, 1.0))) // only user 1 returns to A
  }

  test("transitions: sequence order is (ts, event_id), not insertion order") {
    val dir = writeEvents(Seq(
      // same timestamp: event_id breaks the tie -> A(1), B(2), C(3)
      (2L, Some(1L), "B", 1000000L, 0.0),
      (3L, Some(1L), "C", 1000000L, 0.0),
      (1L, Some(1L), "A", 1000000L, 0.0),
    ))
    val pairs = TemporalQueries.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("A", "B"), ("B", "C")))
  }

  // ---- q_autocorr ----------------------------------------------------

  test("autocorr: a linear ramp is perfectly lag-correlated at every k") {
    val dir = writeEvents((1L to 40L).map(i =>
      (i, Some(1L), "t", i * 1000000L, i.toDouble)))
    val out = TemporalQueries.autocorr(spark, dir).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(1, 2, 3))
    out.values.foreach(r => assert(math.abs(r - 1.0) < 1e-12))
  }

  test("autocorr: constant series has no variance and emits null r") {
    val dir = writeEvents((1L to 10L).map(i =>
      (i, Some(1L), "c", i * 1000000L, 7.25)))
    val out = TemporalQueries.autocorr(spark, dir).collect()
    assert(out.length == 3)
    assert(out.forall(_.isNullAt(3)))
  }

  test("autocorr: alternating series is negatively lag-1, positively lag-2 correlated") {
    val dir = writeEvents((1L to 41L).map(i =>
      (i, Some(1L), "alt", i * 1000000L, if (i % 2 == 0) 10.0 else 0.0)))
    val out = TemporalQueries.autocorr(spark, dir).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(1) < -0.9 && out(2) > 0.9 && out(3) < -0.9)
  }

  // ---- q_skew_report -------------------------------------------------

  test("skewReport: flags the hot key column and not the balanced one") {
    // 40 rows: user 9 owns 36 of them (skewed); event_type perfectly balanced
    val dir = writeEvents((1L to 40L).map { i =>
      val uid = if (i <= 36) 9L else i
      (i, Some(uid), if (i % 2 == 0) "A" else "B", 1000000L, 0.0)
    })
    val out = ProfileQueries.skewReport(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = out("user_id")
    assert(u.getAs[Long]("n_groups") == 5 && u.getAs[Long]("max_sz") == 36)
    assert(u.getAs[Boolean]("skewed")) // ratio 36 * 5 / 40 = 4.5 > 4
    val e = out("event_type")
    assert(e.getAs[Long]("n_groups") == 2 && !e.getAs[Boolean]("skewed"))
  }

  test("skewReport: null keys are bucketed, not dropped") {
    val dir = writeEvents(Seq(
      (1L, None, "A", 1000000L, 0.0),
      (2L, None, "A", 2000000L, 0.0),
      (3L, Some(5L), "A", 3000000L, 0.0),
    ))
    val u = ProfileQueries.skewReport(spark, dir).collect()
      .find(_.getString(0) == "user_id").get
    assert(u.getAs[Long]("n_rows") == 3) // the two null-user rows count
    assert(u.getAs[Long]("n_groups") == 2) // <null> is one bucket
  }

  // ---- q_cms_topk ----------------------------------------------------

  test("cmsTopk: estimates never undercount and the heavy key leads") {
    val dir = writeEvents((1L to 60L).map { i =>
      val uid = if (i <= 30) 1L else (i % 10) + 2L
      (i, Some(uid), "t", i * 1000000L, 0.0)
    })
    val out = SketchQueries.cmsTopk(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("cms_ge_exact")), "CMS undercounted a key")
    val top = out.head
    assert(top.getAs[Long]("user_id") == 1L && top.getAs[Long]("n_exact") == 30L)
    // with 11 keys in a 4x256 grid, collisions are absent: estimate exact
    assert(top.getAs[Long]("cms_estimate") == 30L)
  }
}
