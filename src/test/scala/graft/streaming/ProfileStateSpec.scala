package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.IncrementalProfile
import graft.streaming.ProfileState.{ColState, Obs}

/** ProfileState semantics: the streamed per-column state after N
  * triggers must equal the batch profile state over the concatenated
  * input (every metric is mergeable; the KMV leg rides the shared
  * KmvState.merge) — and the streamed relation must drive the batch
  * drift gate directly, because "the crawl's state is complete when
  * the stream closes" is the whole point.
  */
final case class ProfileStateSpecEv(
    event_id: java.lang.Long, ts: Timestamp, user_id: java.lang.Long,
    event_type: String, value: java.lang.Double, props: String)

class ProfileStateSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = ProfileStateSpecEv

  private val sf = "/root/testdata/sf0.001"

  private def eventsOf(parity: Int): Seq[Ev] =
    graft.queries.Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(2)) === parity)
      .orderBy(col("event_id"))
      .as[Ev].collect().toIndexedSeq

  /** Stream the rows in `nTriggers` chunks; return the final state rows. */
  private def streamed(rows: Seq[Ev], name: String, nTriggers: Int = 3): Seq[ColState] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ProfileState(ProfileState.observations(mem.toDF())).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / nTriggers)).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[ColState].collect()
        .groupBy(_.col_name).map { case (_, st) => st.maxBy(_.n_rows) }.toSeq
    } finally q.stop()
  }

  private def asStateDf(st: Seq[ColState]) =
    st.toDF().select(col("col_name"), col("n_rows"), col("cnt"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"), col("top"))

  test("streamed state over three triggers == batch profile state") {
    val got = streamed(eventsOf(0), "prof_state_a")
    val want = IncrementalProfile.stateOf(
      graft.queries.Tables.events(spark, sf).filter(pmod(col("event_id"), lit(2)) === 0))
      .collect().map { r =>
        ColState(r.getAs[String]("col_name"), r.getAs[Long]("n_rows"), r.getAs[Long]("cnt"),
          Option(r.getAs[java.lang.Double]("min_num")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("max_num")).map(_.doubleValue),
          Option(r.getAs[String]("min_str")), Option(r.getAs[String]("max_str")),
          Option(r.getAs[scala.collection.Seq[Long]]("top")).map(_.toList).getOrElse(Nil))
      }
    assert(got.map(_.col_name).toSet == want.map(_.col_name).toSet)
    val wantBy = want.map(s => s.col_name -> s).toMap
    got.foreach { g =>
      assert(g == wantBy(g.col_name), s"${g.col_name}: streamed != batch state")
    }
  }

  test("string extrema agree with batch beyond the BMP (UTF-8 vs UTF-16 order)") {
    // U+1F389 (🎉, UTF-16 surrogates D83C DF89, UTF-8 F0 9F 8E 89) vs
    // U+E000 (private use, UTF-8 EE 80 80): UTF-16 code-unit order puts
    // the emoji FIRST (D83C < E000), UTF-8 byte order puts it LAST
    // (F0 > EE). Batch min/max compare UTF8String bytes, so the fold
    // must too — Java compareTo diverged on exactly this pair.
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      ProfileStateSpecEv(1L, t0, 10L, "🎉x", 1.0, "p"),
      ProfileStateSpecEv(2L, t0, 11L, "x", 2.0, "p"),
      ProfileStateSpecEv(3L, t0, 12L, "mid", 3.0, "p"))
    val got = streamed(rows, "prof_state_bmp", nTriggers = 3)
      .filter(_.col_name == "event_type").head
    val want = IncrementalProfile.stateOf(rows.toDF())
      .filter(col("col_name") === "event_type").collect().head
    assert(got.min_str.contains(want.getAs[String]("min_str")) &&
      got.max_str.contains(want.getAs[String]("max_str")),
      s"extrema order diverged: streamed (${got.min_str}, ${got.max_str}) vs " +
        s"batch (${want.getAs[String]("min_str")}, ${want.getAs[String]("max_str")})")
    assert(got.max_str.contains("🎉x"),
      "UTF-8 byte order must rank the supplementary-plane char last")
  }

  test("streamed states drive the batch drift gate directly") {
    val a = asStateDf(streamed(eventsOf(0), "prof_drift_a"))
    val b = asStateDf(streamed(eventsOf(1), "prof_drift_b"))
    val viaStream = IncrementalProfile.driftOf(a, b)
      .collect().map(_.toString).toSet
    val viaBatch = IncrementalProfile.profileDrift(spark, sf)
      .collect().map(_.toString).toSet
    assert(viaStream == viaBatch,
      s"drift gate diverged:\nonly-stream=${viaStream -- viaBatch}\nonly-batch=${viaBatch -- viaStream}")
  }
}
