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
