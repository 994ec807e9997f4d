package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.KmvState.{Estimate, KeyedHash}

/** KmvState semantics: the streamed sketch after N triggers must equal
  * the batch sketch over the concatenated input — KMV mergeability —
  * and therefore match the oracle-gated q_kmv_distinct on the same
  * data.
  */
class KmvStateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The batch query's hash derivation, reused verbatim. */
  private def hashes = {
    val ev = graft.queries.Tables.events(spark, sf).filter(col("event_type").isNotNull)
    val day = expr("unix_micros(ts) div 86400000000")
    ev.select(
      col("event_type").as("topic"),
      conv(substring(md5(concat(col("user_id").cast("string"), lit(":"), day.cast("string"))), 1, 15),
        16, 10).cast("long").as("hv"),
      col("event_id"))
  }

  test("streamed sketch over three triggers == batch q_kmv_distinct") {
    val rows = hashes.orderBy(col("event_id")).as[(String, Long, Long)].collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedHash]
    val q = KmvState(mem.toDS()).writeStream
      .format("memory").queryName("kmv").outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk.map(r => KeyedHash(r._1, r._2)).toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("kmv").as[Estimate].collect()
        .groupBy(_.topic).map { case (t, es) => t -> es.maxBy(_.n_seen) }
      val batch = graft.queries.SketchQueries.kmvDistinct(spark, sf).collect()
        .map(r => r.getAs[String]("topic") ->
          (r.getAs[Long]("kth_hash"), r.getAs[Double]("kmv_estimate"))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (t, e) =>
        val (kth, est) = batch(t)
        assert(e.kth_hash == kth, s"$t kth")
        assert(math.rint(e.estimate * 1e6) / 1e6 == est, s"$t estimate")
      }
    } finally q.stop()
  }

  test("merge keeps the k smallest distinct across duplicate-heavy input") {
    val held = KmvState.merge(Seq(10L, 20L, 30L), Iterator(20L, 5L, 40L, 5L), k = 4)
    assert(held == Seq(5L, 10L, 20L, 30L))
    // below-k sketches estimate exactly
    assert(KmvState.estimate("t", 7L, held, k = 64).estimate == 4.0)
  }
}
