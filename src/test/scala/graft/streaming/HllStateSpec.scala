package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.HllState.{Estimate, KeyedHash}

/** HllState semantics: the streamed register state after N triggers
  * must equal the batch sketch over the concatenated input (HLL
  * register-max mergeability) and therefore match the oracle-gated
  * q_hll_distinct on the same data.
  */
class HllStateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The batch query's key + hash derivation, reused verbatim. */
  private def hashes = {
    val ev = graft.queries.Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val day = expr("unix_micros(ts) div 86400000000")
    val keys = ev.select(col("event_id"), explode(array(
      struct(lit("user_id").as("col_name"), col("user_id").cast("string").as("k")),
      struct(lit("user_day").as("col_name"),
        concat(col("user_id").cast("string"), lit(":"), day.cast("string")).as("k")),
    )).as("ck")).select(col("event_id"), col("ck.col_name").as("topic"), col("ck.k").as("k"))
    keys.select(col("event_id"), col("topic"),
      conv(substring(md5(concat(lit("hll|"), col("k"))), 1, 15), 16, 10)
        .cast("long").as("hv"))
  }

  test("streamed registers over three triggers == batch q_hll_distinct") {
    val rows = hashes.orderBy(col("event_id"), col("topic"))
      .select(col("topic"), col("hv")).as[(String, Long)].collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedHash]
    val q = HllState(mem.toDS()).writeStream
      .format("memory").queryName("hll").outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk.map(r => KeyedHash(r._1, r._2)).toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("hll").as[Estimate].collect()
        .groupBy(_.topic).map { case (t, es) => t -> es.maxBy(_.n_seen) }
      val batch = graft.queries.SketchQueries.hllDistinct(spark, sf).collect()
        .map(r => r.getAs[String]("col_name") ->
          (r.getAs[Long]("n_hit"), r.getAs[Long]("harmonic_num"),
            r.getAs[Double]("hll_estimate"))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (t, e) =>
        val (nHit, num, est) = batch(t)
        assert(e.n_hit == nHit, s"$t n_hit")
        assert(e.harmonic_num == num, s"$t harmonic_num")
        assert(e.estimate == est, s"$t estimate")
      }
    } finally q.stop()
  }

  test("merge is register-wise max and duplicate-insensitive") {
    val m = graft.queries.SketchQueries.HllM
    val a = HllState.merge(IndexedSeq.empty, Iterator(513L, 513L, 257L))
    // 513 = 2*256 + 1 -> reg 1, w 2, rank 53-2 = 51; 257 -> reg 1, w 1, rank 52
    assert(a(1) == 52 && a.count(_ > 0) == 1)
    val b = HllState.merge(a, Iterator(514L)) // 514 -> reg 2, w 2, rank 51
    assert(b(1) == 52 && b(2) == 51)
    assert(b.length == m)
    // merging the same observations again changes nothing
    assert(HllState.merge(b, Iterator(513L, 257L, 514L)) == b)
  }
}
