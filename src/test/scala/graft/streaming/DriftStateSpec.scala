package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.DriftState.{DriftAcc, ValueSample}

/** DriftState (streaming EWMA/CUSUM) semantics: incremental keyed state
  * across triggers must equal the batch fold over the concatenated
  * history — bit-for-bit, because both run the identical IEEE sequence
  * — and must equal the oracle-gated q_ewma outputs on the same data.
  */
class DriftStateSpec extends SparkSpec {
  import spark.implicits._

  private def batchFold(target: Double, vals: Seq[Double]): DriftAcc =
    DriftState.fold(target, "t", None,
      vals.zipWithIndex.map { case (v, i) => ValueSample("t", i.toLong, v) }.iterator)

  test("streaming increments across triggers == one batch fold") {
    val vals = Seq(4.0, 8.0, 3.5, 9.25, 2.0, 7.75, 5.5)
    val target = 6.0
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ValueSample]
    val out = DriftState(mem.toDS(), _ => target)
    val q = out.writeStream.format("memory").queryName("drift").outputMode("update").start()
    try {
      // three triggers of uneven size, seq continuing across them
      mem.addData(vals.take(2).zipWithIndex.map { case (v, i) => ValueSample("t", i.toLong, v) }: _*)
      q.processAllAvailable()
      mem.addData(vals.slice(2, 3).map(v => ValueSample("t", 2L, v)): _*)
      q.processAllAvailable()
      mem.addData(vals.drop(3).zipWithIndex.map { case (v, i) => ValueSample("t", (i + 3).toLong, v) }: _*)
      q.processAllAvailable()
      val last = spark.table("drift").orderBy(col("n").desc).as[DriftAcc].head()
      val expected = batchFold(target, vals)
      assert(last == expected) // exact double equality — same IEEE fold
      assert(last.n == vals.length.toLong)
    } finally q.stop()
  }

  test("state fold matches the oracle-gated q_ewma on real data") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
    // batch-calibrated CUSUM targets = the exact per-topic means q_ewma uses
    val targets = ev.groupBy(col("event_type"))
      .agg((graft.functions.Exact.exactSum(col("value")) / count(lit(1))).as("mean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val samples = ev
      .select(col("event_type").as("topic"), col("event_id").as("seq"), col("value"))
      .as[ValueSample]
    // one "trigger" over the whole table through the SAME update fn
    val folded = samples.collect().groupBy(_.topic).map { case (t, rows) =>
      t -> DriftState.fold(targets(t), t, None, rows.iterator)
    }
    val batch = graft.queries.DriftQueries.ewma(spark, sf).collect()
      .map(r => r.getAs[String]("topic") ->
        (r.getAs[Double]("ewma_last"), r.getAs[Double]("cusum"))).toMap
    assert(folded.keySet == batch.keySet)
    folded.foreach { case (t, acc) =>
      val (e6, c6) = batch(t)
      assert(math.rint(acc.ewma * 1e6) / 1e6 == e6, s"$t ewma")
      assert(math.rint(acc.cusum * 1e6) / 1e6 == c6, s"$t cusum")
    }
  }

  test("drift state survives checkpointed restart and keeps folding") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("drift_ckpt").toString
    val results = new java.util.concurrent.ConcurrentHashMap[Long, DriftAcc]()
    val mem = MemoryStream[ValueSample]
    def start() = DriftState(mem.toDS(), _ => 6.0).writeStream
      // memory sink cannot recover a checkpoint; foreachBatch can
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DriftAcc], _: Long) =>
        batch.collect().foreach(a => results.put(a.n, a))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()

    val vals = Seq(4.0, 8.0, 3.5, 9.25)
    val q1 = start()
    mem.addData(ValueSample("t", 1L, vals(0)), ValueSample("t", 2L, vals(1)))
    q1.processAllAvailable()
    q1.stop()
    // NEW query over the same checkpoint + stream: the restored state
    // must continue the fold, not restart it
    mem.addData(ValueSample("t", 3L, vals(2)), ValueSample("t", 4L, vals(3)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val last = results.get(4L)
      assert(last != null, "no emission with n=4 after restart — state lost or reset")
      assert(last == batchFold(6.0, vals), "restarted fold diverged from the batch fold")
    } finally q2.stop()
  }

  test("per-key isolation: an untouched key's state does not move") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ValueSample]
    val out = DriftState(mem.toDS(), _ => 0.0)
    val q = out.writeStream.format("memory").queryName("drift_iso").outputMode("update").start()
    try {
      mem.addData(ValueSample("a", 1L, 2.0), ValueSample("b", 1L, 10.0))
      q.processAllAvailable()
      mem.addData(ValueSample("a", 2L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("drift_iso").as[DriftAcc].collect()
      // b emitted once with n=1; a's latest has n=2 and folded both samples
      assert(rows.filter(_.topic == "b").map(_.n).max == 1L)
      val aLast = rows.filter(_.topic == "a").maxBy(_.n)
      assert(aLast.n == 2L && aLast.ewma == 2.0 * 0.75 + 4.0 * 0.25)
    } finally q.stop()
  }
}
