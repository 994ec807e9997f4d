package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0: a row whose event time equals the query's
  // initial watermark (0) would be discarded as late
  private def ts(min: Long) = new Timestamp((60 + min) * 60000L)

  test("watermarked stream dedup drops in-horizon dups, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingDedup.dedupStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha", ts(0)), (2L, "beta", ts(1)))
      q.processAllAvailable()
      // same content inside the watermark horizon: suppressed
      mem.addData((3L, "alpha", ts(2)), (4L, "gamma", ts(3)))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select(col("doc_id")).collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L, 4L), s"unexpected emission set $got")
      // dedup state must be watermark-bounded, not corpus-sized: the
      // store holds at most the distinct in-horizon keys (3), and a
      // regression to plain dropDuplicates would show every key forever
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      assert(state.head.numRowsTotal <= 3L,
        s"dedup state ${state.head.numRowsTotal} rows exceeds in-horizon distinct keys")
    } finally q.stop()
  }

  test("stream-vs-corpus anti join emits only unseen content, no state operator") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("alpha", "beta").toDF("text")
      .select(md5(col("text")).as("content_md5"))
    val mem = MemoryStream[(Long, String)]
    val out = StreamingDedup.newContentStream(
      mem.toDF().toDF("doc_id", "text"), "text", corpus)
    val q = out.writeStream.format("memory").queryName("new_content")
      .outputMode("append").start()
    try {
      mem.addData((1L, "alpha"), (2L, "delta"), (3L, "beta"), (4L, "epsilon"))
      q.processAllAvailable()
      val got = spark.table("new_content").select(col("doc_id")).collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(2L, 4L))
      // stream-static joins are stateless: no state store in the progress
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}

/** Restart durability: dedup state must survive a query restart from
  * its checkpoint — a dup that arrived before the stop is still
  * suppressed after, from a NEW query object over the same checkpoint.
  */
class StreamingDedupRestartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)

  test("dedup state survives checkpointed restart; dup still suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def start(mem: MemoryStream[(Long, String, java.sql.Timestamp)]) =
      StreamingDedup.dedupStream(
          mem.toDF().toDF("doc_id", "text", "ts"), "ts", "text", "30 minutes")
        .writeStream
        // memory sink cannot recover a checkpoint; foreachBatch can
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select(col("doc_id")).collect().foreach(r => emitted.add(r.getLong(0)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val mem1 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q1 = start(mem1)
    mem1.addData((1L, "alpha", ts(0)), (2L, "beta", ts(1)))
    q1.processAllAvailable()
    q1.stop()
    assert(emitted.contains(1L) && emitted.contains(2L))

    // NEW query object over the same checkpoint and source (MemoryStream
    // offsets must stay aligned with the offset log); only new data
    // arrives — the restored state store must still remember alpha
    mem1.addData((3L, "alpha", ts(5)), (4L, "gamma", ts(6)))
    val q2 = start(mem1)
    try {
      q2.processAllAvailable()
      assert(!emitted.contains(3L),
        "restarted dedup re-emitted a pre-restart duplicate — state lost")
      assert(emitted.contains(4L), "restarted dedup suppressed genuinely new content")
    } finally q2.stop()
  }
}
