package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((120 + min) * 60000L)

  private val triggers = Seq(
    (1L, ts(0), 10L, 0.0),  // user 10: actions at +2 (in) and +9 (out)
    (2L, ts(1), 20L, 0.0),  // user 20: action at +5 boundary (in)
    (3L, ts(0), 30L, 0.0),  // user 30: no action
  )
  private val actions = Seq(
    (101L, ts(2), 10L, 1.5),
    (102L, ts(9), 10L, 2.5),  // > 5 min after the user-10 trigger
    (103L, ts(6), 20L, 7.0),  // exactly horizon after ts(1)
    (104L, ts(3), 99L, 9.0),  // user with no trigger
  )
  private val cols = Seq("event_id", "ts", "user_id", "value")

  test("stream-stream interval join matches the batch join on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val memT = MemoryStream[(Long, Timestamp, Long, Double)]
    val memA = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = StreamingJoins.attributedActions(
      memT.toDF().toDF(cols: _*), memA.toDF().toDF(cols: _*))
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      memT.addData(triggers: _*)
      memA.addData(actions.take(2): _*)
      q.processAllAvailable()
      memA.addData(actions.drop(2): _*)
      q.processAllAvailable()
      // push both watermarks past every row so all matches finalize
      memT.addData((998L, ts(60), 77L, 0.0))
      memA.addData((999L, ts(60), 77L, 0.0))
      q.processAllAvailable()

      val streamed = spark.table("attrib")
        .filter(col("trigger_id") < 900L)
        .select(col("trigger_id"), col("action_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = StreamingJoins.attributedActions(
        triggers.toDF(cols: _*), actions.toDF(cols: _*))
        .select(col("trigger_id"), col("action_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch == Set((1L, 101L, 1.5), (2L, 103L, 7.0)),
        s"unexpected batch attribution $batch")
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("join state is pruned by the watermark (no unbounded buffering)") {
    implicit val sqlCtx = spark.sqlContext
    val memT = MemoryStream[(Long, Timestamp, Long, Double)]
    val memA = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = StreamingJoins.attributedActions(
      memT.toDF().toDF(cols: _*), memA.toDF().toDF(cols: _*))
    val q = out.writeStream.format("memory").queryName("attrib_prune")
      .outputMode("append").start()
    try {
      memT.addData((1L, ts(0), 10L, 0.0))
      memA.addData((101L, ts(2), 10L, 1.5))
      q.processAllAvailable()
      // move event time far ahead; then a very late action for the old
      // trigger must NOT match (watermark already discarded that state)
      memT.addData((2L, ts(120), 50L, 0.0))
      memA.addData((201L, ts(120), 50L, 0.0))
      q.processAllAvailable()
      memA.addData((102L, ts(3), 10L, 9.9)) // late by ~2h vs watermark
      q.processAllAvailable()
      val got = spark.table("attrib_prune")
        .select(col("action_id")).as[Long].collect().toSet
      assert(!got.contains(102L), s"late action joined: $got")
      assert(got.contains(101L))
    } finally q.stop()
  }
}
