package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0 (initial watermark) so no row is born late
  private def ts(min: Long) = new Timestamp((120 + min) * 60000L)

  test("session windows merge within the gap, split across it, finalize once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingSessions.sessionAggregates(
      mem.toDF().toDF("user_id", "ts", "value"), gap = "5 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two bursts separated by > gap; user 2: one event
      mem.addData((1L, ts(0), 1.5), (1L, ts(2), 2.25), (2L, ts(1), 10.0))
      q.processAllAvailable()
      mem.addData((1L, ts(9), 4.0)) // > 5 min after ts(2): a NEW session
      q.processAllAvailable()
      // advance the watermark far enough to close and emit everything
      mem.addData((99L, ts(60), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .filter(col("user_id") === 1L)
        .orderBy(col("session_start"))
        .collect()
        .map(r => (r.getLong(3), r.getDouble(4)))
      assert(rows.toSeq == Seq((2L, 3.75), (1L, 4.0)),
        s"unexpected sessions ${rows.toSeq}")
      // sessions finalize exactly once (append mode): no duplicate rows
      val n = spark.table("sessions").filter(col("user_id") === 1L).count()
      assert(n == 2)
    } finally q.stop()
  }
}
