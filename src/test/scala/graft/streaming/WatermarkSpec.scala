package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native watermark-driven windowed aggregation — the principled
  * late-data/retention mechanism SURVEY.md §2.5 calls a semantic
  * upgrade over the reference's wall-clock retention deletes (S6):
  * state for windows older than the watermark is evicted by Spark
  * itself, and events later than the watermark are dropped.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def at(sec: Long) = new Timestamp(t0 + sec * 1000)

  test("windowed counts finalize when the watermark passes; late events are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Timestamp)]
    val agg = mem.toDF().toDF("topic", "value", "ts")
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "1 minute").as("w"), col("topic"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .select(col("w.start").as("w_start"), col("topic"), col("n"), col("s"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append") // append emits a window only once it is final
      .start()

    // minute 0 gets 3 events; then time advances far enough that the
    // watermark (max ts - 30 s) passes the end of minute 0
    mem.addData(("t", 1.0, at(10)), ("t", 2.0, at(20)), ("t", 3.0, at(50)))
    q.processAllAvailable()
    mem.addData(("t", 4.0, at(120))) // advances watermark to 01:30
    q.processAllAvailable()
    // a straggler for the already-finalized minute 0 must be DROPPED
    mem.addData(("t", 100.0, at(15)))
    q.processAllAvailable()
    mem.addData(("t", 5.0, at(200))) // advance again; no re-emit of minute 0
    q.processAllAvailable()
    mem.addData(("t", 6.0, at(300))) // watermark 04:30 -> finalizes minutes 2-3
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm_out").collect()
      .map(r => (r.getTimestamp(0).getTime - t0) / 1000 -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(0L) == ((3L, 6.0)), s"minute-0 window wrong: $rows") // late 100.0 NOT included
    assert(rows(120L) == ((1L, 4.0)), s"minute-2 window wrong: $rows")
    assert(rows(180L) == ((1L, 5.0)), s"minute-3 window wrong: $rows")
  }
}
