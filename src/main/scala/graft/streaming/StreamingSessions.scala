package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Native event-time session windows for the stream — the streaming
  * form of the batch gap-sessionization (`q_sessionize`): Spark's
  * `session_window` merges events into per-key sessions that close
  * after `gap` of event-time silence, finalized by the watermark.
  *
  * Scale: session aggregation state is per OPEN session (bounded by
  * active keys × gap horizon, not stream length); sums use the same
  * exact-decimal fold as the batch path so a session's aggregate is
  * bit-identical to the batch recomputation over the same rows.
  */
object StreamingSessions {

  /** Per-(user) session aggregates with a `gap` inactivity window.
    * Append-mode: a session row emits once, when the watermark passes
    * its close.
    */
  def sessionAggregates(input: DataFrame, gap: String,
      watermark: String = "10 minutes"): DataFrame =
    input
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("session"))
      .agg(
        count(lit(1)).as("n_events"),
        round(Exact.exactSum(col("value")), 6).as("sum_value"))
      .select(
        col("user_id"),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
