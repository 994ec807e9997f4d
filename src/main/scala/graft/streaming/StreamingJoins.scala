package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming form of the
  * batch range join (`q_range_join`): each trigger event is joined to
  * the same user's action events landing within `[t_ts, t_ts + horizon]`
  * event time. The canonical attribution shape (click → purchase,
  * alert → acknowledgement).
  *
  * Scale: with BOTH sides watermarked and the join condition carrying
  * an explicit event-time bound, Spark prunes join state to the
  * watermark-plus-horizon window — state is bounded by in-flight event
  * volume, never stream length. The equi half (`user_id`) hash
  * partitions both sides alike, so each task joins only its key slice;
  * without the time bound the same join would accumulate state forever
  * (and Spark would reject it in append mode).
  */
object StreamingJoins {

  /** Inner-join triggers to same-user actions within `horizon` after
    * the trigger. Both inputs need (`event_id`, `ts`, `user_id`,
    * `value`) columns; late rows beyond `watermark` are dropped on
    * their own side before the join.
    */
  def attributedActions(triggers: DataFrame, actions: DataFrame,
      horizon: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val t = triggers
      .withWatermark("ts", watermark)
      .select(col("event_id").as("trigger_id"), col("ts").as("trigger_ts"),
        col("user_id"))
    val a = actions
      .withWatermark("ts", watermark)
      .select(col("event_id").as("action_id"), col("ts").as("action_ts"),
        col("user_id").as("action_user"), col("value"))
    t.join(a,
      col("user_id") === col("action_user") &&
        col("action_ts") >= col("trigger_ts") &&
        col("action_ts") <= col("trigger_ts") + expr(s"INTERVAL $horizon"))
      .select(col("trigger_id"), col("user_id"), col("trigger_ts"),
        col("action_id"), col("action_ts"), col("value"))
  }
}
