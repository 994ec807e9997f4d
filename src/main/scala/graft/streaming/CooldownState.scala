package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupState

import graft.core.Dsl

/** Streaming form of the anomaly re-emit cooldown (reference:
  * lib/dsl/DSLHandler.js:13,200-210): keyed state holding the last
  * emitted event-time per (topic, path, window_sec); an anomaly is
  * emitted iff no anomaly for its key was emitted in the previous
  * `cooldownMs` of event time.
  *
  * Used with `KeyValueGroupedDataset.flatMapGroupsWithState`; the batch
  * oracle is [[graft.operators.Cooldown.applyBatch]] — the two are
  * asserted equivalent on replayed input in StreamingSpec.
  */
object CooldownState {

  final case class AnomalyEvent(
      topic: String,
      path: String,
      window_sec: Long,
      produced_us: Long,
      value: Double,
      mean: Double,
      stddev_pop: Double,
      three_sigma: Double,
  )

  final case class LastEmit(lastEmitUs: Long)

  /** Per-key state update: sort the group's anomalies by event time and
    * greedily emit those >= cooldown past the last emitted one. State
    * persists across triggers, so suppression spans micro-batches.
    */
  def update(
      cooldownMs: Long,
  )(key: (String, String, Long), rows: Iterator[AnomalyEvent], state: GroupState[LastEmit]): Iterator[AnomalyEvent] = {
    val sorted = rows.toArray.sortBy(e => (e.produced_us, e.value))
    var last = state.getOption.map(_.lastEmitUs).getOrElse(Long.MinValue)
    val out = Seq.newBuilder[AnomalyEvent]
    sorted.foreach { e =>
      if (last == Long.MinValue || e.produced_us - last >= cooldownMs * 1000L) {
        last = e.produced_us
        out += e
      }
    }
    if (last != Long.MinValue) state.update(LastEmit(last))
    out.result().iterator
  }

  /** Apply over a (possibly streaming) typed Dataset. */
  def apply(
      ds: Dataset[AnomalyEvent],
      cooldownMs: Long = Dsl.CooldownMs,
      outputMode: org.apache.spark.sql.streaming.OutputMode = org.apache.spark.sql.streaming.OutputMode.Update(),
  ): Dataset[AnomalyEvent] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong)
    implicit val evEnc = Encoders.product[AnomalyEvent]
    implicit val stateEnc = Encoders.product[LastEmit]
    ds.groupByKey(e => (e.topic, e.path, e.window_sec))
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(cooldownMs))
  }
}
