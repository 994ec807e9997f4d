package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the EWMA/CUSUM drift statistics
  * ([[graft.queries.DriftQueries.ewma]]): keyed state carrying the
  * running fold per topic, advanced by each micro-batch — O(1) state
  * per key where the batch form folds the whole history. This is the
  * operator the batch query's scale note points at: the fold
  * `s ← s·0.75 + x·0.25` / `c ← max(0, c + (x − target))` runs the
  * SAME IEEE operations here as in the batch `functions.aggregate`
  * (asserted equal in DriftStateSpec), so a pipeline can calibrate in
  * batch and monitor in streaming without a semantic seam.
  *
  * CUSUM needs its reference level up front: `target` maps each topic
  * to the expected mean (from a calibration batch or the DSL), the
  * standard split — EWMA self-initializes from the first sample.
  */
object DriftState {

  /** One observed sample; `seq` orders samples within a trigger (the
    * event-id / offset — replay-stable like the cooldown sort).
    */
  final case class ValueSample(topic: String, seq: Long, value: Double)

  /** Running fold state = the emitted statistic per trigger. */
  final case class DriftAcc(topic: String, n: Long, ewma: Double, cusum: Double)

  /** Advance the fold over one batch of samples (sorted by seq), from
    * `acc0` — `None` = key never seen. Shared by the streaming state
    * update and the batch-equivalence spec.
    */
  def fold(
      target: Double, topic: String, acc0: Option[DriftAcc],
      rows: Iterator[ValueSample],
  ): DriftAcc = {
    var acc = acc0.getOrElse(DriftAcc(topic, 0L, 0.0, 0.0))
    rows.toArray.sortBy(_.seq).foreach { s =>
      val e = if (acc.n == 0L) s.value else acc.ewma * 0.75 + s.value * 0.25
      val c = math.max(0.0, acc.cusum + (s.value - target))
      acc = DriftAcc(topic, acc.n + 1L, e, c)
    }
    acc
  }

  /** Per-key state update: fold the batch into the stored accumulator
    * and emit the refreshed statistic (one row per key per trigger).
    */
  def update(target: String => Double)(
      topic: String, rows: Iterator[ValueSample], state: GroupState[DriftAcc],
  ): Iterator[DriftAcc] = {
    val acc = fold(target(topic), topic, state.getOption, rows)
    if (acc.n > 0L) state.update(acc)
    Iterator.single(acc)
  }

  /** Apply over a (possibly streaming) typed Dataset of samples. */
  def apply(
      ds: Dataset[ValueSample],
      target: String => Double,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[DriftAcc] = {
    implicit val keyEnc = Encoders.STRING
    implicit val accEnc = Encoders.product[DriftAcc]
    ds.groupByKey(_.topic)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(target))
  }
}
