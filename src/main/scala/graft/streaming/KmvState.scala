package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.SketchQueries

/** Streaming form of the KMV distinct sketch
  * ([[graft.queries.SketchQueries.kmvDistinct]]): keyed state holding
  * the k smallest distinct hashes ever seen per topic — KMV's
  * mergeability is exactly what makes it streamable: merging a
  * trigger's hashes into the held set IS the sketch union, so the
  * state after any prefix of triggers equals the batch sketch over the
  * concatenated input (KmvStateSpec asserts this against the
  * oracle-gated batch query). State is O(k) per key forever; the
  * estimate refreshes every trigger — live cardinality monitoring
  * without `approx_count_distinct`'s non-reproducible randomness.
  */
object KmvState {

  /** One hashed observation (hash via the same md5-derived 60-bit
    * uniform hash the batch sketch uses).
    */
  final case class KeyedHash(topic: String, hv: Long)

  /** Held sketch: the ≤ k smallest distinct hashes (ascending) plus the
    * cumulative observation count (monotone — identifies the latest
    * emission downstream, update-mode sinks carry no trigger order).
    */
  final case class Sketch(topic: String, seen: Long, ks: Seq[Long])

  /** Emitted per trigger: observations folded, sketch size, k-th
    * minimum, estimate.
    */
  final case class Estimate(
      topic: String, n_seen: Long, n_held: Int, kth_hash: Long, estimate: Double)

  /** Merge new hashes into a held sketch (set union, keep k smallest). */
  def merge(held: Seq[Long], incoming: Iterator[Long], k: Int = SketchQueries.KmvK): Seq[Long] = {
    val set = scala.collection.mutable.SortedSet.empty[Long]
    set ++= held
    incoming.foreach { h =>
      if (set.size < k) set += h
      else if (h < set.last && !set.contains(h)) { set += h; set -= set.last }
    }
    set.toSeq
  }

  /** The batch estimator, shared via [[SketchQueries.kmvEstimateOf]] so
    * the streamed estimate can never drift from the oracle-gated one.
    */
  def estimate(topic: String, seen: Long, ks: Seq[Long], k: Int = SketchQueries.KmvK): Estimate = {
    val kth = if (ks.isEmpty) 0L else ks.last
    Estimate(topic, seen, ks.size, kth, SketchQueries.kmvEstimateOf(ks.size, kth, k))
  }

  def update(k: Int)(
      topic: String, rows: Iterator[KeyedHash], state: GroupState[Sketch],
  ): Iterator[Estimate] = {
    var n = 0L
    val counted = rows.map { r => n += 1L; r.hv }
    val merged = merge(state.getOption.map(_.ks).getOrElse(Nil), counted, k)
    val seen = state.getOption.map(_.seen).getOrElse(0L) + n
    state.update(Sketch(topic, seen, merged))
    Iterator.single(estimate(topic, seen, merged, k))
  }

  /** Apply over a (possibly streaming) typed Dataset of keyed hashes. */
  def apply(
      ds: Dataset[KeyedHash],
      k: Int = SketchQueries.KmvK,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[Estimate] = {
    implicit val keyEnc = Encoders.STRING
    implicit val estEnc = Encoders.product[Estimate]
    implicit val sketchEnc = Encoders.product[Sketch]
    ds.groupByKey(_.topic)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(k))
  }
}
