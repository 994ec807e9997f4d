package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.SketchQueries

/** Streaming form of the HLL distinct sketch
  * ([[graft.queries.SketchQueries.hllDistinct]]): keyed state holding
  * the m register max-ranks per topic. HLL's register-wise-max merge is
  * exactly what makes it streamable — folding a trigger's hashes into
  * the held registers IS the sketch union, so the state after any
  * prefix of triggers equals the batch sketch over the concatenated
  * input (HllStateSpec asserts this against the oracle-gated batch
  * query). State is m bytes per key forever (even smaller than the KMV
  * state's k longs); the estimate refreshes every trigger via the
  * scalar estimator [[SketchQueries.hllEstimateOf]], whose arithmetic
  * mirrors the batch query's SQL operation for operation — HllStateSpec
  * pins streamed == batch on the gate corpus (the batch leg must stay
  * SQL-expressed for its DuckDB oracle, so the estimator is
  * duplicated-and-tested rather than literally shared).
  */
object HllState {

  /** One hashed observation (the batch query's md5-derived 60-bit hash). */
  final case class KeyedHash(topic: String, hv: Long)

  /** Held sketch: register max-ranks plus the cumulative observation
    * count (monotone — identifies the latest emission downstream).
    */
  final case class Registers(topic: String, seen: Long, regs: Seq[Int])

  /** Emitted per trigger. */
  final case class Estimate(
      topic: String, n_seen: Long, n_hit: Long, harmonic_num: Long, estimate: Double)

  /** Fold new hashes into a register array (register-wise max). */
  def merge(held: IndexedSeq[Int], incoming: Iterator[Long], m: Int = SketchQueries.HllM): IndexedSeq[Int] = {
    val regs = Array.tabulate(m)(i => if (i < held.length) held(i) else 0)
    incoming.foreach { hv =>
      val r = SketchQueries.hllRegisterOf(hv, m)
      val rank = SketchQueries.hllRankOf(hv, m)
      if (rank > regs(r)) regs(r) = rank
    }
    regs.toIndexedSeq
  }

  def estimate(topic: String, seen: Long, regs: IndexedSeq[Int]): Estimate = {
    val (nHit, num, est) = SketchQueries.hllEstimateOf(regs)
    Estimate(topic, seen, nHit, num, est)
  }

  def update(m: Int)(
      topic: String, rows: Iterator[KeyedHash], state: GroupState[Registers],
  ): Iterator[Estimate] = {
    var n = 0L
    val counted = rows.map { r => n += 1L; r.hv }
    val merged = merge(
      state.getOption.map(_.regs.toIndexedSeq).getOrElse(IndexedSeq.empty), counted, m)
    val seen = state.getOption.map(_.seen).getOrElse(0L) + n
    state.update(Registers(topic, seen, merged))
    Iterator.single(estimate(topic, seen, merged))
  }

  /** Apply over a (possibly streaming) typed Dataset of keyed hashes. */
  def apply(
      ds: Dataset[KeyedHash],
      m: Int = SketchQueries.HllM,
      outputMode: OutputMode = OutputMode.Update(),
  ): Dataset[Estimate] = {
    implicit val keyEnc = Encoders.STRING
    implicit val estEnc = Encoders.product[Estimate]
    implicit val regEnc = Encoders.product[Registers]
    ds.groupByKey(_.topic)
      .flatMapGroupsWithState(outputMode, GroupStateTimeout.NoTimeout)(update(m))
  }
}
