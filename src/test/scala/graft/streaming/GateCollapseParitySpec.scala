package graft.streaming

import graft.SparkSpec
import graft.streaming.IngestGate.GateRow

/** The batch seam's native-aggregation collapse (round 16,
  * `collapseVerdictsAgg`) must emit exactly what the stream's pure
  * `collapse` fold emits for every rule combination — verdict
  * precedence, keeper attach, best-match (highest est, lowest doc)
  * tie-break, the est ≥ 0.5 threshold, and the exact 6-decimal round
  * of k/16 estimates. Adversarial band-row sets exercise each branch,
  * including the below-threshold-only and tie cases.
  */
class GateCollapseParitySpec extends SparkSpec {
  import spark.implicits._

  private def est(k: Int): java.lang.Double = k / 16.0

  // band-row sets: (doc, pre, keeper, corpus_doc, est)
  private val rows: Seq[GateRow] = Seq(
    // pre_verdict wins over everything (all 4 band rows carry it)
    GateRow(1L, "too_short", 7L, 9L, est(16)),
    GateRow(1L, "too_short", 7L, 3L, est(12)),
    // keeper wins over near-dup matches
    GateRow(2L, null, 42L, 5L, est(15)),
    GateRow(2L, null, 42L, null, null),
    // near-dup: highest est wins
    GateRow(3L, null, null, 10L, est(9)),
    GateRow(3L, null, null, 11L, est(14)),
    // near-dup: est tie -> lowest corpus doc
    GateRow(4L, null, null, 21L, est(10)),
    GateRow(4L, null, null, 20L, est(10)),
    GateRow(4L, null, null, 22L, est(10)),
    // matches all BELOW threshold -> keep
    GateRow(5L, null, null, 30L, est(7)),
    GateRow(5L, null, null, 31L, est(6)),
    // no band match at all (left-join null row) -> keep
    GateRow(6L, null, null, null, null),
    // threshold boundary: est exactly 8/16 counts
    GateRow(7L, null, null, 40L, est(8)),
  )

  test("native-agg collapse == the stream's pure fold on adversarial band rows") {
    val scored = rows.toDF()
    val viaFold = rows.groupBy(_.doc_id).map { case (id, rs) =>
      IngestGate.collapse(id, rs.iterator)
    }.map(v => (v.doc_id, v.verdict, v.dup_of, v.est_jaccard)).toSeq.sortBy(_._1)
    val viaAgg = IngestGate.collapseVerdictsAgg(scored)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)),
        if (r.isNullAt(3)) null else Double.box(r.getDouble(3))))
      .toSeq.sortBy(_._1)
    assert(viaAgg == viaFold, s"\nagg : $viaAgg\nfold: $viaFold")
    // spot-pin the interesting verdicts so a symmetric bug in both
    // forms cannot hide behind the parity check
    val byDoc = viaAgg.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._2 == "too_short" && byDoc(1L)._3 == null)
    assert(byDoc(2L) == ((2L, "exact_dup", 42L, 1.0)))
    assert(byDoc(3L) == ((3L, "near_dup", 11L, 0.875)))
    assert(byDoc(4L) == ((4L, "near_dup", 20L, 0.625)))
    assert(byDoc(5L)._2 == "keep" && byDoc(6L)._2 == "keep")
    assert(byDoc(7L) == ((7L, "near_dup", 40L, 0.5)))
  }
}
