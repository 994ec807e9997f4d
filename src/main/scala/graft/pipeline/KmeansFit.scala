package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted k-means for the quantizer fits (IVF coarse
  * cells, PQ subspace codebooks).
  *
  * Input is the distinct-aggregated sample — `(point, count)` pairs in
  * a canonical order — so density is preserved exactly while the
  * driver-side cost is bounded by the distinct cap, not the corpus.
  * Init is farthest-point (Gonzalez): start from the first canonical
  * point, then repeatedly add the point farthest from its nearest
  * chosen center — deterministic (no RNG), well-spread, and immune to
  * the duplicate-init-point crash that MLlib's block KMeans suffers on
  * low-cardinality data. Lloyd then runs a fixed number of weighted
  * iterations; nearest-center ties resolve to the lowest index and
  * empty clusters keep their previous center, so the whole fit is
  * bit-reproducible for a given sample.
  */
object KmeansFit {

  /** Cap on the distinct (point, count) rows a fit collects; order is
    * (count desc, hash asc, point asc) so a capped draw is a
    * deterministic pseudo-random subsample, never a lexicographic
    * corner of the space.
    */
  val DistinctCap = 4096

  val Iters = 8

  /** The one owner of the sampling contract: distinct + count over the
    * sample relation's `key` column (an array<double>), canonical
    * (count desc, hash asc, point asc) order, [[DistinctCap]] collect,
    * then [[fit]]. Both the IVF coarse fit and each PQ subspace fit go
    * through here so cap/order/weighting can never desynchronize.
    */
  def fitFromDistinctSample(sample: DataFrame, key: Column, k: Int): IndexedSeq[Array[Double]] =
    fit(distinctSample(sample, key), k, Iters)

  /** The collected weighted sample alone — for callers that fit, then
    * inspect balance ([[maxSharePpm]]) and possibly re-fit at a larger
    * k without a second Spark job.
    */
  def distinctSample(sample: DataFrame, key: Column): IndexedSeq[(Array[Double], Long)] =
    sample.groupBy(key.as("p")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, hash(col("p")).asc, col("p").asc)
      .limit(DistinctCap)
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getLong(1)))
      .toIndexedSeq

  /** Weighted share (exact integer ppm) of the heaviest cell when
    * `pts` is assigned to `centers` (nearest center, lowest index on
    * ties — the fit's own assignment rule). The skew detector the
    * auto-sized IVF fit reads before accepting a quantizer: a cell
    * holding a large multiple of its even share means the index's
    * per-cell work bounds are degenerate and the fit should re-run
    * with more cells.
    */
  def maxSharePpm(pts: IndexedSeq[(Array[Double], Long)],
      centers: IndexedSeq[Array[Double]]): Long = {
    if (pts.isEmpty || centers.isEmpty) return 0L
    val dim = pts.head._1.length
    val ws = new Array[Long](centers.length)
    var total = 0L
    pts.foreach { case (p, cnt) =>
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        var d = 0.0
        var j = 0
        while (j < dim) { val t = p(j) - centers(c)(j); d += t * t; j += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      ws(best) += cnt
      total += cnt
    }
    if (total == 0L) 0L else ws.max * 1000000L / total
  }

  def fit(pts: IndexedSeq[(Array[Double], Long)], k: Int, iters: Int): IndexedSeq[Array[Double]] = {
    val kk = math.min(k, pts.size)
    if (kk == 0) return IndexedSeq.empty
    val dim = pts.head._1.length

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0
      var j = 0
      while (j < dim) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }

    // farthest-point init; strict > keeps the lowest index on ties
    val centers = scala.collection.mutable.ArrayBuffer(pts.head._1.clone)
    val nearest = Array.fill(pts.size)(Double.MaxValue)
    while (centers.size < kk) {
      var bi = 0
      var bd = -1.0
      var i = 0
      while (i < pts.size) {
        val d = dist2(pts(i)._1, centers(centers.size - 1))
        if (d < nearest(i)) nearest(i) = d
        if (nearest(i) > bd) { bd = nearest(i); bi = i }
        i += 1
      }
      centers += pts(bi)._1.clone
    }

    // weighted Lloyd, fixed iterations
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val ws = new Array[Double](centers.length)
      pts.foreach { case (p, cnt) =>
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          val d = dist2(p, centers(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        ws(best) += cnt.toDouble
        var j = 0
        while (j < dim) { sums(best)(j) += p(j) * cnt; j += 1 }
      }
      var c = 0
      while (c < centers.length) {
        if (ws(c) > 0) {
          var j = 0
          while (j < dim) { centers(c)(j) = sums(c)(j) / ws(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers.toIndexedSeq
  }
}
