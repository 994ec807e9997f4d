package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Dedup, Multimodal, TableOps}

/** Semantics specs for the round-4 operators (robust stats, drift,
  * sketches, table maintenance, perceptual/fuzzy dedup, grouped
  * top-k) on hand-built fixtures plus structural properties on the
  * gate corpus — the oracle gate proves cross-engine parity; these pin
  * the behaviors the gate corpus may not exercise (MAD=0 topics,
  * sketch fallback below k, banding completeness, cluster locality).
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.001"

  private def writeEvents(rows: Seq[(Long, String, Long, Double)]): String = {
    // (event_id, event_type, ts_us, value)
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    rows.map { case (id, tpe, tsUs, v) =>
      (id, new Timestamp(tsUs / 1000), id % 7, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q_mad_anomaly -------------------------------------------------

  test("madAnomaly: MAD resists the outlier that inflates a stddev") {
    val dir = writeEvents(
      (1L to 9L).map(i => (i, "t", i * 1000000L, i.toDouble)) :+
        (10L, "t", 10000000L, 100.0))
    val out = DriftQueries.madAnomaly(spark, dir).collect()
    // med 5.5, deviations sorted [.5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5]
    // -> mad 2.5; only the 100.0 sample exceeds 5*mad
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("value") == 100.0)
    assert(r.getAs[Double]("med") == 5.5 && r.getAs[Double]("mad") == 2.5)
    assert(r.getAs[Double]("rscore") == 37.8) // (100-5.5)/2.5
  }

  test("madAnomaly: mad=0 topic is gated, not divided by zero") {
    val dir = writeEvents(Seq(
      (1L, "c", 1000000L, 5.0), (2L, "c", 2000000L, 5.0), (3L, "c", 3000000L, 5.0),
      (4L, "c", 4000000L, 5.0), (5L, "c", 5000000L, 9.0)))
    assert(DriftQueries.madAnomaly(spark, dir).collect().isEmpty)
  }

  // ---- q_ewma --------------------------------------------------------

  test("ewma: hand-computed EWMA and CUSUM on a two-sample series") {
    val dir = writeEvents(Seq((1L, "t", 1000000L, 4.0), (2L, "t", 2000000L, 8.0)))
    val r = DriftQueries.ewma(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("mean") == 6.0)
    assert(r.getAs[Double]("ewma_last") == 5.0) // 4*0.75 + 8*0.25
    // c1 = max(0, 4-6) = 0 ; c2 = max(0, 0 + (8-6)) = 2
    assert(r.getAs[Double]("cusum") == 2.0)
  }

  test("ewma: order comes from event_id, not row order") {
    // same values, ids swapped -> fold runs 8 then 4
    val dir = writeEvents(Seq((2L, "t", 1000000L, 4.0), (1L, "t", 2000000L, 8.0)))
    val r = DriftQueries.ewma(spark, dir).collect().head
    assert(r.getAs[Double]("ewma_last") == 7.0) // 8*0.75 + 4*0.25
  }

  test("seasonalAnomaly: flags against the hour's own baseline, gates thin hours") {
    val H = 3600000000L
    val dir = writeEvents(
      // hour 0: 15 zeros + one spike -> z = 3.87 for the spike only
      (1L to 15L).map(i => (i, "t", i * 60000000L, 0.0)) ++ Seq(
        (16L, "t", 16 * 60000000L, 10.0),
        // hour 1: only two samples -> cnt < 3, gated even though extreme
        (17L, "t", H + 1000000L, 0.0), (18L, "t", H + 2000000L, 1000.0)))
    val out = DriftQueries.seasonalAnomaly(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("value") == 10.0 && out.head.getAs[Long]("hod") == 0L)
    assert(out.head.getAs[Double]("z") > 3.8 && out.head.getAs[Double]("z") < 3.9)
  }

  test("lmScore: pruned bigrams score 0, known bigrams average their P(w2|w1)") {
    val dir = writeDocs(Seq(
      (1L, "x y x y x y", "s"), // (x,y) kept at count 3 with P=1; (y,x) pruned
      (2L, "q r s", "s")))      // all bigrams hapax -> pruned -> score 0
    val out = graft.pipeline.TextAnalysis.lmScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_known"),
          r.getAs[Double]("lm_score"), r.getAs[Double]("coverage"))).toMap
    assert(out(1L) == ((5L, 3L, 0.6, 0.6))) // 3 known xy bigrams at P=1.0 over 5
    assert(out(2L) == ((2L, 0L, 0.0, 0.0)))
  }

  test("anomalyEnsemble: per-method flags agree with the standalone detectors") {
    val ens = DriftQueries.anomalyEnsemble(spark, sf001).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Boolean]("flag_mad"), r.getAs[Boolean]("flag_seasonal"),
          r.getAs[Int]("n_methods"))).toMap
    val madIds = DriftQueries.madAnomaly(spark, sf001).collect()
      .map(_.getAs[Long]("event_id")).toSet
    val seasIds = DriftQueries.seasonalAnomaly(spark, sf001).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(madIds.forall(id => ens.get(id).exists(_._1)), "mad rows must flag in ensemble")
    assert(seasIds.forall(id => ens.get(id).exists(_._2)), "seasonal rows must flag in ensemble")
    assert(ens.values.forall { case (m, s, n) =>
      n >= 1 && n <= 3 && n >= (if (m) 1 else 0) + (if (s) 1 else 0) })
    // and nothing flags mad/seasonal in the ensemble that the detectors missed
    assert(ens.count(_._2._1) == madIds.size)
    assert(ens.count(_._2._2) == seasIds.size)
  }

  // ---- q_kmv_distinct ------------------------------------------------

  test("kmvDistinct: below-k groups fall back to the exact count") {
    val dir = writeEvents((1L to 10L).map(i => (i, "t", i * 86400000000L, 1.0)))
    // 10 distinct (user, day) pairs < k=64
    val r = SketchQueries.kmvDistinct(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") == 10L)
    assert(r.getAs[Double]("kmv_estimate") == 10.0)
  }

  test("kmvDistinct: estimate lands near the exact count on the corpus") {
    val rows = SketchQueries.kmvDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("kmv_estimate")
      assert(math.abs(est - exact) / exact < 0.35,
        s"${r.getAs[String]("topic")}: est $est vs exact $exact")
    }
  }

  // ---- q_snapshot_diff -----------------------------------------------

  test("snapshotDiff: full change-type classification") {
    val dir = writeDocs((0L to 12L).map(i => (i, s"text $i", "s")))
    val out = TableOps.snapshotDiff(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change_type")).toMap
    // old = evens 0..12, new = {0,3,6,9,12}; %12==0 rewritten (0, 12)
    assert(out == Map(
      0L -> "update", 12L -> "update", 6L -> "unchanged",
      3L -> "insert", 9L -> "insert",
      2L -> "delete", 4L -> "delete", 8L -> "delete", 10L -> "delete"))
  }

  test("snapshotDiff: NULL payloads classify by side presence, not hash nullness") {
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    Seq[(Long, String, String)](
      (0L, null, "s"),  // both sides, both hashes NULL -> unchanged
      (2L, null, "s"),  // old only -> delete (hash NULL is irrelevant)
      (3L, null, "s"),  // new only -> insert
      (6L, "x", "s"),   // both, same -> unchanged
      (12L, "y", "s"),  // both, %12 rewrite -> update
    ).map { case (id, text, src) =>
      (id, text, "en", src, Option(text).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TableOps.snapshotDiff(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change_type")).toMap
    assert(out == Map(0L -> "unchanged", 2L -> "delete", 3L -> "insert",
      6L -> "unchanged", 12L -> "update"))
  }

  // ---- q_zorder ------------------------------------------------------

  test("zorder: clusters are tight on BOTH dimensions (that's the point)") {
    val rows = TableOps.zorder(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // cluster = top 3 interleaved bit-pairs -> each dim spans < 2^5
      assert(r.getAs[Long]("ux_hi") - r.getAs[Long]("ux_lo") < 32)
      assert(r.getAs[Long]("tx_hi") - r.getAs[Long]("tx_lo") < 32)
    }
  }

  // ---- q_phash_pairs -------------------------------------------------

  test("phashPairs: banded join finds exactly the brute-force pair set") {
    val codes = Multimodal.phashCodes(spark, sf001).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("phash"))
    val brute = (for {
      (ia, ha) <- codes; (ib, hb) <- codes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= Multimodal.PhashRadius
    } yield (ia, ib)).toSet
    val banded = Multimodal.phashPairs(spark, sf001).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    assert(banded == brute) // pigeonhole-complete at radius 2, no extras
  }

  // ---- q_fuzzy_pairs -------------------------------------------------

  test("fuzzyPairs: candidate from shared shingle, verified by edit distance") {
    val dir = writeDocs(Seq(
      (1L, "a b c d e x", "s"), (2L, "a b c d e y", "s"),
      (3L, "p q r s t u", "s"))) // no shared shingle -> never a candidate
    val out = Dedup.fuzzyPairs(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == (1L, 2L))
    assert(r.getAs[Int]("lev") == 1)
    assert(r.getAs[Double]("sim") == math.rint((1.0 - 1.0 / 11) * 1e6) / 1e6)
    assert(r.getAs[Boolean]("keep"))
  }

  // ---- q_pagerank ----------------------------------------------------

  test("pagerank: hand-computed integer ranks on a path graph") {
    // path a-b-c: b is the hub; a and c exactly symmetric
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = graft.pipeline.GraphOps.pagerankOnPairs(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank_micro")).toMap
    // five integer iterations, floor division throughout (hand-derived)
    assert(out == Map(1L -> 668336L, 2L -> 1663323L, 3L -> 668336L))
  }

  test("pagerank: corpus run is deterministic and mass-bounded") {
    val rows = graft.pipeline.GraphOps.pagerank(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank_micro")).sum
    // floor division only ever LOSES mass relative to n × 1e6
    assert(total <= rows.length * 1000000L)
    assert(rows.forall(_.getAs[Long]("rank_micro") >= 150000L))
  }

  // ---- q_quality_deciles / q_source_quantiles ------------------------

  test("qualityDeciles: assignment is monotone in score, deciles within 1..10") {
    val rows = graft.pipeline.TextAnalysis.qualityDeciles(spark, sf001).collect()
      .map(r => (r.getAs[Double]("quality_score"), r.getAs[Int]("decile")))
    assert(rows.forall { case (_, d) => d >= 1 && d <= 10 })
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, d1), (_, d2)) => assert(d1 <= d2)
      case _ =>
    }
  }

  test("sourceQuantiles: quantiles are ordered within every source") {
    val rows = WindowQueries.sourceQuantiles(spark, sf001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (a, b, c, d) = (r.getAs[Double]("q25"), r.getAs[Double]("q50"),
        r.getAs[Double]("q75"), r.getAs[Double]("q95"))
      assert(a <= b && b <= c && c <= d)
    }
  }

  // ---- q_top_terms_grouped -------------------------------------------

  test("topTermsGrouped: per-source ranks, ties broken by term") {
    val dir = writeDocs(Seq(
      (1L, "a a b", "s1"), (2L, "a c", "s1"),
      (3L, "z z z", "s2")))
    val out = AnalyticQueries.topTermsGrouped(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rk")) ->
        (r.getAs[String]("term"), r.getAs[Long]("n"))).toMap
    assert(out == Map(
      ("s1", 1) -> ("a", 3L), ("s1", 2) -> ("b", 1L), ("s1", 3) -> ("c", 1L),
      ("s2", 1) -> ("z", 3L)))
  }
}
