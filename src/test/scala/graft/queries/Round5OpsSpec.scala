package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Dedup, TableOps, TextAnalysis}

/** Fixture specs for the round-5 registered operators (q_resample,
  * q_profile_approx, q_blocklist, q_compaction_plan) — the oracle gate
  * proves cross-engine parity on the driver corpus; these pin the
  * semantics the gate corpus may not exercise (gap grids, KMV error
  * bounds, threshold edges, bin splitting).
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Option[Long], String, Long, Double)]): String = {
    // (event_id, user_id, event_type, ts_us, value)
    val dir = java.nio.file.Files.createTempDirectory("r5ev").toString
    rows.map { case (id, uid, tpe, tsUs, v) =>
      (id, new Timestamp(tsUs / 1000), uid, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String, Long)]): String = {
    // (doc_id, source, text, n_chars)
    val dir = java.nio.file.Files.createTempDirectory("r5doc").toString
    rows.toDF("doc_id", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q_resample ------------------------------------------------------

  private val B = TemporalQueries.ResampleUs // 15-min bucket in micros

  test("resample: interior gaps are materialized and carry the last observed mean") {
    val dir = writeEvents(Seq(
      // topic a, bucket 0: mean 15.0 over two events
      (1L, Some(1L), "a", 0L, 10.0),
      (2L, Some(1L), "a", 1000L, 20.0),
      // topic a, bucket 2 (bucket 1 is a gap): mean 40.0
      (3L, Some(1L), "a", 2 * B, 40.0),
      // topic b: a single observed bucket -> single-row grid, no gaps
      (4L, Some(1L), "b", 5 * B, 7.0),
    ))
    val out = TemporalQueries.resample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.size == 4, s"grid must span [first, last] bucket per topic: $out")
    assert(out(("a", 0L)) == ((2L, 15.0, false)))
    assert(out(("a", 1L)) == ((0L, 15.0, true)), "gap bucket must carry bucket 0's mean")
    assert(out(("a", 2L)) == ((1L, 40.0, false)))
    assert(out(("b", 5L)) == ((1L, 7.0, false)))
    // no leading/trailing fabrication: the grid starts at the FIRST
    // observed bucket (so mean_filled is never NULL) and ends at the last
    assert(!out.keySet.exists { case (t, b) => t == "a" && (b < 0 || b > 2) })
  }

  test("resample: consecutive gaps all carry the same last-observed mean") {
    val dir = writeEvents(Seq(
      (1L, Some(1L), "t", 0L, 3.0),
      (2L, Some(1L), "t", 3 * B, 9.0),
    ))
    val rows = TemporalQueries.resample(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(rows(0L) == ((3.0, false)))
    assert(rows(1L) == ((3.0, true)))
    assert(rows(2L) == ((3.0, true)))
    assert(rows(3L) == ((9.0, false)))
  }

  // ---- q_profile_approx ------------------------------------------------

  test("profile_approx: below-k columns are exact; the rest land inside KMV bounds") {
    val sf = "/root/testdata/sf0.001"
    val exact = ProfileQueries.profile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    val approx = ProfileQueries.profileApprox(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Double]("n_distinct_kmv")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, nd) =>
      val est = approx(c)
      if (nd < SketchQueries.KmvK)
        assert(est == nd.toDouble, s"$c: below-k sketch must be exact ($est vs $nd)")
      else {
        // k=64 -> relative std error ~ 1/sqrt(k-2) = 12.7%; 4 sigma bound
        val rel = math.abs(est - nd) / nd
        assert(rel < 0.51, s"$c: KMV estimate $est vs exact $nd (rel err $rel)")
      }
    }
  }

  test("profile_approx: non-distinct metrics match the exact profile") {
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) = r.getAs[String]("col_name")
    val exact = ProfileQueries.profile(spark, sf).collect()
      .map(r => key(r) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
        Option(r.getAs[java.lang.Double]("min_num")), Option(r.getAs[java.lang.Double]("max_num")),
        r.getAs[Boolean]("is_complete"))).toMap
    val approx = ProfileQueries.profileApprox(spark, sf).collect()
      .map(r => key(r) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
        Option(r.getAs[java.lang.Double]("min_num")), Option(r.getAs[java.lang.Double]("max_num")),
        r.getAs[Boolean]("is_complete"))).toMap
    assert(approx == exact)
  }

  test("profile_approx: a fully-null column stays in the report with estimate 0") {
    // an all-null column produces NO hashes and therefore no sketch row;
    // the report must still surface it (left join + 0 estimate), since
    // the broken column is exactly what a profile is for
    val dir = java.nio.file.Files.createTempDirectory("r5nullev").toString
    (1L to 20L).map(i => (i, new Timestamp(i * 1000), Some(i % 3), "t", i * 1.5, None: Option[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ProfileQueries.profileApprox(spark, dir).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Double]("n_distinct_kmv"), r.getAs[Long]("n_null"), r.getAs[Boolean]("is_complete")))
      .toMap
    assert(out.size == 6, s"all 6 columns must be reported: ${out.keySet}")
    assert(out("props") == ((0.0, 20L, false)), s"got ${out("props")}")
    assert(out("event_id")._1 == 20.0) // below-k exact, sanity
  }

  test("kmv_sketch rejects k < 1 at analysis time") {
    import graft.functions.KmvAggregates.kmvSketch
    val df = Seq(1L, 2L).toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(kmvSketch(col("v"), 0)).collect()
    }
  }

  // ---- q_blocklist -----------------------------------------------------

  test("blocklist: flags docs at or above the hit-ratio threshold only") {
    val dir = writeDocs(Seq(
      (1L, "web", "error drop error again", 23L), // 3/4 hits
      (2L, "web", "perfectly clean text here", 25L), // 0 hits
      // 1 hit in 20 tokens = 0.05 < 0.08 threshold
      (3L, "web", ("x " * 19).trim + " error", 40L),
    ))
    val out = TextAnalysis.blocklist(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val r = out.head
    assert(r.getAs[Int]("n_tokens") == 4 && r.getAs[Int]("n_hits") == 3)
    assert(r.getAs[Double]("hit_ratio") == 0.75)
  }

  // ---- kmv_sketch aggregate --------------------------------------------

  test("kmv_sketch keeps the k smallest DISTINCT values across partitions") {
    import graft.functions.KmvAggregates.kmvSketch
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L, 9L).toDF("v").repartition(4) // force merges
    val top3 = df.agg(kmvSketch(col("v"), 3)).collect().head.getSeq[Long](0)
    assert(top3 == Seq(1L, 3L, 5L), s"got $top3")
    // below-k: every distinct value survives, ascending
    val all = df.agg(kmvSketch(col("v"), 64)).collect().head.getSeq[Long](0)
    assert(all == Seq(1L, 3L, 5L, 7L, 9L))
  }

  // ---- q_stratified_sample ---------------------------------------------

  test("stratified sample: exactly k per stratum (all docs when below k), deterministic") {
    import graft.pipeline.Sampling
    val dir = writeDocs(
      (1L to 40L).map(i => (i, "big", "t", 10L)) ++
        Seq((101L, "tiny", "t", 10L), (102L, "tiny", "t", 10L)))
    def run() = Sampling.stratifiedSample(spark, dir).collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(r => (r.getAs[Long]("rn"), r.getAs[Long]("doc_id"))).sorted.toSeq)
      .toMap
    val s1 = run()
    assert(s1("big").size == Sampling.StratumK)
    assert(s1("big").map(_._1) == (1L to Sampling.StratumK.toLong)) // dense ranks
    assert(s1("tiny").size == 2, "below-k stratum keeps every doc")
    assert(run() == s1, "hash-gated sample must be reproducible")
  }

  // ---- q_dist_drift ------------------------------------------------------

  test("dist drift: identical distributions give zero TVD and chi2") {
    val dir = writeDocs(
      (1L to 10L).map(i => (i, "x", "t", 100L)) ++
        (11L to 20L).map(i => (i, "y", "t", 150L))) // same bin (0) for all
    val out = DriftQueries.distDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("tvd"), r.getAs[Double]("chi2"), r.getAs[Boolean]("drifted"))).toMap
    assert(out("x") == ((0.0, 0.0, false)))
    assert(out("y") == ((0.0, 0.0, false)))
  }

  test("dist drift: a shifted source is flagged, absent-bin mass folded in closed form") {
    val dir = writeDocs(
      (1L to 10L).map(i => (i, "x", "t", 100L)) ++ // bin 0
        (11L to 20L).map(i => (i, "y", "t", 150L)) ++ // bin 0
        (21L to 30L).map(i => (i, "z", "t", 900L))) // bin 4 -- shifted
    val out = DriftQueries.distDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Double]("tvd"), r.getAs[Boolean]("drifted")))
      .toMap
    // z: p(bin4)=1 vs q=1/3 -> tvd = (|1-1/3| + (1-1/3))/2 = 2/3
    assert(math.abs(out("z")._1 - 2.0 / 3) < 1e-3 && out("z")._2)
    // x: p(bin0)=1 vs q=2/3 -> tvd = 1/3 (the z docs dragged the baseline)
    assert(math.abs(out("x")._1 - 1.0 / 3) < 1e-3 && out("x")._2)
  }

  // ---- q_filter_funnel -----------------------------------------------------

  test("filter funnel: each doc attributed to its FIRST failing rule, cascade totals") {
    val clean = (1 to 10).map(i => s"t$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, "s", "a b", 3L), // too_short (also repetitive — counts as short)
      (2L, "s", Seq.fill(12)("x").mkString(" "), 23L), // too_repetitive (1/12 distinct)
      (3L, "s", (Seq.fill(5)("error drop").mkString(" ") + " w1 w2"), 60L), // blocklisted
      (4L, "s", clean, 40L), // survivor (keeper of the dup pair)
      (5L, "s", clean, 40L), // exact_dup of 4
    ))
    val out = TextAnalysis.filterFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("stage"), r.getAs[Long]("n_dropped"), r.getAs[Long]("n_remaining")))
      .toMap
    assert(out("too_short") == ((1L, 1L, 4L)))
    assert(out("too_repetitive") == ((2L, 1L, 3L)))
    assert(out("blocklisted") == ((3L, 1L, 2L)))
    assert(out("exact_dup") == ((4L, 1L, 1L)))
  }

  // ---- q_quantile_sample -------------------------------------------------

  test("quantile sample: bounded-k estimates track the exact quantiles") {
    val rows = SketchQueries.quantileSample(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val ns = r.getAs[Long]("n_sample")
      assert(ns == math.min(n, SketchQueries.QuantileSampleK.toLong),
        s"sample must cap at k: $ns of $n")
      val (p50e, p95e) = (r.getAs[Double]("p50_exact"), r.getAs[Double]("p95_exact"))
      val (p50s, p95s) = (r.getAs[Double]("p50_sample"), r.getAs[Double]("p95_sample"))
      // k=256 -> quantile std error ~ sqrt(p(1-p)/k); half the exact
      // spread is a generous 4-sigma-ish envelope on this data
      val spread = math.max(p95e - p50e, 1e-6)
      assert(math.abs(p50s - p50e) <= 0.5 * spread, s"p50 off: $p50s vs $p50e (spread $spread)")
      assert(math.abs(p95s - p95e) <= 0.5 * spread, s"p95 off: $p95s vs $p95e (spread $spread)")
    }
  }

  // ---- q_ngram_novelty -------------------------------------------------------

  test("ngram novelty: unique docs score 1.0, a verbatim copy drags both to 0") {
    val unique = (1 to 8).map(i => s"u$i").mkString(" ")
    val copied = (1 to 8).map(i => s"c$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, "s", unique, 10L),
      (2L, "s", copied, 10L),
      (3L, "s", copied, 10L), // verbatim copy: every shingle of 2 and 3 has df=2
    ))
    val out = Dedup.ngramNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    spark.catalog.clearCache()
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0 && out(3L) == 0.0)
  }

  // ---- q_source_overlap ----------------------------------------------------

  test("source overlap: directional containment, mirrors symmetric, novel sources absent") {
    val text = (1 to 8).map(i => s"w$i").mkString(" ") // 4 shingles at n=5
    val sup = text + " w9" // superset: 5 shingles, contains all 4 of text
    val dir = writeDocs(Seq(
      (1L, "a", text, 10L),
      (2L, "b", sup, 12L), // b embeds a
      (3L, "c", (1 to 8).map(i => s"z$i").mkString(" "), 10L), // novel
    ))
    val out = Dedup.sourceOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Double]("containment")))
      .toMap
    spark.catalog.clearCache()
    assert(out(("a", "b")) == ((4L, 4L, 1.0)), "a fully contained in b")
    assert(out(("b", "a")) == ((4L, 5L, 0.8)), "b only 4/5 contained in a")
    assert(!out.keySet.exists { case (x, y) => x == "c" || y == "c" },
      "the novel source must not appear in the overlap matrix")
  }

  // ---- q_canonical_docs --------------------------------------------------

  test("canonical docs: exactly one keep per cluster — longest member, doc_id tiebreak") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.canonical(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cluster_root")).foreach { case (root, ms) =>
      val keeps = ms.filter(_.getAs[Boolean]("keep"))
      assert(keeps.length == 1, s"cluster $root must keep exactly one doc")
      val best = ms.map(r => (-r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id"))).min
      val k = keeps.head
      assert((-k.getAs[Long]("n_chars"), k.getAs[Long]("doc_id")) == best,
        s"cluster $root kept a non-canonical member")
      assert(ms.length.toLong == ms.head.getAs[Long]("cluster_size"))
    }
  }

  // ---- q_compaction_plan -------------------------------------------------

  test("compaction plan: prefix-sum bins split per source at the target size") {
    // source s1: 3 docs of 1500 chars -> cum starts 0,1500,3000: all in
    // bin 0 (start < 4000); 4th doc starts at 4500 -> bin 1
    val dir = writeDocs(Seq(
      (1L, "s1", "t", 1500L), (2L, "s1", "t", 1500L), (3L, "s1", "t", 1500L),
      (4L, "s1", "t", 1500L),
      (5L, "s2", "t", 100L), // independent per-source binning
    ))
    val out = TableOps.compactionPlan(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(out.size == 3, s"expected s1 bins 0,1 + s2 bin 0: $out")
    assert(out(("s1", 0L)) == ((3L, 4500L, 1L, 3L)))
    assert(out(("s1", 1L)) == ((1L, 1500L, 4L, 4L)))
    assert(out(("s2", 0L)) == ((1L, 100L, 5L, 5L)))
  }
}
