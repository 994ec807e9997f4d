package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Plan-shape regression guards: the properties SCALE.md promises must
  * stay visible in the physical plans (pushdown, broadcast choices,
  * bounded shuffle count) — a refactor that silently degrades a plan
  * fails here, not in a 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val expanded = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    (p +: expanded).flatMap(_.collect(pf))
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val s = plan("q1_agg").toString
    assert(s.contains("PushedFilters") && s.contains("l_shipdate"),
      "shipdate predicate not pushed to the scan")
  }

  test("q_anomaly joins the stats snapshot as a broadcast hash join") {
    val joins = collectAll(plan("q_anomaly")) { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "stats snapshot join is not broadcast")
  }

  test("q_join_revenue broadcasts both dimension tables") {
    val joins = collectAll(plan("q_join_revenue")) { case j: BroadcastHashJoinExec => j }
    assert(joins.size >= 2, s"expected 2 broadcast dim joins, got ${joins.size}")
  }

  /** Requirement-driven exchanges only: the round-16 `Tables.spread`
    * redistribution (an explicit repartition that is a no-op at real
    * input-split counts) is not an aggregation pass — the single-pass
    * assertions below count the shuffles the OPERATORS demand.
    */
  private def aggShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    collectAll(p) {
      case e: ShuffleExchangeExec
        if e.shuffleOrigin == org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
    }

  test("q_window_stats needs exactly one shuffle (single grouped pass)") {
    val shuffles = aggShuffles(plan("q_window_stats"))
    assert(shuffles.size <= 1, s"window stats should aggregate in one pass, got ${shuffles.size} shuffles")
  }

  test("anomaly-family stats relations join as broadcasts") {
    // mad/seasonal baselines are per-topic(-hour) rows: the event side
    // must never shuffle for scoring
    Seq("q_mad_anomaly", "q_seasonal_anomaly").foreach { name =>
      val joins = collectAll(plan(name)) { case j: BroadcastHashJoinExec => j }
      assert(joins.nonEmpty, s"$name does not broadcast its stats side")
    }
  }

  test("sampling/decontamination join their small sides as broadcasts") {
    // the fact side must never shuffle for a dimension/eval-set lookup
    Seq("q_sample_mix", "q_decontaminate").foreach { name =>
      val joins = collectAll(plan(name)) { case j: BroadcastHashJoinExec => j }
      assert(joins.nonEmpty, s"$name does not broadcast its small side")
    }
  }

  test("single-pass aggregation queries shuffle exactly once") {
    Seq("q_cube", "q_histogram", "q_embed_centroid").foreach { name =>
      val shuffles = collectAll(plan(name)) { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1, s"$name should be one grouped pass, got ${shuffles.size} shuffles")
    }
    // diversity is two chained aggs (doc,term) -> (doc): exactly two
    val div = collectAll(plan("q_diversity")) { case e: ShuffleExchangeExec => e }
    assert(div.size == 2, s"q_diversity should be two chained aggs, got ${div.size} shuffles")
    // the KMV sketch leg of the approximate profile is ONE bounded-state
    // aggregation: the registered plan must stay a single shuffle joined
    // broadcast to the (driver-reshaped) exact-metrics side
    val pa = plan("q_profile_approx")
    val paSh = aggShuffles(pa)
    assert(paSh.size <= 1, s"q_profile_approx sketch leg should be one pass, got ${paSh.size} shuffles")
    assert(collectAll(pa) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "q_profile_approx must broadcast the tiny sketch relation")
  }

  test("map-only operators plan zero shuffles; bm25 shuffles only its stats aggregate") {
    // the SCALE.md claim for these is "pipelines into the scan": encode
    // and classifier scoring must never exchange the corpus
    Seq("q_pq_encode", "q_quality_classifier").foreach { name =>
      val shuffles = collectAll(plan(name)) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"$name should be map-only, got ${shuffles.size} shuffles")
    }
    // bm25: one global stats aggregate (its only exchange) broadcast
    // back; ranking is TakeOrdered, not a sort shuffle
    val sh = collectAll(plan("q_bm25")) { case e: ShuffleExchangeExec => e }
    assert(sh.size <= 1, s"q_bm25 should shuffle only the stats aggregate, got ${sh.size}")
    // sq_encode: the corpus side is map-only; only the tiny per-dim
    // stats relation shuffles (per-dim agg + 1-row reshape)
    val sq = collectAll(plan("q_sq_encode")) { case e: ShuffleExchangeExec => e }
    assert(sq.size <= 2, s"q_sq_encode should shuffle only its stats aggregates, got ${sq.size}")
  }

  test("only the intentional brute-force baseline uses nested-loop joins") {
    // q_ann_topk is the declared exact-recall baseline and its query
    // side is hard-capped at <= 100 probes (vec_id < TopkQueryCap), so
    // the one allowed NLJ is O(cap x N), bounded at any corpus size;
    // everything else (incl. q_dedup_simhash, HmSearch-banded) must be
    // equi-join only.
    // A cross join is exempt when its broadcast side is a global (no-key)
    // aggregate: that side is one row by construction, so the "nested
    // loop" is a scalar attach — O(n), not all-pairs.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{InputAdapter, ProjectExec, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    // the exempting aggregate must be the build side's ROOT (modulo
    // wrapper nodes) — a global aggregate buried under a join deeper in
    // the subtree must NOT exempt an all-pairs NLJ above it
    @scala.annotation.tailrec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case e: BroadcastExchangeExec => unwrap(e.child)
      case p: ProjectExec => unwrap(p.child)
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other
    }
    // recursive: a cross of single-row relations (e.g. the DSIR model
    // row = global tcnt agg × global rcnt agg) is itself single-row
    def singleRowSide(p: SparkPlan): Boolean = unwrap(p) match {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
      case j: BroadcastNestedLoopJoinExec => singleRowSide(j.left) && singleRowSide(j.right)
      case _ => false
    }
    // q_ann_pca shares q_ann_topk's capped-probe contract (same <= 100
    // query cap), just over the 8-dim projected vectors; q_ann_recall
    // and q_ann_lsh_recall embed q_ann_topk verbatim as their
    // exact-truth leg, so they carry the same declared capped NLJ
    // q_phash_recall's truth leg is the same declared capped contract
    // (<= 100 probes, PhashProbeCap) over the representative codes;
    // q_embed_sweep_recall's brute-force truth leg broadcasts the
    // bounded every-20th-id sample (the declared capped baseline —
    // every index's recall eval carries one)
    // q_audio_recall's truth leg broadcasts the bounded every-20th-id
    // probe sample against all fingerprints — the same declared capped
    // contract (O(probes x n)) the other recall evals carry;
    // q_audio_sweep_recall's truth leg is the <= 100-probe broadcast
    // against the A-side representatives (the q_phash_sweep_recall
    // contract, fourth modality)
    val allowed = Set("q_ann_topk", "q_ann_pca", "q_ann_recall", "q_ann_lsh_recall",
      "q_phash_recall", "q_embed_sweep_recall", "q_phash_sweep_recall", "q_audio_recall",
      "q_audio_sweep_recall")
    SparkEntry.queries.keys.filterNot(allowed).filterNot(_ == "q_kmeans_anomaly").foreach { name =>
      val nlj = collectAll(plan(name)) { case j: BroadcastNestedLoopJoinExec => j }
        .filterNot { j =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            case _ => j.left
          }
          singleRowSide(build)
        }
      assert(nlj.isEmpty, s"$name unexpectedly uses a nested-loop join")
    }
  }

  test("round-7 additions keep their declared plan shapes") {
    // q_hll_distinct: the sketch leg is ONE bounded-state aggregation
    // (native register array) joined broadcast to the exact leg — two
    // aggs (sketch + exact-distinct's two-phase) but the est relation
    // (2 rows) must attach as a broadcast hash join
    val hll = plan("q_hll_distinct")
    assert(collectAll(hll) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "q_hll_distinct must broadcast the tiny sketch relation")
    // q_split_leakage: exactly one exchange — the partitioned window on
    // the normalized hash; the split CASE adds no shuffle
    val sl = collectAll(plan("q_split_leakage")) { case e: ShuffleExchangeExec => e }
    assert(sl.size == 1, s"q_split_leakage should shuffle once (group window), got ${sl.size}")
    // q_rrf_fusion: both rank lists are bounded single-row aggregates
    // exploded back out — the plan must contain no WindowExec at all
    // (rank-without-window is the point of the rankOf shape)
    import org.apache.spark.sql.execution.window.WindowExec
    val rrf = collectAll(plan("q_rrf_fusion")) { case w: WindowExec => w }
    assert(rrf.isEmpty, s"q_rrf_fusion should have no window operator, got ${rrf.size}")
  }

  test("contamination-family additions keep their declared plan shapes") {
    // q_decontaminate_fuzzy: the eval band and eval signature relations
    // are benchmark-sized and must attach as broadcast hash joins — the
    // corpus side never shuffles for candidate generation
    val fz = plan("q_decontaminate_fuzzy")
    assert(collectAll(fz) { case j: BroadcastHashJoinExec => j }.size >= 2,
      "fuzzy decontamination must broadcast the eval band+signature sides")
    // q_eval_overlap_report: eval grams broadcast into the hit match
    val ov = collectAll(plan("q_eval_overlap_report")) { case j: BroadcastHashJoinExec => j }
    assert(ov.nonEmpty, "eval overlap report must broadcast the eval gram side")
    // q_importance_resample: the narrow scored relation is cached (its
    // two references must not re-run the DSIR scoring subplan), so the
    // visible exchanges are just the max aggregate's single-row reshape
    val rs = collectAll(plan("q_importance_resample")) { case e: ShuffleExchangeExec => e }
    assert(rs.size <= 2,
      s"resample must reuse the cached scored relation, got ${rs.size} shuffles")
  }

  test("DSIR scoring lambda binds the ratio array as an attribute (no inlined model folds)") {
    // Round-6 pathology: CollapseProject inlined the constant ratio/nt/nr
    // expressions into the per-token aggregate lambda, multiplying
    // per-token work ~8000x (q_curate 96 s at sf0.1). The fix computes
    // them below the broadcast join; this pins that the optimized plan's
    // dsir_weight expression references the bound `ratio` attribute and
    // never the raw model count arrays (which would mean the folds were
    // inlined again).
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val opt = graft.pipeline.Importance.scoredWeights(spark, sf)
      .queryExecution.optimizedPlan
    val dsir = opt.collect { case p: Project => p.projectList }.flatten
      .filter(_.name == "dsir_weight")
    assert(dsir.nonEmpty, "dsir_weight projection not found in optimized plan")
    dsir.foreach { a =>
      val s = a.toString
      assert(!s.contains("tcnt") && !s.contains("rcnt"),
        "per-token scoring lambda references the model count arrays — " +
          "the ratio fold was inlined into the per-token path again")
      assert(s.contains("ratio"),
        "scoring lambda should look up the precomputed ratio attribute")
    }
  }

  test("no query plans an unpartitioned window (single-partition shuffle)") {
    import org.apache.spark.sql.execution.window.WindowExec
    // q_epoch_plan / q_quality_calibration run their cumulative windows
    // over POST-AGGREGATION relations keyed by source / margin bin —
    // #sources- and #bins-row inputs, so the single partition holds
    // dozens of rows at any corpus size (the corpus-sized work is the
    // map-side groupBy below the window). q_cms_topk's truncation-
    // detector windows run over the 64-row post-TakeOrdered candidate
    // pool — constant-size at any corpus size. Everything else must
    // partition its windows.
    val aggregatedWindow = Set("q_epoch_plan", "q_quality_calibration", "q_cms_topk")
    SparkEntry.queries.keys
      .filterNot(_ == "q_kmeans_anomaly").filterNot(aggregatedWindow)
      .foreach { name =>
        val bad = collectAll(plan(name)) {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        assert(bad.isEmpty, s"$name plans a WindowExec with no partitioning")
      }
  }

  test("session-8 additions keep their declared plan shapes") {
    // q_knn_graph: candidates come from the cell equi join — the plan
    // must contain no nested-loop join (all-pairs) anywhere, and its
    // top-k window partitions by source node. The edge list is
    // persisted, so the join/window live under the InMemoryRelation —
    // expand cached plans before collecting
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case m: InMemoryTableScanExec => m.relation.cachedPlan
      }
      p.collect(pf) ++ nested.flatMap(deepCollect(_)(pf))
    }
    // the edge list sits behind a Mat boundary (self-releasing
    // checkpoint) in production; flip it transparent so the full
    // logical tree — cell join, top-k window — is inspectable
    val knn = graft.core.Mat.withTransparent()(plan("q_knn_graph"))
    assert(deepCollect(knn) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "q_knn_graph must generate candidates via the cell equi join, not all-pairs")
    assert(deepCollect(knn) { case w: WindowExec if w.partitionSpec.nonEmpty => w }.nonEmpty,
      "q_knn_graph top-k window must partition by source node")
    // q_lsh_recall: truth and candidate sides are both equi joins; the
    // left join attaching hits is equi too — no NLJ may appear
    val lr = plan("q_lsh_recall")
    assert(collectAll(lr) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "q_lsh_recall must stay equi-join only")
  }

  test("every registered doc-pair dedup query's pair source is cap-bounded (no raw-shingle join)") {
    // Round-9: the uncapped shingle equi self-join (C(n,2) on a hot
    // key) is retired to spec-only truth. Every registered query whose
    // candidates are document pairs must generate them from the bounded
    // posting-list scaffold — visible in the plan as the KMV sketch
    // aggregate — and must contain NO join keyed on the raw shingle
    // attribute `sh`. (q_source_overlap is out of scope: its shingle
    // join runs over DISTINCT (source, shingle) rows, per-key fanout
    // <= |sources|, and its pairs are sources, not documents.)
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.catalyst.expressions.Attribute
    def deep[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case m: InMemoryTableScanExec => m.relation.cachedPlan
      }
      p.collect(pf) ++ nested.flatMap(deep(_)(pf))
    }
    val docPairFamily = Seq(
      "q_dedup_ngram", "q_dedup_ngram_capped", "q_containment",
      "q_containment_capped", "q_fuzzy_pairs", "q_lsh_recall",
      "q_dedup_components", "q_canonical_docs", "q_dup_cluster_sizes",
      "q_dup_quality", "q_dup_degree", "q_minhash_components",
      "q_cross_snapshot_recall")
    docPairFamily.foreach { name =>
      val p = plan(name)
      def keyNames(ks: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        ks.flatMap(_.collect { case a: Attribute => a.name })
      val shKeyed = deep(p) {
        case j: SortMergeJoinExec if keyNames(j.leftKeys).contains("sh") => j.nodeName
        case j: ShuffledHashJoinExec if keyNames(j.leftKeys).contains("sh") => j.nodeName
        case j: BroadcastHashJoinExec if keyNames(j.leftKeys).contains("sh") => j.nodeName
      }
      assert(shKeyed.isEmpty,
        s"$name joins on the raw shingle key (unbounded hot-key fanout): $shKeyed")
    }
    // and the four re-based queries really ride the posting-list
    // scaffold: its eager localCheckpoint leaves an ExistingRDD scan as
    // the pair source (the uncapped spec-only scaffold's pair join, by
    // contrast, would surface the sh-keyed join the assertion above
    // forbids)
    Seq("q_dedup_ngram", "q_containment", "q_fuzzy_pairs", "q_lsh_recall").foreach { name =>
      val s = plan(name).toString
      assert(s.contains("ExistingRDD"),
        s"$name should read pairs off the checkpointed bounded posting lists")
    }
  }

  test("phash pair source is cap-bounded: KMV posting lists, no band-keyed join") {
    // Round-10: the batch perceptual-hash pair source was the engine's
    // last unbounded pair join (a (band, bv) self-join over per-ASSET
    // band rows). Its rebuilt plan must generate candidates from the
    // bounded KMV posting lists over identical-code REPRESENTATIVES —
    // visible as the kmv_sketch aggregate — and must contain NO join
    // keyed on the band value `bv` (the unbounded hot-bucket fanout).
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.catalyst.expressions.Attribute
    val p = graft.pipeline.Multimodal.computeRepPairs(spark, sf)
      .queryExecution.executedPlan
    def keyNames(ks: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      ks.flatMap(_.collect { case a: Attribute => a.name })
    val bvKeyed = collectAll(p) {
      case j: SortMergeJoinExec if keyNames(j.leftKeys).contains("bv") => j.nodeName
      case j: ShuffledHashJoinExec if keyNames(j.leftKeys).contains("bv") => j.nodeName
      case j: BroadcastHashJoinExec if keyNames(j.leftKeys).contains("bv") => j.nodeName
    }
    assert(bvKeyed.isEmpty,
      s"phash pair source joins on the raw band bucket (unbounded hot-bucket fanout): $bvKeyed")
    assert(p.toString.contains("kmv_sketch"),
      "phash pair source must generate candidates from the bounded KMV posting lists")
  }

  test("q_cms_topk: no full per-key aggregate feeds the candidate side") {
    // the round-7 defect: candidates came from counting EVERY key
    // exactly, which defeats the sketch. Every aggregate that groups by
    // user_id and carries aggregate functions (count/min state — a
    // plain DISTINCT has none) must sit above a broadcast join: either
    // the grid lookup (estimate side) or the candidate semi-filter
    // (exact side). A bare count-by-key over raw events fails here.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def expand(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(expand)) ++ (p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case _ => Seq.empty
      })
    val all = expand(plan("q_cms_topk"))
    val keyedCounting = all.collect {
      case a: BaseAggregateExec
        if a.aggregateExpressions.nonEmpty &&
          a.groupingExpressions.exists(_.toString.contains("user_id")) => a
    }
    assert(keyedCounting.nonEmpty, "expected keyed aggregates in the plan")
    keyedCounting.foreach { a =>
      val hasBroadcastBelow = expand(a).exists {
        case _: BroadcastHashJoinExec => true
        case _ => false
      }
      assert(hasBroadcastBelow,
        s"per-key aggregate without a broadcast pre-filter below it: ${a.nodeName} " +
          "— the candidate path is materializing every key's count again")
    }
  }

  test("round-8 additions keep their declared plan shapes") {
    // q_minhash_incremental: the incoming batch broadcasts into the
    // corpus band index — the corpus side must never shuffle for an
    // ingest check
    val mi = collectAll(plan("q_minhash_incremental")) { case j: BroadcastHashJoinExec => j }
    assert(mi.nonEmpty, "q_minhash_incremental must broadcast the incoming batch")
    // q_band_stats: a report query — pure aggregation, no join at all
    // (the all-queries NLJ rule covers the rest of the new surface)
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val bs = collectAll(plan("q_band_stats")) { case j: BaseJoinExec => j }
    assert(bs.isEmpty, "q_band_stats must be join-free (two chained aggregations)")
  }

  test("round-9 additions keep their declared plan shapes") {
    // q_embed_stats: a one-row report — one scan, aggregation only,
    // no join anywhere (the distinct slots expand inside the agg)
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val es = collectAll(plan("q_embed_stats")) { case j: BaseJoinExec => j }
    assert(es.isEmpty, "q_embed_stats must be join-free (single wide aggregation)")
    // q_dedup_sweep: the threshold relation is literal-sized and must
    // attach to the scored pairs as broadcast joins — the pair relation
    // never shuffles for the report
    val sw = collectAll(plan("q_dedup_sweep")) { case j: BroadcastHashJoinExec => j }
    assert(sw.size >= 2, s"q_dedup_sweep must broadcast its tiny per-threshold aggregates, got ${sw.size}")
  }

  test("round-11 ingest gates: the index side never re-shuffles; keeper map broadcasts") {
    // with broadcast off, the gate joins must ride the persisted
    // bucketing: only the trigger-sized stream side may exchange —
    // an exchange whose child still carries the index's signature /
    // code / vector payload means the INDEX re-shuffled per trigger,
    // which is exactly what the bucketed layout exists to prevent
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("q_ingest_gate" -> "sig_c", "q_phash_ingest_gate" -> "phash_c",
        "q_audio_ingest_gate" -> "fp_c",
        "q_embed_ingest_gate" -> "emb_c").foreach { case (q, payload) =>
        val idxEx = collectAll(plan(q)) {
          case e: ShuffleExchangeExec if e.child.output.exists(_.name == payload) => e
        }
        assert(idxEx.isEmpty,
          s"$q must not shuffle the index side (exchange carries $payload)")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // the composed admission verdict: the exact-dup keeper map attaches
    // as a broadcast hash join (the corpus hash index never shuffles
    // the arriving docs for the lookup). The registered query reads the
    // per-dataset memo (a checkpoint leaf), so the shape assert runs
    // against the COMPUTE form the memo materializes.
    val admDf = graft.streaming.IngestGate.computeEstateAdmission(
      spark, "/root/testdata/sf0.001")
    val admPlan = admDf.queryExecution.executedPlan
    val expanded = admPlan +: admPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }
    val adm = expanded.flatMap(_.collect { case j: BroadcastHashJoinExec => j })
    assert(adm.nonEmpty, "q_estate_admission must broadcast the keeper map")
  }

  test("round-10 estate queries keep their declared plan shapes") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // q_sig_index_stats: the (band, bh) bucket aggregation reads the
    // compacted estate table's bucket files with NO index-side exchange
    // (partial+final ride the stored bucketing); only the tiny per-band
    // rollup may shuffle
    val sig = plan("q_sig_index_stats")
    val sigBucketEx = collectAll(sig) {
      case e: ShuffleExchangeExec if e.child.output.exists(_.name == "bh") => e
    }
    assert(sigBucketEx.isEmpty,
      s"q_sig_index_stats must aggregate bucket-aligned, found exchange:\n$sig")
    // q_embed_index_stats: grouping by the bucket key itself — the
    // whole readout plans ZERO shuffles over the merged index
    val emb = collectAll(plan("q_embed_index_stats")) { case e: ShuffleExchangeExec => e }
    assert(emb.isEmpty,
      s"q_embed_index_stats must be exchange-free over the cell-bucketed estate table")
    // q_phash_estate_merge: a band-pruned scan of the merged table —
    // no join, no shuffle, band predicate pushed to parquet
    val pem = plan("q_phash_estate_merge")
    assert(collectAll(pem) { case j: BaseJoinExec => j }.isEmpty &&
      collectAll(pem) { case e: ShuffleExchangeExec => e }.isEmpty,
      "q_phash_estate_merge must be a pure pruned scan")
    assert(pem.toString.contains("PushedFilters") && pem.toString.contains("band"),
      "q_phash_estate_merge must push the band predicate into the scan")
    // q_phash_band_stats: join-free, two grouped passes at most
    // (bucket counts, then the 3-row per-band rollup)
    val pbs = plan("q_phash_band_stats")
    assert(collectAll(pbs) { case j: BaseJoinExec => j }.isEmpty,
      "q_phash_band_stats must not join (reads the memoized membership)")
    assert(collectAll(pbs) { case e: ShuffleExchangeExec => e }.size <= 2,
      "q_phash_band_stats must aggregate in two grouped passes")
  }

  test("IVF-family assignment uses NearestCenter, and the PQ cell join broadcasts the probe side") {
    // regression guard for the 64 KB codegen cliff: the unrolled
    // literal-centroid argmin janino-failed and silently degraded the
    // stage to interpreted execution. The optimized plans must carry
    // the NearestCenter expression instead of an unrolled struct
    // array_min over every centroid.
    // Mat boundaries hide the assignment projections behind RDD scans;
    // inspect with the boundary transparent (same operators, full tree)
    graft.core.Mat.withTransparent() {
      Seq("q_ann_ivfpq", "q_pq_encode", "q_knn_graph", "q_semantic_dedup",
        "q_hard_negatives").foreach { q =>
        val s = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan.toString
        assert(s.contains("nearestcenter"),
          s"$q assignment must go through the NearestCenter codegen argmin")
      }
    }
    // the ~1% query sample must broadcast into the cell join — at scale
    // the corpus side never shuffles for candidate generation
    val pq = plan("q_ann_ivfpq")
    assert(collectAll(pq) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "q_ann_ivfpq cell join must be a broadcast hash join (probe side broadcast)")
  }
}
