package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene (no SparkSession needed): every registered
  * query must carry a DuckDB oracle, except the two ML fits whose
  * oracles are generated AFTER their fit runs (frozen-centroid
  * mechanism — Verify runs queries before dumping oracle_sql.json, so
  * the driver still gets both). A new operator landing in `queries`
  * without an `oracleSql` entry fails here instead of silently
  * degrading to the rows-only check.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every registered query has an oracle (ML fits: post-run generated)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.subsetOf(Set("q_ann_ivf", "q_semantic_dedup", "q_kmeans_anomaly",
      "q_token_count_bpe", "q_token_pack_bpe", "q_token_fertility", "q_context_fit",
      "q_pca_project", "q_ann_pca", "q_ann_recall",
      "q_pq_encode", "q_ann_ivfpq", "q_quality_classifier",
      "q_hard_negatives", "q_bpe_train", "q_knn_graph", "q_quality_calibration",
      "q_bpe_vocab", "q_ivf_stats", "q_ivf_calibration",
      // estate-codebook (post-fit) oracles, the same frozen-fit contract
      "q_cross_snapshot_embed", "q_embed_sweep_recall", "q_embed_index_stats",
      "q_embed_retention", "q_embed_ingest_gate", "q_estate_admission",
      "q_estate_admission_stream", "q_crawl_admission",
      // these five are post-fit too (estate codebook / keep-list fits);
      // they were missing from this list and the suite only passed when
      // OTHER suites' fits had populated them first — running this spec
      // alone exposed the order-dependence (r15)
      "q_keep_list_estate", "q_keep_by_source_estate", "q_dataset_card_estate",
      "q_crawl_gate", "q_embed_incremental")),
      s"registered queries without oracle SQL: ${missing.mkString(", ")}")
  }

  test("static-oracle count tracks the registry") {
    // the post-fit oracles are Options (absent until a fit runs);
    // everything else must be present statically — this catches a
    // static oracle accidentally demoted to the post-fit path, where
    // the driver would silently lose its gate whenever the fit never
    // runs in the dumping JVM
    val postFit = 33
    assert(SparkEntry.oracleSql.size >= SparkEntry.queries.size - postFit,
      s"${SparkEntry.queries.size - SparkEntry.oracleSql.size} queries lack a static oracle " +
        s"(> $postFit post-fit allowance)")
  }

  test("no oracle without a query (stale entries)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for unregistered queries: ${orphans.mkString(", ")}")
  }
}
