package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Hybrid retrieval: fuse a lexical ranking (Okapi BM25,
  * [[TextAnalysis.bm25]]) with a dense ranking (cosine against a probe
  * embedding) by reciprocal rank fusion (Cormack, Clarke & Büttcher
  * 2009: score(d) = Σ_systems 1/(k + rank_system(d)), k = 60). RRF is
  * the standard hybrid-search combiner in RAG/retrieval pipelines
  * because it needs no score calibration between systems — only ranks.
  *
  * The corpus is dual-indexed: `documents.doc_id` and
  * `embeddings.vec_id` identify the same items (driver testdata
  * generates them aligned 0..n−1), so the lexical and dense ranking
  * lists fuse on the shared id.
  *
  * Scale: each leg is a bounded-top-N retrieval (BM25: one corpus scan
  * + one global stats aggregate + TakeOrdered; dense: one corpus scan
  * against a single broadcast probe row + TakeOrdered). The fusion
  * itself touches only the two ≤ top-N rank lists — constant-size work
  * regardless of corpus size. Ranks are materialized WITHOUT a global
  * window: each ≤ N-row list collapses into ONE bounded array via a
  * global aggregate (`sort_array(collect_list(...))`) and positions
  * come from `posexplode` — no single-partition window shuffle exists
  * anywhere in the plan.
  */
object Retrieval {

  /** RRF smoothing constant (the k=60 of the original paper). */
  val RrfK = 60

  /** Neighbors retrieved by the dense leg. */
  val DenseTopN = 50

  /** Fused results returned. */
  val RrfTopN = 20

  /** The dense leg's probe: the embedding of this vec_id. */
  val ProbeVecId = 0L

  /** Collapse a bounded relation of (`ns`, `id`) rows into ranks 1..N
    * via one global aggregate + posexplode. `ns` must be the NEGATED
    * score so the ascending struct sort yields descending-score order;
    * ties break on ascending id.
    */
  private def rankOf(df: DataFrame, rankName: String): DataFrame =
    df.agg(sort_array(collect_list(struct(col("ns"), col("id")))).as("xs"))
      .select(posexplode(col("xs")).as(Seq("pos", "x")))
      .select(col("x.id").as("doc_id"), (col("pos") + 1).cast("long").as(rankName))

  def rrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    // lexical leg: BM25 top-50 (already TakeOrdered by (score desc, id))
    val lex = rankOf(
      TextAnalysis.bm25Topn(spark, sfDir)
        .select((-col("score")).as("ns"), col("doc_id").as("id")),
      "lex_rank")
    // dense leg: cosine of every vector against the single probe row
    // (global-aggregate attach — one broadcast row, O(n) scan)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("nsq"))
    val probe = emb.filter(col("vec_id") === ProbeVecId)
      .agg(first(col("embedding")).as("q_emb"), first(col("nsq")).as("q_nsq"))
    val scored = emb.filter(col("vec_id") =!= ProbeVecId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          sqrt(col("q_nsq") * col("nsq")), 6).as("cos"))
    val dense = rankOf(
      scored.orderBy(col("cos").desc, col("vec_id").asc).limit(DenseTopN)
        .select((-col("cos")).as("ns"), col("vec_id").as("id")),
      "dense_rank")
    // fusion: full outer on the shared id; a doc absent from one list
    // contributes 0 from that system
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("dense_rank")), lit(0.0)), 6))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(RrfTopN)
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"), col("rrf_score"))
  }

  val rrfFusionSql: String =
    s"""
    WITH lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
      FROM (${TextAnalysis.bm25Sql}) b
    ),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = $ProbeVecId),
    scored AS (
      SELECT e.vec_id,
             round(${Similarity.cosineSql("q.q_emb", "e.embedding")}, 6) AS cos
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> $ProbeVecId
    ),
    dense AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS dense_rank
      FROM scored ORDER BY cos DESC, vec_id ASC LIMIT $DenseTopN
    )
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank,
           round(COALESCE(CAST('1.0' AS DOUBLE)/($RrfK + l.lex_rank), CAST('0.0' AS DOUBLE))
                 + COALESCE(CAST('1.0' AS DOUBLE)/($RrfK + d.dense_rank), CAST('0.0' AS DOUBLE)), 6) AS rrf_score
    FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
    ORDER BY rrf_score DESC, doc_id ASC LIMIT $RrfTopN"""
}
