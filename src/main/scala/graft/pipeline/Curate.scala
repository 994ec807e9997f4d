package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** q_curate: the end-to-end curation DECISION RECORD — one row per
  * document stating whether it enters the training corpus, the FIRST
  * rule that excluded it otherwise, and (for survivors) its split
  * assignment. This is the composition proof for the curation family:
  * quality gates (`q_filter_funnel`'s rules), exact dedup
  * (`q_dedup_exact`'s keeper), eval holdout + decontamination
  * (`q_decontaminate`), and the deterministic split (`q_split`), all in
  * one relation — the manifest a training-data pipeline actually ships.
  *
  * Rule order (first failure wins, matching the funnel's attribution):
  * too_short → too_repetitive → blocklisted → exact_dup →
  * eval_holdout (routed to eval, not training) → contaminated →
  * keep (+ train/val/test split).
  *
  * Scale: one flag scan over documents (the funnel relation), one
  * md5-keyed keeper aggregate, the decontamination broadcast-semi
  * join reused from [[Sampling.decontaminate]], and hash-derived
  * eval/split gates — no new shuffle shapes beyond the operators it
  * composes.
  */
object Curate {

  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    import TextAnalysis.{Blocklist, BlocklistThreshold, FunnelMinDistinctRatio, FunnelMinTokens}
    val docs = Tables.documents(spark, sfDir)
    val toks = TextAnalysis.tokens(col("text"))
    val lex = array(Blocklist.map(lit(_)): _*)
    val flagged = docs.select(
      col("doc_id"),
      md5(col("text")).as("h"),
      size(toks).as("nt"),
      size(array_distinct(toks)).as("ndt"),
      size(filter(toks, w => array_contains(lex, w))).as("n_blk"))
    val keepers = flagged.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val contam = Sampling.decontaminate(spark, sfDir)
      .select(col("doc_id"), col("contaminated"))
    val isEval =
      Dedup.h32(concat(lit("eval|"), col("doc_id").cast("string"))) % 25 === 0
    val reason = when(col("nt") < FunnelMinTokens, lit("too_short"))
      .when(col("ndt").cast("double") / col("nt").cast("double") < FunnelMinDistinctRatio,
        lit("too_repetitive"))
      .when(col("n_blk").cast("double") / col("nt").cast("double") >= BlocklistThreshold,
        lit("blocklisted"))
      .when(col("doc_id") =!= col("keeper"), lit("exact_dup"))
      .when(col("is_eval"), lit("eval_holdout"))
      .when(coalesce(col("contaminated"), lit(0)) === 1, lit("contaminated"))
      .otherwise(lit("keep"))
    flagged
      .join(keepers, "h")
      .withColumn("is_eval", isEval)
      .join(contam, Seq("doc_id"), "left")
      .withColumn("reason", reason)
      .select(col("doc_id"),
        (col("reason") === "keep").as("keep"),
        col("reason"),
        when(col("reason") === "keep", Sampling.splitAssign(col("doc_id")))
          .otherwise(lit(null: String)).as("split"))
  }

  val curateSql: String = {
    import TextAnalysis.{Blocklist, BlocklistThreshold, FunnelMinDistinctRatio, FunnelMinTokens}
    val splitCases = Sampling.SplitPct.map { case (n, lo, hi) =>
      s"WHEN b >= $lo AND b < $hi THEN '$n'" }.mkString(" ")
    s"""
    WITH d AS (
      SELECT doc_id, md5(text) AS h,
             len(string_split(text, ' ')) AS nt,
             len(list_distinct(string_split(text, ' '))) AS ndt,
             len([w for w in string_split(text, ' ')
                  if list_contains([${Blocklist.map(t => s"'$t'").mkString(", ")}], w)]) AS n_blk,
             ${Dedup.h32Sql.format("'eval|' || doc_id")} % 25 = 0 AS is_eval,
             ${Dedup.h32Sql.format("'split|' || doc_id")} % 100 AS b
      FROM documents
    ),
    k AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY 1),
    c AS (SELECT doc_id, contaminated FROM (${Sampling.decontaminateSql})),
    r AS (
      SELECT d.doc_id, d.b,
             CASE
               WHEN d.nt < $FunnelMinTokens THEN 'too_short'
               WHEN CAST(d.ndt AS DOUBLE) / CAST(d.nt AS DOUBLE) < $FunnelMinDistinctRatio
                 THEN 'too_repetitive'
               WHEN CAST(d.n_blk AS DOUBLE) / CAST(d.nt AS DOUBLE) >= $BlocklistThreshold
                 THEN 'blocklisted'
               WHEN d.doc_id <> k.keeper THEN 'exact_dup'
               WHEN d.is_eval THEN 'eval_holdout'
               WHEN coalesce(c.contaminated, 0) = 1 THEN 'contaminated'
               ELSE 'keep'
             END AS reason
      FROM d JOIN k ON d.h = k.h LEFT JOIN c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, reason = 'keep' AS keep, reason,
           CASE WHEN reason = 'keep' THEN (CASE $splitCases END) ELSE NULL END AS split
    FROM r"""
  }
}
