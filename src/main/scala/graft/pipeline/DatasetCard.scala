package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** q_dataset_card: the ONE-ROW dataset report a curated corpus ships
  * with — corpus size, token volume, and the full disposition of every
  * document through the curation pipeline (how many kept, and how many
  * each exclusion rule claimed), plus the split sizes of what remains.
  * This is the top of the reporting stack: `q_curate` is the per-doc
  * manifest, `q_filter_funnel` the rule-attribution histogram, and the
  * card is the headline numbers both roll up to.
  *
  * Scale: one count/sum scan over documents plus the curate relation's
  * own aggregation collapsed to a single row by conditional sums —
  * map-side partials everywhere, output is one row at any corpus size.
  * Every number is an exact integer (counts and a long token sum), so
  * cross-engine equality is trivial.
  */
object DatasetCard {

  def datasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    totals.crossJoin(broadcast(decisionsOf(Curate.curateMat(spark, sfDir))))
  }

  /** The card's decision counts over a per-doc verdict relation —
    * shared by the batch card and the state-assembled incremental one
    * ([[IncrementalCurate.datasetCardIncremental]]).
    */
  private[pipeline] def decisionsOf(cur: DataFrame): DataFrame = {
    def nReason(r: String) =
      sum(when(col("reason") === r, 1L).otherwise(0L)).as(s"n_$r")
    def nSplit(s: String) =
      sum(when(col("split") === s, 1L).otherwise(0L)).as(s"n_$s")
    cur.agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      nReason("too_short"), nReason("too_repetitive"), nReason("blocklisted"),
      nReason("exact_dup"), nReason("eval_holdout"), nReason("contaminated"),
      nReason("low_importance"),
      nSplit("train"), nSplit("val"), nSplit("test"))
  }

  // ---- q_dataset_card_estate ---------------------------------------------

  /** q_dataset_card_estate: the one-row card over the FULL estate
    * authority ([[Curate.keepListEstate]]) — the batch card's
    * disposition counts extended with the near-dup resolution and the
    * three modality gates (`n_near_dup`, `n_image_dup`, `n_audio_dup`,
    * `n_semantic_dup`), plus the split sizes of what actually ships.
    * This is the headline report of the complete 4-modality curation
    * stack; every number is an exact integer.
    */
  def datasetCardEstate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val kl = Curate.keepListEstate(spark, sfDir)
    def nReason(r: String) =
      sum(when(col("reason") === r, 1L).otherwise(0L)).as(s"n_$r")
    def nSplit(s: String) =
      sum(when(col("split") === s, 1L).otherwise(0L)).as(s"n_$s")
    val decisions = kl.agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      nReason("too_short"), nReason("too_repetitive"), nReason("blocklisted"),
      nReason("exact_dup"), nReason("eval_holdout"), nReason("contaminated"),
      nReason("low_importance"), nReason("near_dup"),
      nReason("image_dup"), nReason("audio_dup"), nReason("semantic_dup"),
      nSplit("train"), nSplit("val"), nSplit("test"))
    totals.crossJoin(broadcast(decisions))
  }

  /** DuckDB mirror (post-fit — nests the estate keep list). */
  def datasetCardEstateSql: Option[String] =
    Curate.keepListEstateSql.map { klSql =>
      val reasons = Seq("too_short", "too_repetitive", "blocklisted",
        "exact_dup", "eval_holdout", "contaminated", "low_importance",
        "near_dup", "image_dup", "audio_dup", "semantic_dup")
      val reasonCols = reasons.map(r =>
        s"CAST(SUM(CASE WHEN reason = '$r' THEN 1 ELSE 0 END) AS BIGINT) AS n_$r").mkString(",\n             ")
      val splitCols = Seq("train", "val", "test").map(s =>
        s"CAST(SUM(CASE WHEN split = '$s' THEN 1 ELSE 0 END) AS BIGINT) AS n_$s").mkString(",\n             ")
      s"""
    WITH t AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents
    ),
    r AS (SELECT * FROM ($klSql)),
    d AS (
      SELECT CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             $reasonCols,
             $splitCols
      FROM r
    )
    SELECT * FROM t CROSS JOIN d"""
    }

  val datasetCardSql: String = {
    val reasons = Seq("too_short", "too_repetitive", "blocklisted",
      "exact_dup", "eval_holdout", "contaminated", "low_importance")
    val reasonCols = reasons.map(r =>
      s"CAST(SUM(CASE WHEN reason = '$r' THEN 1 ELSE 0 END) AS BIGINT) AS n_$r").mkString(",\n             ")
    val splitCols = Seq("train", "val", "test").map(s =>
      s"CAST(SUM(CASE WHEN split = '$s' THEN 1 ELSE 0 END) AS BIGINT) AS n_$s").mkString(",\n             ")
    s"""
    WITH t AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents
    ),
    r AS (${Curate.curateSql}),
    d AS (
      SELECT CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             $reasonCols,
             $splitCols
      FROM r
    )
    SELECT * FROM t CROSS JOIN d"""
  }
}
