package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Deterministic data-mixing operators: a training corpus is rarely
  * consumed uniformly — each source gets a target sampling rate (the
  * "data mixture"). Sampling here is HASH-GATED, not random: a document
  * is kept iff its md5-derived bucket falls under its source's
  * per-mille rate, so the selection is reproducible across runs,
  * engines, and cluster sizes (re-sharding never changes the sample),
  * and downstream incremental runs see a stable subset.
  *
  * Scale: one broadcast dimension join + a narrow codegen filter — no
  * shuffle of the fact table, linear in input.
  */
object Sampling {

  /** Per-source target rates in per-mille: higher-quality sources keep
    * more. Declarative stand-in for a real mixture config.
    */
  val MixRatesPerMille: Seq[(String, Int)] =
    (0 until 20).map(i => s"src$i" -> (900 - 40 * i))

  /** q_sample_mix: stratified deterministic sampling by source. */
  def sampleMix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dim = MixRatesPerMille.toDF("source", "rate_pm")
    docs.join(broadcast(dim), Seq("source"))
      .withColumn("bucket",
        Dedup.h32(concat(lit("mix|"), col("doc_id").cast("string"))) % 1000)
      .filter(col("bucket") < col("rate_pm"))
      .select(col("doc_id"), col("source"), col("bucket"))
  }

  val sampleMixSql: String = {
    val dimValues = MixRatesPerMille.map { case (s, r) => s"('$s', $r)" }.mkString(", ")
    s"""
    WITH dim(source, rate_pm) AS (VALUES $dimValues),
    g AS (
      SELECT doc_id, d.source, rate_pm,
             ${Dedup.h32Sql.format("'mix|' || doc_id")} % 1000 AS bucket
      FROM documents d JOIN dim ON d.source = dim.source
    )
    SELECT doc_id, source, bucket FROM g WHERE bucket < rate_pm"""
  }
}
