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

  // ---- q_token_pack --------------------------------------------------

  /** Token budget per packed chunk. */
  val PackBudget = 2048L

  /** Hash shards per source — the parallelism knob (see below). */
  val PackShards = 8

  /** q_token_pack: sequence packing — assign documents to fixed
    * token-budget chunks, the step that turns a curated corpus into
    * training shards. Packing is sequential by definition (a chunk is a
    * running sum), so the scalable form shards each source by a
    * deterministic doc-id hash and packs WITHIN (source, shard): the
    * window is partitioned on (source, shard) — thousands of
    * independent partitions at scale, never a global single-partition
    * window — and each doc's chunk index is
    * floor(exclusive-prefix-token-sum / budget). Deterministic:
    * ordering is (doc_id), shard is md5-derived.
    */
  def tokenPack(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val base = docs.select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      (Dedup.h32(concat(lit("shard|"), col("doc_id").cast("string"))) % PackShards).as("shard"))
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("chunk",
        floor((col("cum") - col("n_tokens")).cast("double") / lit(PackBudget.toDouble)).cast("long"))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"), col("chunk"))
  }

  val tokenPackSql: String =
    s"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ${Dedup.h32Sql.format("'shard|' || doc_id")} % $PackShards AS shard
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, source, shard, n_tokens,
           CAST(floor(CAST(cum - n_tokens AS DOUBLE) / $PackBudget.0) AS BIGINT) AS chunk
    FROM c"""
}
