package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe (dev instrument, reproducible): synthesizes a
  * FACTOR×-sized document corpus from a base dataset and times the
  * pair-family headliners on both, so the cap discipline's "candidate
  * volume grows ~linearly, the caps bind" claim carries a measured
  * multi-scale datapoint instead of a plan-assertion alone. Results
  * land in SCALE.md's 1×/10× table.
  *
  * Synthesis (deterministic): each document is replicated FACTOR times
  * with `doc_id → doc_id · FACTOR + rep`. Replica 0 keeps the original
  * text (the base corpus embeds verbatim); replicas 1..F−1 suffix
  * every token with `_rep`, which preserves the corpus's length /
  * distinct-ratio statistics while making the replica vocabularies
  * DISJOINT — so replication itself plants no accidental near-dups and
  * the pair volume the caps must bound comes from the corpus's own
  * structure. A controlled 1% (base doc_id % 100 == 0) keeps the
  * original text in EVERY replica: a planted cross-replica
  * identical-dup lattice (10-member clusters spanning both snapshot
  * parities) whose verdict volume is known by construction.
  *
  * Usage: runMain graft.ScaleProbe [baseDir] [outDir] [factor]
  * Prints one JSON line per measured dataset; each headliner runs
  * twice (cold = first run including memoized artifact builds, warm =
  * second run reading the materialized layouts) with the verdict-row
  * count — the number that must scale ~linearly.
  */
object ScaleProbe {

  private val Headliners = Seq(
    "q_dedup_ngram_capped", "q_dedup_minhash",
    "q_cross_snapshot_dedup", "q_audio_dup_pairs", "q_dedup_simhash64",
    "q_estate_admission")

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/scale10x"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val synthDocs = s"$out/documents.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(synthDocs))) {
      val d = spark.read.parquet(s"$base/documents.parquet")
      val reps = spark.range(0, factor).select(col("id").cast("int").as("rep"))
      val synth = d.crossJoin(reps)
        .withColumn("text2",
          when(col("rep") === 0 || col("doc_id") % 100 === 0, col("text"))
            .otherwise(expr("regexp_replace(text, '(\\\\S+)', concat('$1_', rep))")))
        .select(
          (col("doc_id") * factor + col("rep")).as("doc_id"),
          col("text2").as("text"),
          col("lang"), col("source"),
          length(col("text2")).cast("int").as("n_chars"))
      synth.repartition(cpus.toInt).write.mode(SaveMode.Overwrite).parquet(synthDocs)
      System.err.println(s"[scale] synthesized ${factor}x corpus at $synthDocs")
    }
    // embeddings replicate verbatim under the same id remap: identical
    // vectors across replicas are a cross-replica semantic-dup lattice
    // of known volume — the composed admission's embed leg at 10x
    val synthEmb = s"$out/embeddings.parquet"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/embeddings.parquet")) &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(synthEmb))) {
      val e = spark.read.parquet(s"$base/embeddings.parquet")
      val reps = spark.range(0, factor).select(col("id").cast("int").as("rep"))
      e.crossJoin(reps)
        .select((col("vec_id") * factor + col("rep")).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(cpus.toInt).write.mode(SaveMode.Overwrite).parquet(synthEmb)
      System.err.println(s"[scale] synthesized ${factor}x embeddings at $synthEmb")
    }

    def fmt(x: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def measure(dir: String, label: String): String = {
      val parts = Headliners.map { name =>
        val fn = SparkEntry.queries(name)
        var rows = 0L
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          rows = fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        s""""$name":{"rows":$rows,"cold_sec":${fmt(times.head)},"warm_sec":${fmt(times.last)}}"""
      }
      s"""{"dataset":"$label","dir":"$dir","queries":{${parts.mkString(",")}}}"""
    }

    val j1 = measure(base, "1x")
    System.err.println(s"[scale] 1x done")
    val j10 = measure(out, s"${factor}x")
    try spark.stop() catch { case _: Throwable => () }
    println(j1)
    println(j10)
  }
}
