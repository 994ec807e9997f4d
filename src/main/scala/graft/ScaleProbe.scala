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
  * Usage: runMain graft.ScaleProbe [baseDir] [outDir] [factor] [q1,q2,...]
  * Prints one JSON line per measured dataset; each headliner runs
  * twice (cold = first run including memoized artifact builds, warm =
  * second run reading the materialized layouts) with the verdict-row
  * count — the number that must scale ~linearly. The optional 4th arg
  * restricts to a comma-separated subset of registered queries, which
  * makes big-factor runs affordable for a single question (e.g.
  * factor=100 with only q_profile,q_profile_approx to measure where
  * the exact count(DISTINCT) profile goes superlinear and the KMV
  * form becomes mandatory).
  */
object ScaleProbe {

  private val Headliners = Seq(
    "q_dedup_ngram_capped", "q_dedup_minhash",
    "q_cross_snapshot_dedup", "q_audio_dup_pairs", "q_dedup_simhash64",
    "q_estate_admission",
    // the three most expensive round-12 queries, previously unprobed:
    // the exact-count(DISTINCT) profile (expected SUPERLINEAR — it
    // measures where q_profile_approx becomes mandatory), the IVF+PQ
    // ADC search, and the capped-sweep recall eval (its truth leg is a
    // bounded probe — the row that proves the bound holds at 10x)
    "q_profile", "q_ann_ivfpq", "q_cross_snapshot_recall")

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/scale10x"
    val factor = if (args.length > 2) args(2).toInt else 10
    val headliners =
      if (args.length > 3) {
        val qs = args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = qs.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
        qs
      } else Headliners
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus, 2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Derivation version of the synthesis itself: an out dir generated
    // by an OLDER synthesis (e.g. the pre-round-13 `_N` replica marker,
    // whose vocabulary rewrite could alias base tokens ending in _N) is
    // invalid input for the current probe's claims — the same staleness
    // class DatasetStore's version salt guards, applied to the probe's
    // own on-disk cache. Mismatch ⇒ regenerate everything.
    val synthVersion = "v2-tilde-rep-events"
    locally {
      import java.nio.file.{Files, Paths}
      val verFile = Paths.get(out, "_synth_version")
      val ok =
        try Files.exists(verFile) && Files.readString(verFile).trim == synthVersion
        catch { case _: Throwable => false }
      if (!ok) {
        Seq("documents.parquet", "embeddings.parquet", "events.parquet").foreach { t =>
          val p = Paths.get(out, t)
          if (Files.exists(p)) {
            System.err.println(s"[scale] stale synthesis at $p (version != $synthVersion) — regenerating")
            def del(f: java.io.File): Unit = {
              val cs = f.listFiles(); if (cs != null) cs.foreach(del); f.delete(); ()
            }
            del(p.toFile)
          }
        }
        Files.createDirectories(Paths.get(out))
        Files.writeString(verFile, synthVersion + "\n")
      }
    }
    val synthDocs = s"$out/documents.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(synthDocs))) {
      val d = spark.read.parquet(s"$base/documents.parquet")
      // the replica-marker separator must be absent from the base corpus
      // or replica vocabularies are not provably disjoint (a base token
      // 'foo~rep2' would alias replica 2's rewrite of 'foo')
      val tildes = d.filter(col("text").contains("~")).count()
      require(tildes == 0, s"base corpus contains '~' in $tildes docs — pick another separator")
      val reps = spark.range(0, factor).select(col("id").cast("int").as("rep"))
      val synth = d.crossJoin(reps)
        .withColumn("text2",
          // the replica marker uses '~' — a character absent from the
          // corpus by construction (asserted below) — so a base token
          // that happens to end in `_N` can never collide with replica
          // N's rewrite and plant an unplanned cross-replica near-dup
          when(col("rep") === 0 || col("doc_id") % 100 === 0, col("text"))
            .otherwise(expr("regexp_replace(text, '(\\\\S+)', concat('$1~rep', rep))")))
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
    // events replicate with event_id AND user_id remapped per replica,
    // so the profile's two high-cardinality exact-count(DISTINCT) slots
    // grow ×factor with the rows — the realistic scale-up (more data =
    // more users), and exactly the stress that should push q_profile
    // superlinear and measure where q_profile_approx becomes mandatory.
    // Low-cardinality columns (event_type, props) replicate verbatim:
    // categorical vocabularies do not grow with corpus size.
    val synthEvents = s"$out/events.parquet"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/events.parquet")) &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(synthEvents))) {
      val ev = spark.read.parquet(s"$base/events.parquet")
      val reps = spark.range(0, factor).select(col("id").as("rep"))
      ev.crossJoin(reps)
        .select(
          (col("event_id") * factor + col("rep")).as("event_id"),
          col("ts"),
          (col("user_id") * factor + col("rep")).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(cpus.toInt).write.mode(SaveMode.Overwrite).parquet(synthEvents)
      System.err.println(s"[scale] synthesized ${factor}x events at $synthEvents")
    }

    def fmt(x: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def measure(dir: String, label: String): String = {
      val parts = headliners.map { name =>
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
