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
    // `recall_sweep` as the 4th arg: instead of timing headliners, run
    // the IVF recall eval at each probe width 1..IvfProbeMax on the
    // synthesized corpus (plus the production width) — the instrument
    // that prices the probe CAP in recall, which the r13 verbatim
    // replicas made unmeasurable (every at-scale recall read 1.000)
    val recallSweep = args.length > 3 && args(3).trim == "recall_sweep"
    // `lifecycle` as the 4th arg: drive the four-modality estate
    // lifecycle (add → sweep → compact → expire → probe-sweep,
    // EstateLifecycleSpec's shape) END TO END at probe scale and
    // record per-leg wall-clock — every leg was measured query-by-query
    // before r14, but never the composed sequence (r13 Next #5)
    val lifecycle = args.length > 3 && args(3).trim == "lifecycle"
    // `stream_gates` as the 4th arg: time the composed admission
    // stream (StreamBench.admissionMeasure) against the 1x and Nx
    // persisted estates — the streaming twins' first at-scale record
    val streamGates = args.length > 3 && args(3).trim == "stream_gates"
    val headliners =
      if (args.length > 3 && !recallSweep && !lifecycle && !streamGates) {
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
    val synthVersion = "v5-cycled-perturbation"
    locally {
      import java.nio.file.{Files, Paths}
      val verFile = Paths.get(out, "_synth_version")
      val ok =
        try Files.exists(verFile) && Files.readString(verFile).trim == synthVersion
        catch { case _: Throwable => false }
      if (!ok) {
        // marker comes OFF first and goes back on only after every
        // synthesis write below completes: stamping before the writes
        // (the pre-r14 order) meant a crash mid-synthesis left a
        // current-version marker beside a torn parquet dir, and the
        // next run trusted the partial data instead of self-healing
        Files.deleteIfExists(verFile)
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
      }
    }
    // SPARK_GRAFT_SCALE_TABLES limits which tables synthesize (default
    // all three): a vectors-only probe (e.g. the width-ladder check at
    // factor 1000) must not pay a 5M-document text rewrite it never
    // reads. Queries over an unsynthesized table fail loudly on the
    // missing path — never silently read the base.
    val wantedTables = sys.env.getOrElse("SPARK_GRAFT_SCALE_TABLES",
        "documents,embeddings,events")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val synthDocs = s"$out/documents.parquet"
    if (wantedTables("documents") &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(synthDocs))) {
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
    // embeddings replicate under the same id remap with a GRADED
    // PER-REPLICA PERTURBATION (replica 0 verbatim; replica r adds
    // deterministic per-component noise of amplitude
    // 0.015·(1 + (r−1) mod 9) — cycling so the schedule is factor-safe,
    // see the expression comment below — seeded from the remapped
    // (vec_id, component) pair, the `~rep` vocabulary trick's vector
    // twin). On 64-dim unit vectors the noise norm is ≈ 4.62·amplitude,
    // so replica cosines to the base GRADE from ≈0.999 down to ≈0.85
    // within each 9-replica cycle: every replica stays
    // its base's genuine neighbor (organic pairs sit near cosine 0)
    // and far above every dup threshold (SemDeDup τ = 0.4), so the
    // planted cross-replica semantic-dup lattice — the composed
    // admission's embed leg at 10x — survives. What CHANGES is
    // identity: the r13 verbatim replicas made every at-scale recall
    // read a degenerate 1.000 (true top-k were identical vectors,
    // necessarily co-celled with the query), and a first UNIFORM ±0.01
    // attempt measured the same (cos 0.999 keeps all nine replicas
    // co-celled, truth never leaves the home cell). The graded
    // amplitudes keep the top-k truth intra-clique while pushing its
    // outer members across k-means cell boundaries — the regime where
    // the probe cap actually prices recall.
    val synthEmb = s"$out/embeddings.parquet"
    if (wantedTables("embeddings") &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/embeddings.parquet")) &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(synthEmb))) {
      val e = spark.read.parquet(s"$base/embeddings.parquet")
      val reps = spark.range(0, factor).select(col("id").cast("int").as("rep"))
      e.crossJoin(reps)
        .select((col("vec_id") * factor + col("rep")).as("vec_id"),
          col("rep"), col("embedding"), col("label"))
        .withColumn("embedding",
          when(col("rep") === 0, col("embedding"))
            // amplitude CYCLES 0.015..0.135 (1 + (rep−1) mod 9): the
            // schedule saturates at the factor-10 grading whatever the
            // factor. The first form (0.015·rep unbounded) was a
            // factor-10 design silently inherited by factor 100, where
            // rep 99 carried per-component noise ±1.49 — norm ≈ 7 on
            // unit vectors, i.e. 90% of the corpus was far-flung NOISE,
            // not near-dup replicas: the planted dup lattice dissolved
            // (cos < τ beyond rep ≈ 20) and the IVF fit collapsed to a
            // 98%-share cell (196,485 of 200,000 vectors in cell 0 —
            // measured), turning q_ann_ivfpq's candidate join into a
            // ~4×10⁸-row sort that ran for an hour. At factor ≤ 10 the
            // cycled form is IDENTICAL to the graded form, so the 10×
            // recall table stands unchanged.
            .otherwise(expr(
              """transform(embedding, (x, i) ->
                 CAST(x + (0.015 * (1 + pmod(rep - 1, 9)))
                        * ((pmod(xxhash64(vec_id, i), 2001) - 1000) / 1000.0)
                      AS FLOAT))""")))
        .select(col("vec_id"), col("embedding"), col("label"))
        .repartition(cpus.toInt).write.mode(SaveMode.Overwrite).parquet(synthEmb)
      System.err.println(s"[scale] synthesized ${factor}x perturbed embeddings at $synthEmb")
    }
    // events replicate with event_id AND user_id remapped per replica,
    // so the profile's two high-cardinality exact-count(DISTINCT) slots
    // grow ×factor with the rows — the realistic scale-up (more data =
    // more users), and exactly the stress that should push q_profile
    // superlinear and measure where q_profile_approx becomes mandatory.
    // Low-cardinality columns (event_type, props) replicate verbatim:
    // categorical vocabularies do not grow with corpus size.
    val synthEvents = s"$out/events.parquet"
    if (wantedTables("events") &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/events.parquet")) &&
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
    // all three synthesis writes are complete (or were already current):
    // NOW the dir may carry the version stamp (see the deleteIfExists
    // above for why the order matters)
    locally {
      import java.nio.file.{Files, Paths}
      Files.createDirectories(Paths.get(out))
      Files.writeString(Paths.get(out, "_synth_version"), synthVersion + "\n")
      ()
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

    if (lifecycle) {
      import graft.sources.{AudioIndex, EmbedIndex, PhashIndex, SignatureIndex}
      def timed(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val rows = f
        (rows, (System.nanoTime() - t0) / 1e9)
      }
      def drop(tables: String*): Unit =
        tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
      // three "monthly crawls" by doc_id mod 3 plus a 1% probe crawl
      // re-identified above every synth id — the EstateLifecycleSpec
      // sequence on the real corpus instead of a 20-doc fixture
      def lifecycleRow(dir: String): String = {
        val docs = graft.queries.Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"), col("source"))
        def crawlN(m: Int) = docs.filter(col("doc_id") % 3 === m)
        val probe = docs.filter(col("doc_id") % 97 === 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000000L))
        val emb = graft.queries.Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"))
        def embCrawlN(m: Int) = emb.filter(col("vec_id") % 3 === m)
        val embProbe = emb.filter(col("vec_id") % 97 === 0)
          .withColumn("vec_id", col("vec_id") + lit(10000000000L))
        val centers = graft.pipeline.Similarity.estateCenters(spark, dir)
        def family(name: String,
            add: () => Unit,
            sweep: () => Long,
            compact: () => Unit,
            expire: () => Unit,
            probeSweep: () => Long,
            tables: Seq[String]): String =
          try {
            val (_, tAdd) = timed { add(); 0L }
            val (sweepRows, tSweep) = timed(sweep())
            val (_, tCompact) = timed { compact(); 0L }
            val (_, tExpire) = timed { expire(); 0L }
            val (probeRows, tProbe) = timed(probeSweep())
            spark.catalog.clearCache()
            s""""$name":{"add_sec":${fmt(tAdd)},"sweep_sec":${fmt(tSweep)},""" +
              s""""compact_sec":${fmt(tCompact)},"expire_sec":${fmt(tExpire)},""" +
              s""""probe_sweep_sec":${fmt(tProbe)},"sweep_rows":$sweepRows,""" +
              s""""probe_rows":$probeRows}"""
          } finally drop(tables: _*)
        def sigF() = family("signature",
          add = () => {
            SignatureIndex.write(crawlN(0), "lcp_sig_s1")
            SignatureIndex.write(crawlN(1), "lcp_sig_s2")
            SignatureIndex.write(crawlN(2), "lcp_sig_s3")
            SignatureIndex.write(probe, "lcp_sig_probe")
          },
          sweep = () => SignatureIndex.crossSnapshotMatches(spark, "lcp_sig_s1", "lcp_sig_s2").count(),
          compact = () => {
            SignatureIndex.merge(spark, Seq("lcp_sig_s1", "lcp_sig_s2"), "lcp_sig_e12")
            SignatureIndex.merge(spark, Seq("lcp_sig_e12", "lcp_sig_s3"), "lcp_sig_e123")
          },
          expire = () => SignatureIndex.removeSnapshot(spark, "lcp_sig_e123", "lcp_sig_s1", "lcp_sig_e23"),
          probeSweep = () => SignatureIndex.crossSnapshotMatches(spark, "lcp_sig_e23", "lcp_sig_probe").count(),
          tables = Seq("lcp_sig_s1", "lcp_sig_s2", "lcp_sig_s3", "lcp_sig_probe",
            "lcp_sig_e12", "lcp_sig_e123", "lcp_sig_e23"))
        def phF() = family("phash",
          add = () => {
            PhashIndex.write(crawlN(0), "lcp_ph_s1")
            PhashIndex.write(crawlN(1), "lcp_ph_s2")
            PhashIndex.write(crawlN(2), "lcp_ph_s3")
            PhashIndex.write(probe, "lcp_ph_probe")
          },
          sweep = () => PhashIndex.crossSnapshotMatches(spark, "lcp_ph_s1", "lcp_ph_s2").count(),
          compact = () => {
            PhashIndex.merge(spark, Seq("lcp_ph_s1", "lcp_ph_s2"), "lcp_ph_e12")
            PhashIndex.merge(spark, Seq("lcp_ph_e12", "lcp_ph_s3"), "lcp_ph_e123")
          },
          // phash rows are code-group facts with no per-asset tombstone:
          // retention re-merges the surviving snapshot lanes (the
          // index's documented form, EstateLifecycleSpec's phash leg)
          expire = () => PhashIndex.merge(spark, Seq("lcp_ph_s2", "lcp_ph_s3"), "lcp_ph_e23"),
          probeSweep = () => PhashIndex.crossSnapshotMatches(spark, "lcp_ph_e23", "lcp_ph_probe").count(),
          tables = Seq("lcp_ph_s1", "lcp_ph_s2", "lcp_ph_s3", "lcp_ph_probe",
            "lcp_ph_e12", "lcp_ph_e123", "lcp_ph_e23"))
        def auF() = family("audio",
          add = () => {
            AudioIndex.write(crawlN(0), "lcp_au_s1")
            AudioIndex.write(crawlN(1), "lcp_au_s2")
            AudioIndex.write(crawlN(2), "lcp_au_s3")
            AudioIndex.write(probe, "lcp_au_probe")
          },
          sweep = () => AudioIndex.crossSnapshotMatches(spark, "lcp_au_s1", "lcp_au_s2").count(),
          compact = () => {
            AudioIndex.merge(spark, Seq("lcp_au_s1", "lcp_au_s2"), "lcp_au_e12")
            AudioIndex.merge(spark, Seq("lcp_au_e12", "lcp_au_s3"), "lcp_au_e123")
          },
          expire = () => AudioIndex.removeSnapshot(spark, "lcp_au_e123", "lcp_au_s1",
            Seq("lcp_au_s2", "lcp_au_s3"), "lcp_au_e23"),
          probeSweep = () => AudioIndex.crossSnapshotMatches(spark, "lcp_au_e23", "lcp_au_probe").count(),
          tables = Seq("lcp_au_s1", "lcp_au_s2", "lcp_au_s3", "lcp_au_probe",
            "lcp_au_e12", "lcp_au_e123", "lcp_au_e23"))
        def emF() = family("embed",
          add = () => {
            EmbedIndex.write(embCrawlN(0), "lcp_em_s1", centers)
            EmbedIndex.write(embCrawlN(1), "lcp_em_s2", centers)
            EmbedIndex.write(embCrawlN(2), "lcp_em_s3", centers)
            EmbedIndex.write(embProbe, "lcp_em_probe", centers)
          },
          sweep = () => EmbedIndex.crossSnapshotMatches(spark, "lcp_em_s1", "lcp_em_s2").count(),
          compact = () => {
            EmbedIndex.merge(spark, Seq("lcp_em_s1", "lcp_em_s2"), "lcp_em_e12")
            EmbedIndex.merge(spark, Seq("lcp_em_e12", "lcp_em_s3"), "lcp_em_e123")
          },
          expire = () => EmbedIndex.removeSnapshot(spark, "lcp_em_e123", "lcp_em_s1", "lcp_em_e23"),
          probeSweep = () => EmbedIndex.crossSnapshotMatches(spark, "lcp_em_e23", "lcp_em_probe").count(),
          tables = Seq("lcp_em_s1", "lcp_em_s2", "lcp_em_s3", "lcp_em_probe",
            "lcp_em_e12", "lcp_em_e123", "lcp_em_e23"))
        // SPARK_GRAFT_LIFECYCLE_FAMILIES selects which families run
        // (default all four): the adjudication workflow re-times ONE
        // suspect family under changed provisioning (heap, cpus)
        // without paying the other three — e.g. the 1000x phash add
        // leg's heap-pressure A/B. Unknown names fail loudly.
        val all = Seq("signature" -> (() => sigF()), "phash" -> (() => phF()),
          "audio" -> (() => auF()), "embed" -> (() => emF()))
        val wantedFams = sys.env.getOrElse("SPARK_GRAFT_LIFECYCLE_FAMILIES",
            all.map(_._1).mkString(","))
          .split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknownFams = wantedFams -- all.map(_._1).toSet
        require(unknownFams.isEmpty, s"unknown lifecycle families: $unknownFams")
        val parts = all.collect { case (name, f) if wantedFams(name) =>
          val json = f()
          System.err.println(s"[scale] lifecycle $name done ($dir)")
          json
        }
        s"""{"dataset":"$dir","lifecycle":{${parts.mkString(",")}}}"""
      }
      // base == out runs the row ONCE (the adjudication form: re-time
      // the Nx corpus alone without paying the 1x reference pass)
      val l1 = lifecycleRow(base)
      val lN = if (out == base) None else Some(lifecycleRow(out))
      try spark.stop() catch { case _: Throwable => () }
      println(l1)
      lN.foreach(println)
      return
    }

    if (streamGates) {
      // stream twins at probe scale (r14 Next stretch): the batch
      // surface has three measured decades, the composed ADMISSION
      // STREAM (all four index gates per trigger) had only sf0.1
      // records. Drive it against the 1x and Nx estates — per-trigger
      // wall-clock vs estate size is the number that must stay ~flat
      // if the gates really read only matching bucket files. Two
      // measured passes per estate (cold builds the persisted indexes
      // once via the memoized stores; warm times the gate alone — the
      // ScaleProbe cold/warm convention).
      def fmt3(x: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
      // SPARK_GRAFT_STREAM_PER_TRIGGER sizes the synthetic trigger
      // (default 20k docs — the committed decade table's shape). The
      // 1000x adjudication showed per-trigger cost is dominated by one
      // columnar scan of the index estate, i.e. per TRIGGER, not per
      // doc — this knob is how that claim gets measured instead of
      // asserted (a 10x trigger should read ~the same seconds).
      val perTrigger = sys.env.get("SPARK_GRAFT_STREAM_PER_TRIGGER")
        .map(_.toInt).getOrElse(20000)
      def gateRow(dir: String): String = {
        def run() = StreamBench.admissionMeasure(spark, dir, perTrigger, 3)
        val cold = run()
        val warm = run()
        spark.catalog.clearCache()
        s"""{"docs_per_sec_cold":${cold.msgsPerSec},"docs_per_sec_warm":${warm.msgsPerSec},""" +
          s""""sec_per_trigger_warm":${fmt3(warm.seconds / 3)},""" +
          s""""rejected_warm":${warm.anomalies},"docs":${warm.messages}}"""
      }
      // base == out: one estate, one row (the lifecycle convention —
      // re-measure the Nx gate alone without paying the 1x pass)
      val g1 = gateRow(base)
      System.err.println(s"[scale] stream gates first estate done")
      val gN = if (out == base) None else Some(gateRow(out))
      try spark.stop() catch { case _: Throwable => () }
      println(s"""{"dataset":"1x","dir":"$base","admission_stream":$g1}""")
      gN.foreach(g =>
        println(s"""{"dataset":"${factor}x","dir":"$out","admission_stream":$g}"""))
      return
    }

    if (recallSweep) {
      import graft.pipeline.Similarity
      def fmt4(x: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(x))
      // per-width mean recall@IvfTopK over the capped probe set; the
      // exact truth leg is identical across widths, so differences are
      // purely the probe budget's
      def sweepRow(dir: String): String = {
        val widths = Seq(1, 2, 4, 8, 16).map(Some(_)) :+ None
        val rows = widths.map { p =>
          val r = Similarity.annRecallProbe(spark, dir, p)
            .agg(avg(col("recall")).as("m"), count(lit(1)).as("n")).head()
          val label = p.map(_.toString).getOrElse("production")
          spark.catalog.clearCache()
          s"""{"nprobe":"$label","mean_recall":${fmt4(r.getDouble(0))},"queries":${r.getLong(1)}}"""
        }
        s"""[${rows.mkString(",")}]"""
      }
      val sweep1 = sweepRow(base)
      System.err.println(s"[scale] recall sweep 1x done")
      val sweepN = sweepRow(out)
      try spark.stop() catch { case _: Throwable => () }
      println(s"""{"dataset":"1x","dir":"$base","recall_vs_nprobe":$sweep1}""")
      println(s"""{"dataset":"${factor}x","dir":"$out","recall_vs_nprobe":$sweepN}""")
      return
    }

    val j1 = measure(base, "1x")
    System.err.println(s"[scale] 1x done")
    val j10 = measure(out, s"${factor}x")
    try spark.stop() catch { case _: Throwable => () }
    println(j1)
    println(j10)
  }
}
