package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.core.Mat.MatOps

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

  /** Greedy per-(source, shard) budget fill shared by q_token_pack and
    * Bpe.tokenPackBpe — only the per-doc weight expression differs, so
    * the shard hash, window spec, and chunk arithmetic live HERE once.
    */
  private[pipeline] def packByWeight(docs: DataFrame, weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"), col("source"), weight.as("n_tokens"),
      (Dedup.h32(concat(lit("shard|"), col("doc_id").cast("string"))) % PackShards).as("shard"))
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("chunk",
        floor((col("cum") - col("n_tokens")).cast("double") / lit(PackBudget.toDouble)).cast("long"))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"), col("chunk"))
  }

  /** DuckDB mirror of [[packByWeight]], parameterized the same way. */
  private[pipeline] def packByWeightSql(weightSql: String): String =
    s"""
    WITH t AS (
      SELECT doc_id, source,
             $weightSql AS n_tokens,
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
  def tokenPack(spark: SparkSession, sfDir: String): DataFrame =
    packByWeight(Tables.documents(spark, sfDir),
      size(split(col("text"), " ")).cast("long"))

  // ---- q_decontaminate -----------------------------------------------

  /** Words per decontamination shingle (8-grams are the common
    * benchmark-overlap unit, e.g. GPT-3 appendix C / PaLM).
    */
  val DecontamN = 8

  /** q_decontaminate: train/eval overlap removal — flag training
    * documents sharing any [[DecontamN]]-gram with the held-out eval
    * split. The eval split is hash-gated 1-in-25, deterministic, and
    * keyed on the NORMALIZED-TEXT hash (round 7 — the q_split_leakage
    * key): normalized copies of a document co-assign, so a case or
    * whitespace variant of an eval document can never remain on the
    * training side of the boundary. Grams ride the existing 60-bit
    * rolling-hash machinery so the shuffle key is 8 bytes.
    *
    * Scale: the eval gram set is small relative to the corpus (eval
    * sets always are), so the overlap test is a BROADCAST left-semi
    * join against distinct eval gram hashes — the training side never
    * shuffles; per-doc hit counts are one hash aggregation.
    */
  /** The eval-holdout tag (normalized-hash 1-in-25) — ONE definition
    * shared by the exact and fuzzy decontamination passes and the
    * overlap report; a drift here would silently split the eval
    * holdout between them.
    */
  private def evalTag(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (Dedup.h32(concat(lit("eval|"), Dedup.normTextMd5(col("text")))) % 25 === 0)
        .as("is_eval"))

  /** DuckDB twin of [[evalTag]]. */
  private val evalTagSql: String =
    s"""SELECT doc_id,
             ${Dedup.h32Sql.format(s"'eval|' || ${Dedup.normTextMd5Sql.format("text")}")} % 25 = 0 AS is_eval
      FROM documents"""

  /** The tagged [[DecontamN]]-gram relation (doc_id, is_eval, hs),
    * memoized per (application, dataset): decontamination, the fuzzy
    * variant and the eval-overlap report all start from this exact
    * tokenize + rolling-hash pass, and each used to pay its own eager
    * checkpoint of it per CALL (round-16 measurement: 0.7-1.0 s of
    * build per invocation). Spread first — the gram build is the
    * per-row-heavy class (Tables.spread).
    */
  private val decontamGramsMemo = new graft.core.Memo("decontam_grams")

  private[pipeline] def resetDecontamGramsMemo(): Unit = decontamGramsMemo.clear()

  private def decontamGrams(spark: SparkSession, sfDir: String): DataFrame =
    decontamGramsMemo.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}|$sfDir", {
        val docs = Tables.documents(spark, sfDir)
        Dedup.shingleHashes(Tables.spread(docs, col("doc_id")), n = DecontamN)
          .join(evalTag(docs), "doc_id")
          .select(col("doc_id"), col("is_eval"), col("hs"))
          .localCheckpoint(eager = true)
      })

  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val tagged = decontamGrams(spark, sfDir).select(col("doc_id"), col("is_eval"))
    val g = decontamGrams(spark, sfDir)
      .select(col("doc_id"), col("is_eval"), explode(col("hs")).as("h"))
    val evalGrams = g.filter(col("is_eval")).select(col("h")).distinct()
    val hits = g.filter(!col("is_eval"))
      .join(broadcast(evalGrams), Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    tagged.filter(!col("is_eval"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, 1).otherwise(0).as("contaminated"))
  }

  val decontaminateSql: String =
    s"""
    WITH shdoc AS (${Dedup.shingleHashesSql(DecontamN)}),
    tag AS ($evalTagSql),
    g AS (
      SELECT s.doc_id, t.is_eval, unnest(hs) AS h
      FROM shdoc s JOIN tag t ON s.doc_id = t.doc_id
    ),
    eg AS (SELECT DISTINCT h FROM g WHERE is_eval),
    hits AS (
      SELECT doc_id, count(*) AS n_hits
      FROM g WHERE NOT is_eval AND h IN (SELECT h FROM eg) GROUP BY 1
    )
    SELECT t.doc_id, coalesce(n_hits, 0) AS n_hits,
           CASE WHEN coalesce(n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
    FROM tag t LEFT JOIN hits ON t.doc_id = hits.doc_id
    WHERE NOT t.is_eval"""

  val tokenPackSql: String =
    packByWeightSql("CAST(len(string_split(text, ' ')) AS BIGINT)")

  // ---- q_decontaminate_fuzzy -----------------------------------------

  /** Estimated-Jaccard threshold above which a training document counts
    * as a fuzzy duplicate of an eval document.
    */
  val FuzzyContamMin = 0.5

  /** q_decontaminate_fuzzy: NEAR-duplicate train/eval decontamination —
    * [[decontaminate]]'s exact 8-gram test misses an eval document that
    * was lightly edited before landing in the training corpus
    * (paraphrase, shuffled sentences, small insertions). This pass
    * flags training documents whose MinHash-estimated Jaccard with any
    * eval document is ≥ [[FuzzyContamMin]] — the fuzzy overlap rule
    * production decontamination runs alongside the exact one.
    *
    * Machinery is deliberately the [[Dedup.minhashLsh]] scaffold
    * (16-perm signatures over [[DecontamN]]-gram shingle hashes, 4×4
    * LSH bands) with one change: candidates come from a train-band ⋈
    * eval-band join instead of a self-join.
    *
    * Scale: the eval side is benchmark-sized, so its band relation AND
    * its signature relation are broadcast — the corpus side never
    * shuffles for candidate generation; the only corpus-keyed shuffle
    * is the distinct on narrow (doc_id, eval_doc) candidate rows,
    * bounded by band-collision volume exactly like the LSH self-join.
    */
  def decontaminateFuzzy(spark: SparkSession, sfDir: String): DataFrame = {
    // signatures derive from the memoized gram relation (one tokenize +
    // hash pass per snapshot); the signature fold itself stays per-call
    // behind a self-releasing boundary (referenced by bands AND evalSigs)
    val sigs = decontamGrams(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.SketchFunctions
          .minhashSignature(col("hs"), Dedup.MinhashAB, Dedup.P).as("sig"),
        col("is_eval"))
      .mat
    val bands = Dedup.bandRows(sigs, keep = Seq("is_eval"))
    val evalBands = bands.filter(col("is_eval"))
      .select(col("doc_id").as("eval_doc"), col("band"), col("bh"))
    val evalSigs = sigs.filter(col("is_eval"))
      .select(col("doc_id").as("eval_doc"), col("sig").as("sig_e"))
    // narrow candidate ids first, signatures re-joined after the
    // distinct (the minhashLsh discipline: 16-long arrays never
    // shuffle per band)
    val cand = bands.filter(!col("is_eval"))
      .join(broadcast(evalBands), Seq("band", "bh"))
      .select(col("doc_id"), col("eval_doc"))
      .distinct()
    val hits = cand
      .join(sigs.select(col("doc_id"), col("sig")), "doc_id")
      .join(broadcast(evalSigs), "eval_doc")
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig"), col("sig_e"), (x, y) => x === y), b => b))
          .cast("double") / lit(16.0), 6))
      .filter(col("est_jaccard") >= FuzzyContamMin)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_matches"), max(col("est_jaccard")).as("max_est_jaccard"))
    // the training-doc universe comes from the CACHED sigs relation,
    // not a second documents scan (the tag expression would otherwise
    // re-run trim/lower/md5 over the whole corpus just to list ids)
    sigs.select(col("doc_id"), col("is_eval")).filter(!col("is_eval"))
      .drop("is_eval")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"),
        coalesce(col("max_est_jaccard"), lit(0.0)).as("max_est_jaccard"),
        when(coalesce(col("n_eval_matches"), lit(0L)) > 0, 1).otherwise(0).as("contaminated"))
  }

  val decontaminateFuzzySql: String =
    s"""
    WITH shdoc AS (${Dedup.shingleHashesSql(DecontamN)}),
    tag AS ($evalTagSql),
    sigs AS (SELECT doc_id, ${Dedup.sigSqlExpr} AS sig FROM shdoc),
    bands AS (
      SELECT s.doc_id, t.is_eval, s.sig, b.band,
             md5(array_to_string(sig[4 * b.band + 1 : 4 * b.band + 4], ',')) AS bh
      FROM sigs s JOIN tag t USING (doc_id)
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS eval_doc
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE NOT a.is_eval AND b.is_eval
    ),
    sc AS (
      SELECT c.doc_id, c.eval_doc,
             round(CAST(len([i for i in generate_series(1, 16)
                             if sa.sig[i] = sb.sig[i]]) AS DOUBLE) / 16.0, 6) AS est_jaccard
      FROM cand c JOIN sigs sa ON c.doc_id = sa.doc_id
      JOIN sigs sb ON c.eval_doc = sb.doc_id
    ),
    hits AS (
      SELECT doc_id, count(*) AS n_eval_matches, max(est_jaccard) AS max_est_jaccard
      FROM sc WHERE est_jaccard >= $FuzzyContamMin GROUP BY 1
    )
    SELECT t.doc_id, coalesce(n_eval_matches, 0) AS n_eval_matches,
           coalesce(max_est_jaccard, 0.0) AS max_est_jaccard,
           CASE WHEN coalesce(n_eval_matches, 0) > 0 THEN 1 ELSE 0 END AS contaminated
    FROM tag t LEFT JOIN hits ON t.doc_id = hits.doc_id
    WHERE NOT t.is_eval"""

  // ---- q_eval_overlap_report -----------------------------------------

  /** q_eval_overlap_report: the REVERSE direction of decontamination —
    * per EVAL document, how much of it already leaked into the training
    * side. [[decontaminate]] answers "which training docs must go";
    * this answers "which benchmarks are compromised": an eval document
    * whose 8-grams are widely present in training data no longer
    * measures generalization no matter how the training side is
    * cleaned, and the benchmark owner needs the list. Reports, per eval
    * doc, its distinct-gram count, how many of those grams appear in
    * ANY training document, how many distinct training documents hit
    * it, and the compromised fraction.
    *
    * Scale: the eval gram relation is benchmark-sized → broadcast; the
    * training side streams through the semi-match without shuffling
    * wider than the hit rows, which aggregate on the tiny eval_doc key
    * space. The two count-distincts expand the hit relation 2× — hit
    * rows only, never the corpus.
    */
  def evalOverlapReport(spark: SparkSession, sfDir: String): DataFrame = {
    // referenced three times (eval sizes, eval gram broadcast, training
    // grams) — the per-dataset memoized gram relation serves all three
    val sh = decontamGrams(spark, sfDir)
    val g = sh.select(col("doc_id"), col("is_eval"), explode(col("hs")).as("h"))
    val evalSizes = sh.filter(col("is_eval"))
      .select(col("doc_id").as("eval_doc"), size(col("hs")).cast("long").as("n_grams"))
    val evalG = g.filter(col("is_eval")).select(col("doc_id").as("eval_doc"), col("h"))
    val hit = g.filter(!col("is_eval"))
      .join(broadcast(evalG), Seq("h"))
      .groupBy(col("eval_doc"))
      .agg(countDistinct(col("doc_id")).as("n_train_docs"),
        countDistinct(col("h")).as("n_grams_hit"))
    evalSizes.join(hit, Seq("eval_doc"), "left")
      .select(col("eval_doc"), col("n_grams"),
        coalesce(col("n_grams_hit"), lit(0L)).as("n_grams_hit"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        round(coalesce(col("n_grams_hit"), lit(0L)).cast("double") /
          col("n_grams").cast("double"), 6).as("compromised_frac"))
  }

  val evalOverlapReportSql: String =
    s"""
    WITH shdoc AS (${Dedup.shingleHashesSql(DecontamN)}),
    tag AS ($evalTagSql),
    g AS (
      SELECT s.doc_id, t.is_eval, unnest(hs) AS h
      FROM shdoc s JOIN tag t ON s.doc_id = t.doc_id
    ),
    es AS (
      SELECT s.doc_id AS eval_doc, CAST(len(hs) AS BIGINT) AS n_grams
      FROM shdoc s JOIN tag t ON s.doc_id = t.doc_id WHERE t.is_eval
    ),
    eg AS (SELECT doc_id AS eval_doc, h FROM g WHERE is_eval),
    hit AS (
      SELECT eg.eval_doc,
             count(DISTINCT g.doc_id) AS n_train_docs,
             count(DISTINCT g.h) AS n_grams_hit
      FROM g JOIN eg ON g.h = eg.h
      WHERE NOT g.is_eval
      GROUP BY 1
    )
    SELECT es.eval_doc, es.n_grams,
           coalesce(n_grams_hit, 0) AS n_grams_hit,
           coalesce(n_train_docs, 0) AS n_train_docs,
           round(CAST(coalesce(n_grams_hit, 0) AS DOUBLE)
                 / CAST(n_grams AS DOUBLE), 6) AS compromised_frac
    FROM es LEFT JOIN hit ON es.eval_doc = hit.eval_doc"""

  // ---- q_domain_mix --------------------------------------------------

  /** Max corpus share any one source may hold, in per-mille of total
    * tokens. 100‰ = the "no domain above 10%" balancing rule common in
    * pretraining-mixture construction.
    */
  val DomainCapPerMille = 100

  /** Domain balancing with DATA-DERIVED rates (vs [[sampleMix]]'s
    * static mixture): measure each source's token share of the corpus
    * and emit the down-sampling rate that caps every source at
    * [[DomainCapPerMille]] of the total. All rate arithmetic is integer
    * (ratio in per-mille via `div`), so the output is engine-exact; the
    * one double column (`token_share`) is a single IEEE division.
    *
    * Scale: one hash aggregation (map-side partials) down to one row
    * per source, then a single-row broadcast attach of the corpus
    * total — the fact table is read once and never shuffled wider than
    * (source, counts).
    */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val perSrc = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val total = perSrc.agg(sum(col("n_tokens")).as("total_tokens"))
    perSrc.crossJoin(broadcast(total))
      .withColumn("token_share",
        col("n_tokens").cast("double") / col("total_tokens"))
      .withColumn("keep_pm",
        least(lit(1000L), expr(s"($DomainCapPerMille * total_tokens) div n_tokens")))
      .withColumn("kept_tokens_cap", expr("(n_tokens * keep_pm) div 1000"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("token_share"), col("keep_pm"), col("kept_tokens_cap"))
  }

  val domainMixSql: String =
    s"""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM s)
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
           least(1000, ($DomainCapPerMille * total_tokens) // n_tokens) AS keep_pm,
           (n_tokens * least(1000, ($DomainCapPerMille * total_tokens) // n_tokens)) // 1000
             AS kept_tokens_cap
    FROM s, t"""

  // ---- q_split -------------------------------------------------------

  /** Train/val/test percentages (98/1/1). */
  val SplitPct: Seq[(String, Int, Int)] = Seq(("train", 0, 98), ("val", 98, 99), ("test", 99, 100))

  /** Deterministic corpus split: every document lands in train/val/test
    * by an md5-derived hash residue — reproducible across runs, engines,
    * and cluster sizes, and STABLE under corpus growth (a doc's split
    * never changes when other docs arrive, unlike randomSplit). Emits
    * the per-(source, split) doc/token counts a dataset card reports.
    *
    * Scale: one narrow hash projection + one (source, split) hash
    * aggregation with map-side partials.
    */
  /** Split name for a 0..99 hash residue (shared by every split
    * flavor: doc-id-keyed, group-keyed, curate's gate).
    */
  def splitOfBucket(bucket: Column): Column =
    SplitPct.foldRight(lit(null: String)) { case ((name, lo, hi), acc) =>
      when(bucket >= lo && bucket < hi, lit(name)).otherwise(acc)
    }

  /** The split a document belongs to — a pure function of doc_id. */
  def splitAssign(docId: Column): Column =
    splitOfBucket(Dedup.h32(concat(lit("split|"), docId.cast("string"))) % 100)

  def hashSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs
      .select(col("source"), splitAssign(col("doc_id")).as("split"),
        size(org.apache.spark.sql.functions.split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  val splitSql: String = {
    val cases = SplitPct.map { case (n, lo, hi) =>
      s"WHEN b >= $lo AND b < $hi THEN '$n'" }.mkString(" ")
    s"""
    WITH g AS (
      SELECT source,
             CASE $cases END AS split,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM (SELECT source, text,
              ${Dedup.h32Sql.format("'split|' || doc_id")} % 100 AS b
            FROM documents)
    )
    SELECT source, split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM g GROUP BY 1, 2"""
  }

  // ---- q_split_balance -----------------------------------------------

  /** q_split_balance: does the hash split preserve the source mixture?
    * The QA a data owner runs before trusting val/test numbers — a
    * split whose val slice over-represents one source evaluates a
    * different distribution than it trains on. Per split: document
    * count, the largest per-source share deviation vs the corpus, and
    * the total-variation distance of the source mixture — ALL in
    * integer parts-per-million (shares via `1e6·n div d`), so every
    * aggregate is an exact integer max/sum — no float summation order
    * to disagree on, in either engine.
    *
    * A source absent from a split still contributes its full corpus
    * share to the deviation (the grid is completed before the
    * aggregation) — the case a naive join-on-counts silently drops.
    *
    * Scale: two hash aggregations on (split, source) / (source) keys,
    * then arithmetic over the #splits×#sources grid — the corpus is
    * scanned once; everything after the first groupBy is dimension-
    * table sized.
    */
  def splitBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = Tables.documents(spark, sfDir)
      .select(col("source"), splitAssign(col("doc_id")).as("split"))
      .groupBy(col("split"), col("source")).agg(count(lit(1)).as("n_ds"))
      .mat // feeds the per-split, per-source, and total branches
    val bySplit = ss.groupBy(col("split")).agg(sum(col("n_ds")).as("n_split"))
    val bySource = ss.groupBy(col("source")).agg(sum(col("n_ds")).as("n_source"))
    val total = ss.agg(sum(col("n_ds")).as("n_total"))
    val grid = bySource
      .select(col("source"), col("n_source"),
        explode(array(SplitPct.map { case (n, _, _) => lit(n) }: _*)).as("split"))
      .join(ss.select(col("split"), col("source"), col("n_ds")), Seq("split", "source"), "left")
      .na.fill(0L, Seq("n_ds"))
      .join(broadcast(bySplit), Seq("split"), "left")
      .na.fill(0L, Seq("n_split"))
      .crossJoin(broadcast(total))
    grid
      .withColumn("dev_ppm", abs(
        expr("coalesce((1000000 * n_ds) div nullif(n_split, 0), CAST(0 AS BIGINT))") -
          expr("(1000000 * n_source) div n_total")))
      .groupBy(col("split"), col("n_split"))
      .agg(count(lit(1)).as("n_sources"),
        max(col("dev_ppm")).as("max_dev_ppm"),
        expr("sum(dev_ppm) div 2").as("tv_ppm"))
      .select(col("split"), col("n_split").as("n_docs"), col("n_sources"),
        col("max_dev_ppm"), col("tv_ppm"))
  }

  val splitBalanceSql: String = {
    val cases = SplitPct.map { case (n, lo, hi) =>
      s"WHEN b >= $lo AND b < $hi THEN '$n'" }.mkString(" ")
    val vals = SplitPct.map { case (n, _, _) => s"('$n')" }.mkString(", ")
    s"""
    WITH a AS (
      SELECT source, CASE $cases END AS split
      FROM (SELECT source, ${Dedup.h32Sql.format("'split|' || doc_id")} % 100 AS b
            FROM documents)
    ),
    ss AS (SELECT split, source, CAST(count(*) AS BIGINT) AS n_ds FROM a GROUP BY 1, 2),
    sp AS (SELECT split, CAST(sum(n_ds) AS BIGINT) AS n_split FROM ss GROUP BY 1),
    so AS (SELECT source, CAST(sum(n_ds) AS BIGINT) AS n_source FROM ss GROUP BY 1),
    t AS (SELECT CAST(sum(n_ds) AS BIGINT) AS n_total FROM ss),
    grid AS (
      SELECT v.split, so.source, so.n_source, coalesce(ss.n_ds, 0) AS n_ds
      FROM so CROSS JOIN (VALUES $vals) AS v(split)
      LEFT JOIN ss ON ss.split = v.split AND ss.source = so.source
    ),
    d AS (
      SELECT g.split, coalesce(sp.n_split, 0) AS n_split,
             abs(coalesce((1000000 * g.n_ds) // nullif(sp.n_split, 0), 0)
                 - (1000000 * g.n_source) // t.n_total) AS dev_ppm
      FROM grid g LEFT JOIN sp ON g.split = sp.split CROSS JOIN t
    )
    SELECT split, n_split AS n_docs, count(*) AS n_sources,
           CAST(max(dev_ppm) AS BIGINT) AS max_dev_ppm,
           CAST(sum(dev_ppm) // 2 AS BIGINT) AS tv_ppm
    FROM d GROUP BY 1, 2"""
  }

  // ---- q_split_leakage -----------------------------------------------

  /** q_split_leakage: dedup-aware train/val/test assignment — the split
    * is a pure function of the document's NORMALIZED-TEXT hash (the
    * same key as q_dedup_normalized), so every copy of a duplicated
    * document lands in the same split by construction. This is the
    * leakage guarantee an eval pipeline needs: a doc-id-hashed split
    * ([[hashSplit]]) can put two byte-identical documents on opposite
    * sides of the train/test boundary and silently inflate eval scores;
    * a group-keyed split cannot. Emits the per-doc assignment with its
    * dup group (min doc_id of the group) and copy count, so downstream
    * both dedups and splits off one relation.
    *
    * Scale: one narrow hash projection, then ONE shuffle on the
    * normalized hash (a partitioned window computing the group min /
    * count) — the same single-exchange shape as q_dedup_normalized;
    * the split CASE is a codegen'd residue test. Stability: a doc's
    * split never changes when unrelated docs arrive, and adding a COPY
    * of an existing doc cannot move the group (the group hash, not
    * membership, decides).
    */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val g = Dedup.normTextMd5(col("text"))
    val w = Window.partitionBy(col("g"))
    val bucket = Dedup.h32(concat(lit("gsplit|"), col("g"))) % 100
    docs
      .select(col("doc_id"), g.as("g"))
      .select(col("doc_id"), col("g"),
        min(col("doc_id")).over(w).as("dup_group"),
        count(lit(1)).over(w).as("n_copies"))
      .withColumn("b", bucket)
      .select(col("doc_id"), col("dup_group"), col("n_copies"),
        splitOfBucket(col("b")).as("split"))
  }

  val splitLeakageSql: String = {
    val cases = SplitPct.map { case (n, lo, hi) =>
      s"WHEN b >= $lo AND b < $hi THEN '$n'" }.mkString(" ")
    s"""
    WITH n AS (
      SELECT doc_id,
             ${Dedup.normTextMd5Sql.format("text")} AS g
      FROM documents
    ),
    grp AS (
      SELECT doc_id, g,
             min(doc_id) OVER (PARTITION BY g) AS dup_group,
             count(*) OVER (PARTITION BY g) AS n_copies
      FROM n
    )
    SELECT doc_id, dup_group, n_copies,
           CASE $cases END AS split
    FROM (SELECT *, ${Dedup.h32Sql.format("'gsplit|' || g")} % 100 AS b FROM grp)"""
  }

  // ---- q_stratified_sample -------------------------------------------

  /** Docs kept per stratum (source). */
  val StratumK = 16

  /** Salt fan-out for the partial bottom-k phase. */
  val StratumSalt = 32

  /** q_stratified_sample: exactly [[StratumK]] documents per source,
    * chosen as the bottom-k by md5 hash — a deterministic uniform
    * sample per stratum (eval sets, human-review batches, per-source
    * debugging slices) that is reproducible across runs, engines, and
    * cluster sizes, and STABLE under corpus growth: a doc leaves the
    * sample only when a smaller-hash doc arrives, so consecutive
    * pipeline runs re-review only the churn (a random `ORDER BY rand()
    * LIMIT k` resamples everything every run).
    *
    * Scale: bottom-k is computed in two phases — a partial rank per
    * (source, hash-salt) bucket bounds every sort partition to its
    * salt's share, then the global rank per source runs over ≤ k·salt
    * survivors. A hot stratum never funnels its full row set through
    * one task (same discipline as q_kmv_distinct / grouped top-k).
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val hv = Dedup.h60(concat(lit("strat|"), col("doc_id").cast("string")))
    val base = docs.select(col("source"), col("doc_id"), hv.as("hv"))
    val partial = base
      .withColumn("salt", pmod(col("hv"), lit(StratumSalt.toLong)))
      .withColumn("rn1", row_number().over(
        Window.partitionBy(col("source"), col("salt")).orderBy(col("hv"), col("doc_id"))))
      .filter(col("rn1") <= StratumK)
    partial
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))).cast("long"))
      .filter(col("rn") <= StratumK)
      .select(col("source"), col("rn"), col("doc_id"), col("hv"))
  }

  val stratifiedSampleSql: String =
    s"""
    WITH h AS (
      SELECT source, doc_id,
             ${Dedup.h60Sql.format("'strat|' || doc_id")} AS hv
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, hv,
             row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
      FROM h
    )
    SELECT source, rn, doc_id, hv FROM r WHERE rn <= $StratumK"""

  // ---- q_mix_weights -------------------------------------------------

  /** Token budget the mixture draws against (1M at gate scale; the
    * arithmetic is the same at a 15T-token production budget).
    */
  val MixBudgetTokens = 1000000L

  /** Temperature-scaled language mixture: sampling weight per language
    * proportional to `n_tokens^alpha` with `alpha = 0.5` — the
    * low-resource up-weighting used for multilingual pretraining
    * corpora (mC4/XLM-R style: raw proportions starve small languages;
    * a sub-linear exponent flattens the mixture).
    *
    * `alpha = 0.5` is deliberately the square root: IEEE-754 `sqrt` is
    * correctly rounded in both engines (an arbitrary `pow(x, 0.3)` is
    * not), and we take `floor(sqrt(n))` into INTEGER weight arithmetic
    * (per-mille via integer div), so every output is engine-exact.
    * The only double columns are single divisions.
    *
    * Scale: one hash aggregation to one row per language (map-side
    * partials), then a single-row broadcast attach of the totals — the
    * corpus is read once and never shuffled wider than (lang, counts).
    */
  def mixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val perLang = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("isqrt_tokens", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val totals = perLang.agg(
      sum(col("n_tokens")).as("total_tokens"),
      sum(col("isqrt_tokens")).as("total_isqrt"))
    perLang.crossJoin(broadcast(totals))
      .select(
        col("lang"),
        col("n_docs"),
        col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tokens"), 6).as("token_share"),
        col("isqrt_tokens"),
        expr("(1000000 * isqrt_tokens) div total_isqrt").as("weight_ppm"),
        expr(s"($MixBudgetTokens * isqrt_tokens) div total_isqrt").as("drawn_tokens"),
        round(expr(s"($MixBudgetTokens * isqrt_tokens) div total_isqrt").cast("double")
          / col("n_tokens"), 6).as("eff_epochs"),
      )
  }

  val mixWeightsSql: String =
    s"""
    WITH s AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT lang, n_docs, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS isqrt_tokens
      FROM s
    ),
    t AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(isqrt_tokens) AS BIGINT) AS total_isqrt
      FROM w
    )
    SELECT lang, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS token_share,
           isqrt_tokens,
           (1000000 * isqrt_tokens) // total_isqrt AS weight_ppm,
           ($MixBudgetTokens * isqrt_tokens) // total_isqrt AS drawn_tokens,
           round(CAST(($MixBudgetTokens * isqrt_tokens) // total_isqrt AS DOUBLE)
                 / n_tokens, 6) AS eff_epochs
    FROM w, t"""

  // ---- q_epoch_plan --------------------------------------------------

  /** Repetition cap: tokens from one source may be consumed at most
    * this many epochs (data-constrained scaling keeps repeated data
    * near-fresh for only a few passes — Muennighoff et al. 2023).
    */
  val MaxEpochs = 4L

  /** Planner token budget as a multiple of the corpus total — a
    * budget larger than the corpus forces repetition, which is the
    * regime the planner exists for.
    */
  val EpochBudgetMult = 3L

  /** q_epoch_plan: data-constrained epoch allocation — the step AFTER
    * `q_mix_weights` decides target proportions: distribute a token
    * budget over sources by √-temperature weight, but cap every source
    * at [[MaxEpochs]] passes of its own tokens and WATER-FILL the
    * surplus into the uncapped sources (a capped source's unused demand
    * raises everyone else's allocation, the way a real pretraining mix
    * is balanced when a small high-weight source runs out of data).
    *
    * Closed-form water-filling, no iteration: sources cap in increasing
    * order of cap/weight, so ONE sort + prefix-sum window decides the
    * capped set — source i caps iff every j ≤ i (in that order) passes
    * the level test capⱼ·W_remⱼ ≤ wⱼ·B_remⱼ, with W_rem/B_rem the
    * weight/budget left after the prefix caps. All tests are integer
    * cross-multiplications (exact; stays under 2⁶³ up to ~10¹²-token
    * corpora — past that, lift the products to DECIMAL(38,0)), so the
    * plan is bit-identical cross-engine. The windows run unpartitioned
    * over the per-source aggregate — a #sources-row relation, so the
    * single-partition sort is free at any corpus scale.
    */
  def epochPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the #sources-row aggregate feeds several plan branches (totals,
    // the capped-sums aggregate, and the output projection) — persist
    // it so the corpus scan + groupBy runs ONCE, not once per branch
    // (self-releasing boundary — graft.core.Mat)
    val per = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("weight", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("cap_tokens", lit(MaxEpochs) * col("n_tokens"))
      .mat
    val totals = per.agg(sum(col("n_tokens")).as("total_tokens"),
      sum(col("weight")).as("total_w"))
    val ord = Window.orderBy(col("r").asc, col("source").asc)
    val flagged = per.crossJoin(broadcast(totals))
      .withColumn("budget", lit(EpochBudgetMult) * col("total_tokens"))
      // IEEE division is correctly rounded, so the sort key is the same
      // bits in every engine; ties fall back to the source name
      .withColumn("r", col("cap_tokens").cast("double") / col("weight").cast("double"))
      .withColumn("cap_before", coalesce(
        sum(col("cap_tokens")).over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("w_before", coalesce(
        sum(col("weight")).over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("flag",
        when(col("cap_tokens") * (col("total_w") - col("w_before")) <=
          col("weight") * (col("budget") - col("cap_before")), lit(1L)).otherwise(lit(0L)))
      .withColumn("capped",
        min(col("flag")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    val spent = flagged.agg(
      sum(when(col("capped") === 1, col("cap_tokens")).otherwise(lit(0L))).as("cap_spent"),
      sum(when(col("capped") === 1, col("weight")).otherwise(lit(0L))).as("w_capped"))
    flagged.crossJoin(broadcast(spent))
      .withColumn("planned_tokens",
        when(col("capped") === 1, col("cap_tokens"))
          .otherwise(expr("((budget - cap_spent) * weight) div nullif(total_w - w_capped, 0)")))
      .select(col("source"), col("n_tokens"), col("weight"), col("cap_tokens"),
        (col("capped") === 1).as("is_capped"),
        col("planned_tokens"),
        round(col("planned_tokens").cast("double") / col("n_tokens").cast("double"), 6)
          .as("epochs"))
  }

  val epochPlanSql: String =
    s"""
    WITH s AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight,
             $MaxEpochs * n_tokens AS cap_tokens
      FROM s
    ),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(sum(weight) AS BIGINT) AS total_w FROM w),
    b AS (
      SELECT w.*, t.total_w, $EpochBudgetMult * t.total_tokens AS budget,
             CAST(cap_tokens AS DOUBLE) / CAST(weight AS DOUBLE) AS r
      FROM w CROSS JOIN t
    ),
    f AS (
      SELECT *,
             CAST(coalesce(sum(cap_tokens) OVER pre, 0) AS BIGINT) AS cap_before,
             CAST(coalesce(sum(weight) OVER pre, 0) AS BIGINT) AS w_before
      FROM b
      WINDOW pre AS (ORDER BY r, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    g AS (
      SELECT *, CASE WHEN cap_tokens * (total_w - w_before)
                       <= weight * (budget - cap_before) THEN 1 ELSE 0 END AS flag
      FROM f
    ),
    h AS (
      SELECT *, min(flag) OVER
        (ORDER BY r, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped
      FROM g
    ),
    sp AS (
      SELECT CAST(sum(CASE WHEN capped = 1 THEN cap_tokens ELSE 0 END) AS BIGINT) AS cap_spent,
             CAST(sum(CASE WHEN capped = 1 THEN weight ELSE 0 END) AS BIGINT) AS w_capped
      FROM h
    ),
    p AS (
      SELECT h.*, CASE WHEN capped = 1 THEN cap_tokens
                       ELSE CAST(((budget - cap_spent) * weight)
                                 // nullif(total_w - w_capped, 0) AS BIGINT) END
                    AS planned_tokens
      FROM h CROSS JOIN sp
    )
    SELECT source, n_tokens, weight, cap_tokens, capped = 1 AS is_capped,
           planned_tokens,
           round(CAST(planned_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS epochs
    FROM p"""
}
