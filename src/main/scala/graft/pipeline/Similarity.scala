package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.core.Mat.MatOps

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, 64-dim):
  * brute-force cosine top-k as the exact baseline and a sign-bucket LSH
  * variant as the scale path.
  *
  * Scale design: brute force is O(queries x corpus) — correct but only
  * viable for small query sets; the LSH variant buckets vectors by a
  * 32-bit structured-sign code so candidate generation is an equi join
  * on short band keys (at 100 TB: shuffle on short keys, candidates
  * bounded per bucket; refine with exact cosine inside buckets — same
  * candidates-then-verify shape as MinHash dedup).
  *
  * Cosine arithmetic: elements are cast float->double (exact), products
  * summed by a sequential left fold in both engines, single final
  * division — bit-identical cross-engine, then rounded to 6.
  */
object Similarity {

  /** Dot product: native codegen'd Catalyst expression (tight loop, no
    * per-element lambda); summation order matches a left fold so results
    * are bit-identical to the oracle's list_reduce.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** DuckDB mirror of [[dot]]: products list then left fold. */
  def dotSql(a: String, b: String, dim: Int = 64): String =
    s"list_reduce([CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in generate_series(1, $dim)], (x, y) -> x + y)"

  def cosineSql(a: String, b: String, dim: Int = 64): String =
    s"(${dotSql(a, b, dim)} / sqrt(${dotSql(a, a, dim)} * ${dotSql(b, b, dim)}))"

  // ---- q_ann_topk ----------------------------------------------------

  /** Query-side cap for the brute-force baseline: probes are the every-
    * 100th vectors with vec_id below this, so the registered query is
    * O(cap · n) — a bounded scan-and-rank, never O(n²) — at ANY corpus
    * size. The uncapped all-pairs form survives only inside
    * SimilarityRecallSpec as the recall cross-check.
    */
  val TopkQueryCap = 10000L

  /** Brute-force cosine top-k: every 100th vector with
    * vec_id < [[TopkQueryCap]] is a query (≤ 100 probes regardless of
    * corpus size); top 5 neighbors by (rounded cosine desc, vec_id asc).
    * This is the declared exact baseline that anchors LSH/IVF recall.
    */
  /** Memoized-materialization helper shared by the similarity lanes:
    * one eager checkpoint per (application, dataset), EXCEPT inside
    * [[graft.core.Mat.withTransparent]] — the plan-inspection seam must
    * see the full operator tree, and a transparently-built plan must
    * never be cached where a later production call would read it
    * un-materialized.
    */
  private def memoized(memo: graft.core.Memo, spark: SparkSession, sfDir: String)(
      build: => DataFrame): DataFrame =
    if (graft.core.Mat.isTransparent) build
    else memo.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}|$sfDir",
      build.localCheckpoint(eager = true))

  def annTopk(spark: SparkSession, sfDir: String): DataFrame =
    memoized(annTopkMemo, spark, sfDir)(annTopkBuild(spark, sfDir))

  // the exact-truth leg is read by q_ann_topk, three recall evals, AND
  // the probe-width calibration's ladder walk — one O(probes · n) scan
  // per corpus snapshot, not one per consumer (the memo convention;
  // the tiny probes×k result is what checkpoints). maxEntries = 2: the
  // shingle-memo eviction rationale — an evicted localCheckpoint
  // cannot rebuild, so the pairwise cross-corpus pattern must fit.
  private val annTopkMemo = new graft.core.Memo("ann_topk_truth", maxEntries = 2)

  private def annTopkBuild(spark: SparkSession, sfDir: String): DataFrame = {
    // norms are precomputed per vector BEFORE the pairwise join — at
    // scale this halves the per-pair flops and keeps the join payload
    // narrow; the arithmetic (sqrt of the norm product) is unchanged.
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), dot(col("embedding"), col("embedding")).as("nsq"))
    val queries = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < TopkQueryCap)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nsq").as("q_nsq"))
    val scored = queries.crossJoin(emb.select(col("vec_id"), col("embedding"), col("nsq")))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        round(dot(col("q_emb"), col("embedding")) / sqrt(col("q_nsq") * col("nsq")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
  }

  val annTopkSql: String =
    s"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
               WHERE vec_id % 100 = 0 AND vec_id < $TopkQueryCap),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round(${cosineSql("q.q_emb", "e.embedding")}, 6) AS cos
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, rk, vec_id, cos FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored
    ) WHERE rk <= 5"""

  // ---- q_ann_lsh -----------------------------------------------------

  /** Structured-sign LSH code, 64 bits from the FOUR orthogonal
    * quarter-Hadamard contrast families over the vector's quarters
    * (a, b, c, d) = (v[j], v[j+16], v[j+32], v[j+48]) — deterministic
    * "hyperplanes" needing no stored random planes (and no
    * transcendentals, keeping both engines bit-identical). Stored as
    * two NON-NEGATIVE 32-bit halves (the `simhashes64` precedent,
    * Dedup.scala) so every downstream shift/mask/bit_count is
    * engine-portable — no arithmetic-shift or sign-overflow semantics
    * to pin:
    *   lo bit j    (0..15): sign of a - b + c - d   (Hadamard row +-+-)
    *   lo bit j+16 (0..15): sign of a + b - c - d   (Hadamard row ++--)
    *   hi bit j    (0..15): sign of a - b - c + d   (Hadamard row +--+)
    *   hi bit j+16 (0..15): sign of a + b + c + d   (Hadamard row ++++)
    * All 64 planes are mutually orthogonal (disjoint supports across
    * j; orthogonal Hadamard rows within a j). The lo half IS the
    * pre-round-15 32-bit code — width grew, no bit of the CODE moved.
    * (The BAND layout did move: stride-8 anchors draw half their bits
    * from each half, so floor-width candidates are statistically
    * equivalent to the old 8×4-nibble layout — recall re-measured
    * equal at 0.740/0.696 on sf0.1 — not bit-for-bit identical.)
    *
    * Sign-LSH recall depends on similarity (P(bit agrees) =
    * 1 - angle/pi); band width sets the selectivity and is chosen
    * per-corpus by [[signBandWidthOf]] — see the scaladoc there for
    * the width-grows-with-the-corpus policy that replaced the fixed
    * 4-bit nibbles (whose organic buckets held n/16 vectors, a
    * measured n²/32 candidate knee at 200 k vectors, SCALE.md r14).
    */
  val SignCodeBits = 64
  val Bands = 8

  /** Band b's first bit: bands anchor every 8 bits of the 64-bit code
    * and WIDEN in place as [[signBandWidthOf]] grows, so the band set
    * at width r+1 strictly refines the band set at width r (candidate
    * sets shrink monotonically with corpus growth, never jump).
    */
  val SignBandStride = 8

  /** The lo 32 bits (families +-+- and ++--) — the native
    * [[graft.functions.SignCodeHalf]] loop. The 32-term `when`-chain
    * Column form this replaces was a silent JIT cliff when composed
    * with the other half + NearestCenter in one projection (see the
    * expression's scaladoc); SignCodeParitySpec pins bit-parity.
    */
  def signCode(v: Column): Column =
    graft.functions.VectorFunctions.signCodeHalf(v, hiHalf = false)

  /** The hi 32 bits (families +--+ and ++++) — see [[signCode]]. */
  def signCodeHi(v: Column): Column =
    graft.functions.VectorFunctions.signCodeHalf(v, hiHalf = true)

  val signCodeSql: String =
    """CAST(list_sum([
         CASE WHEN CAST(v[(j % 16) + 1] AS DOUBLE)
                   + (CASE WHEN j < 16 THEN -1.0 ELSE 1.0 END) * CAST(v[(j % 16) + 17] AS DOUBLE)
                   + (CASE WHEN j < 16 THEN 1.0 ELSE -1.0 END) * CAST(v[(j % 16) + 33] AS DOUBLE)
                   - CAST(v[(j % 16) + 49] AS DOUBLE) > 0
              THEN (1::BIGINT << j) ELSE 0 END
         for j in generate_series(0, 31)]) AS BIGINT)"""

  val signCodeHiSql: String =
    """CAST(list_sum([
         CASE WHEN CAST(v[(j % 16) + 1] AS DOUBLE)
                   + (CASE WHEN j < 16 THEN -1.0 ELSE 1.0 END) * CAST(v[(j % 16) + 17] AS DOUBLE)
                   + (CASE WHEN j < 16 THEN -1.0 ELSE 1.0 END) * CAST(v[(j % 16) + 33] AS DOUBLE)
                   + CAST(v[(j % 16) + 49] AS DOUBLE) > 0
              THEN (1::BIGINT << j) ELSE 0 END
         for j in generate_series(0, 31)]) AS BIGINT)"""

  /** Expected organic bucket occupancy the band-width policy holds:
    * [[signBandWidthOf]] returns the smallest width r with
    * ceil(n / 2^r) <= this target.
    */
  val SignBucketTarget = 128L

  /** Width at the small end — the pre-round-15 selectivity (n/16 per
    * bucket at sf0.1), which is where the measured 0.74 top-5 recall
    * floor on organic geometry lives.
    */
  val SignBandWidthFloor = 4

  /** Width ceiling: 16-bit bands, the `simhash64Bands` geometry. */
  val SignBandWidthCeil = 16

  /** CODE WIDTH GROWS WITH THE CORPUS — the scale lever
    * `q_dedup_simhash64` proved for text, applied to the sign lane:
    * the band width r(n) is the smallest width keeping the EXPECTED
    * organic bucket at or under [[SignBucketTarget]] vectors, so the
    * per-band candidate volume stays ~ n·target/2 instead of the fixed
    * geometry's n²/2^r. At sf0.1 (n = 2,000) this is the floor width 4
    * (the pre-r15 selectivity; recall re-measured equal); at the measured
    * 200 k-vector knee it is 11 (organic buckets ~98, candidate volume
    * ~1.1×10⁸ — measured 100× down from the fixed-nibble 10¹⁰); at 2 M
    * it is 14. The recall price on LOW-cosine organic pairs is the
    * honest LSH tradeoff and is priced in SCALE.md (planted near-dup
    * cliques — the at-scale dup geometry, cos ≥ 0.85 — keep ≥ 0.74
    * pair recall at width 11; organic cos-0.3 tail recall decays by
    * design, with IVF/PQ as the shipped at-scale alternatives).
    * Integer ladder, no floating log — [[signWidthCteSql]] is the
    * oracle's EXACT mirror.
    */
  def signBandWidthOf(n: Long): Int = {
    var r = SignBandWidthFloor
    while (r < SignBandWidthCeil && n > (SignBucketTarget << r)) r += 1
    r
  }

  /** The embeddings row count, memoized per (application, dataset): a
    * deterministic scalar property of the snapshot (it sizes the band
    * width), and the per-call lanes ran the count job on every call.
    */
  private val embCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  private[pipeline] def embeddingsCount(spark: SparkSession, sfDir: String): Long =
    embCountMemo.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}|$sfDir",
      Tables.embeddings(spark, sfDir).count())

  /** Test seam beside [[resetSignBandStats]]. */
  private[pipeline] def resetEmbeddingsCount(): Unit = embCountMemo.clear()

  /** The band-stats memo key for the full-corpus banded relation at
    * width r — shared by the pair lane, the recall eval, and the
    * calibration report (all three band the identical relation).
    */
  private def signStatsKey(spark: SparkSession, sfDir: String, r: Int): String =
    s"${spark.sparkContext.applicationId}|$sfDir|$r"

  /** One-row CTE body computing the band width from the corpus count —
    * the DuckDB mirror of [[signBandWidthOf]] as an exact integer
    * CASE ladder (no float log2 at either engine).
    */
  val signWidthCteSql: String = {
    val ladder = (SignBandWidthFloor until SignBandWidthCeil)
      .map(r => s"WHEN c <= ${SignBucketTarget << r} THEN $r").mkString(" ")
    s"SELECT CASE $ladder ELSE $SignBandWidthCeil END AS r FROM (SELECT count(*) AS c FROM embeddings)"
  }

  /** Bit k (0..63) of the conceptual 64-bit code hi||lo, as a 0/1
    * column — shifts only ever touch the non-negative halves.
    */
  private def signBitAt(hi: Column, lo: Column, k: Int): Column =
    (if (k < 32) shiftright(lo, k) else shiftright(hi, k - 32)).bitwiseAND(lit(1L))

  /** Band b's value at width r: bits [8b, 8b+r) of hi||lo, wrapping
    * past bit 63 (band 7 at widths over 8).
    */
  private def signBandVal(hi: Column, lo: Column, b: Int, r: Int): Column =
    (0 until r).map { i =>
      signBitAt(hi, lo, (SignBandStride * b + i) % SignCodeBits) * lit(1L << i)
    }.reduce(_ + _)

  /** The 8-band explode of a (code_hi, code_lo) relation at width `r` —
    * ONE definition (the `phashBandRows` pattern) consumed by the LSH
    * index ([[annLsh]]), the cell-scoped dedup ([[semanticDedup]]), and
    * the index's recall eval ([[annLshRecall]]), so a drifting shift or
    * width can never silently desynchronize an index from its eval.
    * `keep` carries the caller's narrow payload columns through the
    * explode.
    */
  private[pipeline] def signBandRows(df: DataFrame, keep: Seq[String], r: Int): DataFrame =
    df.select(
      keep.map(col) :+
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            signBandVal(col("code_hi"), col("code_lo"), b, r).as("bv"))
        }: _*)).as("bd"): _*)
      .select(keep.map(col) :+ col("bd.band").as("band") :+ col("bd.bv").as("bv"): _*)

  /** DuckDB mirror of [[signBandVal]] — `band` is a column reference,
    * the width comes from the joined one-row `w` CTE
    * ([[signWidthCteSql]]); the series is fixed 0..15 with an `i < w.r`
    * gate so no engine needs a dynamic series bound.
    */
  private def signBandValSql(hi: String, lo: String, band: String): String =
    s"""list_sum([CASE WHEN i < w.r THEN
             ((CASE WHEN ($SignBandStride * $band + i) % $SignCodeBits < 32
                    THEN ($lo >> (($SignBandStride * $band + i) % $SignCodeBits))
                    ELSE ($hi >> (($SignBandStride * $band + i) % $SignCodeBits - 32)) END) % 2)
             * (1::BIGINT << i) ELSE 0 END
           for i in generate_series(0, 15)])"""

  /** Max vectors per (band, bv) bucket — the same stop-loss semantics
    * as `Simhash64BucketCap`: with width-scaled bands the ORGANIC
    * bucket is ~[[SignBucketTarget]] and a planted near-dup clique is
    * output-sized, so this guard is ~never binding on real geometry;
    * it exists so a degenerate corpus (e.g. all-zero vectors sharing
    * code 0) drops its pathological buckets instead of going
    * quadratic. Hot buckets drop via broadcast ANTI join on both
    * engines.
    */
  val SignBucketCap = 4096L

  /** Fail-fast ceiling on the PAIR lane's post-cap candidate volume —
    * ~36x the measured 1.1×10⁸ at the 200 k-vector decade, far under
    * the ~10¹⁰ that broke the 900 s budget pre-redesign. The width
    * policy + bucket cap make exceeding this ~impossible on real
    * geometry; the guard turns "someone mis-tuned a cap and the join
    * hangs for 15 minutes" into an immediate named
    * [[graft.core.PairVolumeExceeded]] abort.
    */
  val SignPairVolumeBudget = 4000000000L

  /** The band rows of the PAIR lane after the hot-bucket stop-loss —
    * materialized, because the caller's self-join reads it from both
    * sides and the hot aggregate must run once, not per side. The rows
    * are narrow (id, band, bv): ~24 bytes x n x [[Bands]].
    *
    * The bucket histogram the stop-loss already computes also prices
    * the join BEFORE it runs: post-drop pair volume (sum of C(count, 2)
    * over the buckets the anti-join KEEPS — hot buckets are dropped
    * whole, so they price at zero) over `budget` is the named
    * [[graft.core.PairVolumeExceeded]] abort, not a hung join.
    */
  private[pipeline] def signKeptBands(banded: DataFrame,
      lane: String, budget: Long = SignPairVolumeBudget,
      statsKey: Option[String] = None): DataFrame = {
    // the histogram readout (volume + hot set) is a deterministic
    // property of the banded corpus snapshot: with `statsKey` it is
    // memoized per (application, dataset, width) so the per-call lanes
    // (the recall eval ran it as a driver-synchronous job on EVERY
    // call) pay it once; each lane still applies its OWN budget to the
    // memoized volume, so PairVolumeExceeded semantics are unchanged
    val (vol, hotCount, hot) = statsKey match {
      case Some(k) => signBandStatsMemo.synchronized {
        signBandStatsMemo.getOrElseUpdate(k,
          graft.core.Memo.timed("sign_band_stats", k)(signBandStats(banded)))
      }
      case None => signBandStats(banded)
    }
    if (vol > budget) throw new graft.core.PairVolumeExceeded(lane, vol, budget)
    if (hotCount == 0L) banded // nothing to drop: skip the join entirely
    else banded.join(broadcast(hot), Seq("band", "bv"), "left_anti")
  }

  // (pair volume, hot-bucket count, checkpointed hot keys) per banded
  // corpus — tiny by construction (≤ rows/cap keys, usually empty)
  private val signBandStatsMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long, DataFrame)]

  /** Test seam (the resetSignPairs contract). */
  private[pipeline] def resetSignBandStats(): Unit =
    signBandStatsMemo.synchronized(signBandStatsMemo.clear())

  private def signBandStats(banded: DataFrame): (Long, Long, DataFrame) = {
    // NOT materialized: the common (all-thin) path reads this once for
    // the volume/hot aggregate below and never again; only the rare
    // hot path re-derives it for the drop keys
    val counts = banded.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("c"))
    // buckets over the cap are DROPPED by the anti-join, not truncated
    // to the cap — they contribute zero pairs to the join that actually
    // runs, so they must contribute zero to its price (a C(cap,2) term
    // per hot bucket would add ~8.4M phantom pairs each and could
    // abort a corpus whose join is actually cheap)
    val kept = when(col("c") > SignBucketCap, lit(0L)).otherwise(col("c"))
    // shiftright keeps the arithmetic in LONG space (`/` would promote
    // to double and lose exactness past 2^53 pairs); the same pass
    // counts the hot buckets, so the common all-thin case learns it
    // needs NO anti-join from the one aggregate it already ran
    val volRow = counts.agg(
      sum(shiftright(kept * (kept - lit(1L)), 1)),
      sum(when(col("c") > SignBucketCap, 1L).otherwise(0L))).head()
    val vol = if (volRow.isNullAt(0)) 0L else volRow.getLong(0)
    val hotCount = if (volRow.isNullAt(1)) 0L else volRow.getLong(1)
    val hot =
      if (hotCount == 0L) null
      else counts.filter(col("c") > SignBucketCap)
        .select(col("band"), col("bv")).localCheckpoint(true)
    (vol, hotCount, hot)
  }

  /** LSH-bucketed similar pairs: the 64-bit sign code is split into 8
    * bands of [[signBandWidthOf]] bits; pairs sharing any band are
    * candidates (equi join on (band, bv) — no cross join), refined with
    * exact cosine >= 0.3 and deduplicated. Output also reports the
    * 64-bit code Hamming distance.
    *
    * Scale: the one knob that matters is the band width — fixed 4-bit
    * nibbles held n/16 vectors per organic bucket (a measured n²/32
    * candidate knee, > 900 s at 200 k vectors, SCALE.md r14); the
    * width policy keeps organic buckets at ~[[SignBucketTarget]] so
    * candidates grow ~ n·target·[[Bands]]/2 (measured 1.1×10⁸ at
    * 200 k, width 11). [[SignBucketCap]] is the degenerate-corpus
    * stop-loss on top.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame =
    memoized(signPairsMemo, spark, sfDir)(annLshBuild(spark, sfDir))

  // bounded + timed + releasable (graft.core.Memo): q_dedup_embed IS
  // annLsh filtered — one LSH pair build per corpus snapshot, read by
  // both registered queries and by repeat bench runs; the cold build
  // cost lands in the bench `artifacts` map per the memo convention.
  // maxEntries = 2, the shingle-memo eviction rationale: an evicted
  // localCheckpoint's truncated lineage cannot rebuild, so a consumer
  // holding the relation across ONE interleaved second-dataset fetch
  // must keep its blocks.
  private val signPairsMemo = new graft.core.Memo("sign_lsh_pairs", maxEntries = 2)

  /** Test seam (the resetIvfFits contract): specs that rewrite a
    * dataset dir in place must drop the memoized pair relation — and
    * with it the banded-corpus stats and count scalars it derives from.
    */
  private[pipeline] def resetSignPairs(): Unit = {
    signPairsMemo.clear()
    resetSignBandStats()
    resetEmbeddingsCount()
  }

  private def annLshBuild(spark: SparkSession, sfDir: String): DataFrame = {
    // codes/norms are consumed three times (band explode + two gather
    // joins); persist so signCode/norm lambdas run once per vector.
    // The count() that sizes the band width reads the same cache.
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        signCodeHi(col("embedding")).as("code_hi"),
        signCode(col("embedding")).as("code_lo"),
        dot(col("embedding"), col("embedding")).as("nsq"))
      .mat
    val r = signBandWidthOf(emb.count())
    // band legs are NARROW (id, band, bv) rows — a pair hit in k bands
    // must not shuffle its 64-float payload k times; vectors gather
    // back by id after the candidate distinct.
    val kept = signKeptBands(signBandRows(emb, Seq("vec_id"), r),
      "q_ann_lsh/q_dedup_embed", statsKey = Some(signStatsKey(spark, sfDir, r)))
    val cand = kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    cand
      .join(emb.as("ea"), col("id_a") === col("ea.vec_id"))
      .join(emb.as("eb"), col("id_b") === col("eb.vec_id"))
      .withColumn("cos",
        round(dot(col("ea.embedding"), col("eb.embedding")) / sqrt(col("ea.nsq") * col("eb.nsq")), 6))
      .filter(col("cos") >= 0.3)
      .withColumn("hamming",
        bit_count(col("ea.code_hi").bitwiseXOR(col("eb.code_hi"))) +
          bit_count(col("ea.code_lo").bitwiseXOR(col("eb.code_lo"))))
      .select(col("id_a"), col("id_b"), col("cos"), col("hamming"))
  }

  /** Shared oracle CTE chain e -> banded -> kept -> cand for the two
    * pair queries — the exact SQL mirror of [[annLsh]]'s candidate
    * path (width ladder, band values, hot-bucket anti join, pair
    * distinct).
    */
  private def signPairCteSql: String =
    s"""
    WITH w AS ($signWidthCteSql),
    e AS (
      SELECT vec_id, embedding,
             ${signCodeHiSql.replace("v[", "embedding[")} AS code_hi,
             ${signCodeSql.replace("v[", "embedding[")} AS code_lo
      FROM embeddings
    ),
    banded AS (
      SELECT vec_id, b.band,
             ${signBandValSql("code_hi", "code_lo", "b.band")} AS bv
      FROM e CROSS JOIN w
             CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS b(band)
    ),
    hot AS (
      SELECT band, bv FROM banded GROUP BY band, bv HAVING count(*) > $SignBucketCap
    ),
    kept AS (
      SELECT banded.* FROM banded
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = banded.band AND h.bv = banded.bv)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
    )"""

  val annLshSql: String =
    s"""
    $signPairCteSql
    SELECT c.id_a, c.id_b,
           round(${cosineSql("ea.embedding", "eb.embedding")}, 6) AS cos,
           bit_count(xor(ea.code_hi, eb.code_hi))
             + bit_count(xor(ea.code_lo, eb.code_lo)) AS hamming
    FROM cand c
    JOIN e ea ON c.id_a = ea.vec_id
    JOIN e eb ON c.id_b = eb.vec_id
    WHERE round(${cosineSql("ea.embedding", "eb.embedding")}, 6) >= 0.3"""

  // ---- q_dedup_embed -------------------------------------------------

  /** Embedding-cosine near-dup pairs via the LSH candidate path:
    * candidates share a code band, near-dups have cosine >= 0.4.
    */
  def embedDedup(spark: SparkSession, sfDir: String): DataFrame =
    annLsh(spark, sfDir).filter(col("cos") >= 0.4)
      .select(col("id_a"), col("id_b"), col("cos"))

  val embedDedupSql: String =
    s"""
    $signPairCteSql
    SELECT c.id_a, c.id_b,
           round(${cosineSql("ea.embedding", "eb.embedding")}, 6) AS cos
    FROM cand c
    JOIN e ea ON c.id_a = ea.vec_id
    JOIN e eb ON c.id_b = eb.vec_id
    WHERE round(${cosineSql("ea.embedding", "eb.embedding")}, 6) >= 0.4"""

  // ---- q_embed_centroid ----------------------------------------------

  /** Per-label embedding centroids — the class-prototype computation
    * behind centroid classifiers, cluster summaries, and
    * domain-embedding monitoring. Element-wise mean per (label, dim):
    * vectors are position-exploded to (label, dim, value) and averaged
    * with the exact-decimal sum trim, so every one of the 64 centroid
    * components hash-matches the oracle bit for bit.
    *
    * Scale: posexplode is narrow (64 rows per vector of 8 bytes each —
    * far smaller than shuffling whole vectors); the (label, dim)
    * aggregation has map-side partials and cardinality labels×64.
    * At 100 TB this is the canonical mean-vector shape; re-assembling
    * the array (collect_list ordered by dim) happens on the tiny
    * result only.
    */
  def embedCentroid(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(
        count(lit(1)).as("n"),
        (graft.functions.Exact.exactSum(col("v").cast("double"))
          / count(lit(1))).as("mean_v"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"), col("mean_v"))
  }

  val embedCentroidSql: String =
    """
    WITH x AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding
      FROM embeddings
    )
    SELECT label, CAST(i - 1 AS BIGINT) AS dim, count(*) AS n,
           -- REAL must widen to DOUBLE before the decimal round: DuckDB's
           -- direct REAL->DECIMAL goes via the float's shortest decimal
           -- repr, Spark's via the exact binary value — 1-ulp scale-6
           -- mismatches otherwise
           CAST(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
             / count(*) AS mean_v
    FROM x GROUP BY 1, 2"""

  // ---- q_embed_stats ---------------------------------------------------

  /** q_embed_stats: embedding-table health check — the one-row report
    * an indexing pipeline reads BEFORE building ANN structures over a
    * new embedding dump: row and label counts, zero vectors (a norm of
    * 0 breaks every cosine downstream — they must be quarantined, not
    * indexed), exact duplicate vectors (an encoder emitting the same
    * vector for distinct inputs is broken or the inputs are dups), and
    * the norm profile (min/mean/max — a collapsed norm range flags a
    * missing normalization step; a huge one flags mixed encoders).
    *
    * Scale: one pass over the table; the norm is the codegen
    * [[dot]] fold, the distinct-vector count is an exact hash
    * aggregate (at 100 TB swap in the KMV/HLL sketch — `q_kmv_distinct`
    * / `q_hll_distinct` are the bounded-state twins of exactly this
    * count; the report stays exact here because the oracle gate is).
    * Mean norm sums pre-rounded values in exact DECIMAL space (the
    * [[graft.functions.Exact]] discipline).
    */
  def embedStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"),
        round(sqrt(dot(col("embedding"), col("embedding"))), 6).as("norm"))
    e.agg(
      count(lit(1)).as("n_vectors"),
      countDistinct(col("label")).as("n_labels"),
      sum(when(col("norm") === 0.0, lit(1L)).otherwise(lit(0L))).as("n_zero"),
      (count(lit(1)) - countDistinct(col("embedding"))).as("n_dup_vectors"),
      min(col("norm")).as("norm_min"),
      round(graft.functions.Exact.exactSum(col("norm")) / count(lit(1)), 6).as("norm_mean"),
      max(col("norm")).as("norm_max"))
  }

  val embedStatsSql: String =
    s"""
    WITH e AS (
      SELECT vec_id, label, embedding,
             round(sqrt(${dotSql("embedding", "embedding")}), 6) AS norm
      FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
           CAST(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(count(*) - count(DISTINCT embedding) AS BIGINT) AS n_dup_vectors,
           min(norm) AS norm_min,
           round(CAST(CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
                 / count(*), 6) AS norm_mean,
           max(norm) AS norm_max
    FROM e"""

  // ---- q_embed_outliers ----------------------------------------------

  /** Outlier boundary quantile of the per-label distance distribution. */
  val OutlierQuantile = 0.975

  /** Per-label embedding outliers — the mislabeled-example / corrupt-
    * vector detector an embedding-pipeline QA step runs: squared L2
    * distance of every vector to its OWN label's centroid, flagged when
    * it exceeds the label's [[OutlierQuantile]] distance quantile (a
    * distribution-free boundary — centroid distances are not normal, so
    * a quantile rule beats mean+k·σ, and it avoids the
    * `sumsq/n − mean²` cancellation that is not bit-stable at scale 6).
    *
    * Determinism: centroids come from [[embedCentroid]]'s exact-decimal
    * per-(label, dim) means, reassembled into tiny per-label arrays;
    * the distance is an ORDERED fold over dims (the dot-product
    * discipline — no unordered float sum); the mean uses the
    * exact-decimal sum and the boundary is the exact interpolated
    * percentile (the q_quantile_sample parity precedent).
    *
    * Scale: centroid relation is labels×64 (broadcast); distance is
    * map-only over the corpus after that broadcast join; the stats leg
    * is one labels-cardinality aggregation broadcast back. Nothing
    * corpus-sized shuffles. (At 100 TB the exact percentile swaps for
    * the bottom-k-sample quantile of q_quantile_sample — same rule,
    * bounded state.)
    */
  def embedOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = embedCentroid(spark, sfDir)
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("dim"), col("mean_v")))).as("cs"))
      .select(col("label"), transform(col("cs"), c => c("mean_v")).as("cent"))
    val dist = emb.join(broadcast(cents), "label")
      .withColumn("dist_sq", round(expr(
        """aggregate(sequence(1, size(embedding)), CAST(0.0 AS DOUBLE), (acc, i) ->
             acc + (CAST(element_at(embedding, i) AS DOUBLE) - element_at(cent, i))
                 * (CAST(element_at(embedding, i) AS DOUBLE) - element_at(cent, i)))"""), 6))
      .select(col("vec_id"), col("label"), col("dist_sq"))
    val stats = dist.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.Exact.exactSum(col("dist_sq")).as("sumd"),
        expr(s"percentile(dist_sq, $OutlierQuantile)").as("q_bnd"))
      .withColumn("mean_d", col("sumd") / col("n"))
    dist.join(broadcast(stats.select(col("label"), col("mean_d"), col("q_bnd"))), "label")
      .select(col("vec_id"), col("label"), col("dist_sq"),
        round(col("mean_d"), 6).as("mean_dist"),
        round(col("q_bnd"), 6).as("q_dist"),
        (col("dist_sq") > col("q_bnd")).as("is_outlier"))
  }

  val embedOutliersSql: String =
    """
    WITH x AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding
      FROM embeddings
    ),
    c AS (
      SELECT label, i,
             CAST(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
               / count(*) AS mean_v
      FROM x GROUP BY 1, 2
    ),
    cent AS (SELECT label, list(mean_v ORDER BY i) AS cent FROM c GROUP BY 1),
    d AS (
      SELECT e.vec_id, e.label,
             round(list_reduce(
               [(CAST(e.embedding[i] AS DOUBLE) - cent[i]) * (CAST(e.embedding[i] AS DOUBLE) - cent[i])
                for i in generate_series(1, len(e.embedding))],
               (x, y) -> x + y), 6) AS dist_sq
      FROM embeddings e JOIN cent ON e.label = cent.label
    ),
    st AS (
      SELECT label,
             CAST(CAST(SUM(CAST(dist_sq AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
               / count(*) AS mean_d,
             quantile_cont(dist_sq, """ + OutlierQuantile + """) AS q_bnd
      FROM d GROUP BY 1
    )
    SELECT d.vec_id, d.label, d.dist_sq,
           round(st.mean_d, 6) AS mean_dist, round(st.q_bnd, 6) AS q_dist,
           d.dist_sq > st.q_bnd AS is_outlier
    FROM d JOIN st ON d.label = st.label"""

  // ---- frozen-centroid oracle support ---------------------------------

  /** Render a double so DuckDB parses back the EXACT same IEEE-754
    * value: `Double.toString` is the shortest round-trip decimal repr
    * and a VARCHAR→DOUBLE cast is correctly rounded, so the literal
    * survives the SQL round trip bit-identically. (A bare SQL literal
    * like `0.1` would parse as DECIMAL in DuckDB — different value.)
    */
  private[pipeline] def dlit(v: Double): String = s"CAST('$v' AS DOUBLE)"

  /** VALUES rows `(idx, cc, cv)` for a fitted centroid set: index,
    * squared norm (computed by the SAME driver-side fold the Spark plan
    * injects via `lit(cc)`), and the centroid as a DOUBLE list literal.
    */
  private[graft] def centroidValuesSql(centers: Seq[Array[Double]]): String =
    centers.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v * v).sum
      s"($i, ${dlit(cc)}, [${c.map(dlit).mkString(", ")}])"
    }.mkString(",\n      ")

  /** Dot product of a vector column against a `cv` list column from the
    * centroid VALUES relation — the same products-then-left-fold shape
    * as [[dotSql]], so it is bit-identical to the Spark side's
    * `dotProduct(x, typedLit(c))`.
    */
  private[graft] def dotCvSql(vec: String, cv: String, dim: Int = 64): String =
    s"list_reduce([CAST(($vec)[i] AS DOUBLE) * ($cv)[i] for i in generate_series(1, $dim)], (x, y) -> x + y)"

  // ---- q_ann_ivf -----------------------------------------------------

  /** AUTO-SIZED coarse quantizer — no hand-tuned k: cells scale with
    * the corpus as k ≈ √n (the standard IVF sizing rule; per-cell
    * membership and per-query probe work then both grow as √n instead
    * of one of them going linear), clamped to [[IvfCellsMin]] /
    * [[IvfCellsMax]] so degenerate corpora still fit. The cells
    * ceiling was 256 while probe selection unrolled one literal dot
    * block per cell (janino's 64 KB method limit); with both the
    * assignment argmin ([[graft.functions.NearestCenter]]) and the
    * probe top-p ([[graft.functions.NearestCenters]]) looping over a
    * reference-object model, the generated code no longer grows with
    * k, and the ceiling is set by the driver-side k-means fit (Lloyd
    * over the ≤4096-point distinct sample) and the broadcast model
    * bytes (1024 × 64 doubles = 512 KB — well under any broadcast
    * threshold). The probe
    * width is a constant FRACTION of the cells (¼, min 2) up to an
    * absolute ceiling of [[IvfProbeMax]]: the fraction keeps a small
    * index from being silently under- or over-probed, and the ceiling
    * keeps the probed VOLUME sublinear — an uncapped k/4 probe reads
    * ~¼ of the corpus per query regardless of k (probe × n/k = n/4),
    * which the 10× ScaleProbe measured as a 38× wall-clock blowup on
    * q_ann_ivfpq before the cap. With the ceiling, per-query
    * candidates are ≤ IvfProbeMax · n/k ≈ 16·√n at the √n cell
    * sizing. The cap binds only above 64 cells (> ~4 k vectors), so
    * every gate-scale oracle output is unchanged.
    */
  val IvfCellsMin = 4
  val IvfCellsMax = 1024
  val IvfProbeMax = 16

  def ivfCellsOf(n: Long): Int =
    math.max(IvfCellsMin,
      math.min(IvfCellsMax, math.round(math.sqrt(n.toDouble)).toInt))

  def ivfProbeOf(k: Int): Int = math.min(IvfProbeMax, math.max(2, (k + 3) / 4))

  /** The declared recall floor the CALIBRATED probe width targets:
    * the production IVF search runs the narrowest width whose measured
    * recall@[[IvfTopK]] on the capped probe set clears this, and the
    * ceiling ([[ivfProbeOf]]) when no width can (see
    * [[ivfCalibratedWidth]]). 0.9 is the sweep table's knee on
    * clustered geometry (nprobe 1 already reads 0.904 there) and
    * unreachable on organic sf0.1 geometry even at the ceiling (0.69)
    * — so the knob picks width 1 where the data allows it and the
    * widest affordable search where it does not.
    */
  val IvfRecallTarget = 0.9

  /** [[IvfRecallTarget]] in exact parts-per-million — the calibration
    * decides in INTEGER space (1e6·hits ≥ ppm·topK·queries) so the
    * decision, the report row, and the DuckDB oracle can never diverge
    * by a floating-point mean's last bit at the exact boundary.
    */
  val IvfRecallTargetPpm: Long = math.round(IvfRecallTarget * 1000000)

  /** The candidate widths the calibration tries, narrowest first —
    * doubling steps bound the calibration at ≤ 5 recall evaluations
    * (each an IVF pass over the ≤ 100-probe capped set plus the shared
    * exact baseline), and the final entry is always the [[ivfProbeOf]]
    * ceiling so an uncalibratable corpus runs the widest search the
    * candidate budget allows.
    */
  private def ivfWidthLadder(k: Int): Seq[Int] =
    (Seq(1, 2, 4, 8).filter(_ < ivfProbeOf(k)) :+ ivfProbeOf(k)).distinct

  /** One calibration decision (test/observability seam; integer
    * evidence — `recall` is the derived display form).
    */
  case class IvfCalibration(width: Int, nQueries: Long, totalHits: Long,
      targetMet: Boolean) {
    def recall: Double =
      if (nQueries == 0) 0.0 else totalHits.toDouble / (IvfTopK.toDouble * nQueries)
  }

  private val ivfCalibrations =
    scala.collection.concurrent.TrieMap.empty[String, IvfCalibration]

  private[pipeline] def ivfCalibrationInfo(sfDir: String): Option[IvfCalibration] =
    ivfCalibrations.get(sfDir)

  /** The RECALL-CALIBRATED production probe width — the policy that
    * replaced the fixed [[ivfProbeOf]]-width probe (which paid the
    * ceiling cost on every geometry and still read only 0.63 recall@5
    * on organic sf0.1 vectors, SCALE.md r14). A width policy derived
    * from quantizer geometry alone CANNOT work here — measured: the
    * per-query d2/d2min profiles of organic sf0.1 (medians 1.09–1.24
    * across ranks) and clustered 10× (1.13–1.32) are statistically
    * indistinguishable, because planted truth co-cells with its query
    * without the centroid distances showing it. The signal that does
    * exist is the engine's own recall instrument: calibrate on the
    * capped probe set (≤ 100 probes — the same bounded sample every
    * recall eval uses) against the exact baseline, walking
    * [[ivfWidthLadder]] narrowest-first and stopping at the first
    * width whose mean recall@[[IvfTopK]] clears [[IvfRecallTarget]];
    * if none does, the ceiling runs and the decision records
    * `targetMet = false` (the organic-geometry outcome — the user sees
    * the miss in `q_ann_recall` instead of inheriting 0.63 silently).
    * Memoized per dataset like the quantizer fit itself; the exact
    * baseline it reads is annTopk's declared O(probes · n) bounded
    * scan, paid once per corpus snapshot — the same amortization class
    * as the k-means sample fit.
    */
  private[pipeline] def ivfCalibratedWidth(spark: SparkSession, sfDir: String): Int =
    ivfCalibrations.getOrElseUpdate(sfDir, {
      val k = ivfCenters(spark, sfDir).length
      val ladder = ivfWidthLadder(k)
      // integer evidence: (queries, total hits) — exact at any engine
      def hitsAt(w: Int): (Long, Long) = {
        val row = annRecallProbe(spark, sfDir, Some(w))
          .agg(count(lit(1)), sum(col("n_hits"))).head()
        (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      }
      def meets(n: Long, hits: Long): Boolean =
        n > 0 && 1000000L * hits >= IvfRecallTargetPpm * IvfTopK * n
      // LazyList memoizes: the no-hit fallback reuses the ceiling's
      // already-measured evidence instead of re-running it
      val walked = ladder.to(LazyList).map { w => val (n, h) = hitsAt(w); (w, n, h) }
      val (w, n, h) = walked.find { case (_, n, h) => meets(n, h) }.getOrElse(walked.last)
      IvfCalibration(w, n, h, meets(n, h))
    }).width

  /** q_ivf_calibration: the calibration DECISION as a first-class
    * relation (the `q_ivf_stats` discipline applied to the probe
    * policy) — one row: the chosen width, the probe-set evidence
    * (queries, total top-[[IvfTopK]] hits), the recall in exact ppm,
    * and whether [[IvfRecallTarget]] was met. The monitoring row a
    * 100 TB pipeline reads before trusting `q_ann_ivf`'s narrow probe:
    * a clustered corpus shows (width 1-2, target_met true); an organic
    * corpus shows (ceiling, false) — the 0.63-recall case surfaced
    * instead of inherited. The oracle RECOMPUTES the evidence from the
    * frozen centroids + frozen width (integer arithmetic end to end),
    * so the recorded measurement — not just the echo of it — is
    * hash-gated.
    */
  def ivfCalibrationReport(spark: SparkSession, sfDir: String): DataFrame =
    // computed per call (round-17: a registered query must execute its
    // plan per invocation — r16 memoized this query's own decision row
    // and the bench median timed a cached readout). The frozen fits it
    // reads (the width-walk evidence in [[ivfCalibrations]], the
    // k-means centers, the exact top-k truth memo) stay — the
    // quantizer-fit precedent; the miss-path alternative-lane eval —
    // this query's own measurement — runs here.
    computeIvfCalibrationReport(spark, sfDir)

  private def computeIvfCalibrationReport(spark: SparkSession, sfDir: String): DataFrame = {
    ivfCalibratedWidth(spark, sfDir)
    val c = ivfCalibrations(sfDir)
    // r15 stretch: a target_met=false row must also DECIDE — measure
    // the shipped alternative lane (sign-LSH, the same bounded probe
    // set and exact truth) and recommend the better of it and the
    // ceiling the calibration already fell back to, so the monitoring
    // row carries the next action, not just the miss. The comparison
    // is exact cross-multiplied integer evidence (no ppm rounding);
    // the extra eval runs ONLY on the miss path — a clustered corpus
    // whose narrow probe cleared the target pays nothing.
    val (recommended, altPpm): (String, Option[Long]) =
      if (c.targetMet) ("ivf", None)
      else {
        val row = annLshRecall(spark, sfDir)
          .agg(count(lit(1)), sum(col("n_hits"))).head()
        val ln = row.getLong(0)
        val lh = if (row.isNullAt(1)) 0L else row.getLong(1)
        val lshPpm = if (ln == 0) 0L else 1000000L * lh / (IvfTopK * ln)
        val lshBetter = lh * c.nQueries > c.totalHits * ln
        (if (lshBetter) "sign_lsh" else "ivf_ceiling", Some(lshPpm))
      }
    import spark.implicits._
    Seq((c.width, c.nQueries, c.totalHits,
        if (c.nQueries == 0) 0L else 1000000L * c.totalHits / (IvfTopK * c.nQueries),
        c.targetMet, recommended, altPpm))
      .toDF("width", "n_queries", "total_hits", "recall_ppm", "target_met",
        "recommended_lane", "alt_recall_ppm")
  }

  /** DuckDB oracle for q_ivf_calibration (post-fit; None → rows-only):
    * the frozen width's recall evidence re-derived from the frozen
    * centroids by the oracle's own IVF pipeline.
    */
  def ivfCalibrationReportOracleSql: Option[String] =
    annIvfOracleSql.flatMap { ivfSql =>
      FrozenFit.single(ivfCalibrations, "IVF probe calibration").map { cal =>
        s"""
    WITH ex AS (SELECT q_id, vec_id FROM ($annTopkSql)),
    ap AS (SELECT q_id, vec_id FROM ($ivfSql)),
    per AS (
      SELECT ex.q_id,
             CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
      GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(COALESCE(SUM(n_hits), 0) AS BIGINT) AS total_hits,
             -- NULLIF/COALESCE: an empty probe set must read (0, 0, 0,
             -- false) like the Spark side, not divide by zero
             COALESCE((1000000 * CAST(SUM(n_hits) AS BIGINT))
               // NULLIF($IvfTopK * CAST(count(*) AS BIGINT), 0), 0) AS recall_ppm,
             (count(*) > 0 AND 1000000 * CAST(COALESCE(SUM(n_hits), 0) AS BIGINT)
                >= $IvfRecallTargetPpm * $IvfTopK * CAST(count(*) AS BIGINT)) AS target_met
      FROM per
    ),
    -- the alternative lane's evidence (sign-LSH over the same probe
    -- set and exact truth), recomputed unconditionally here; the final
    -- CASE nulls it on the target-met path exactly like the Spark side
    lsh AS (
      SELECT CAST(count(*) AS BIGINT) AS ln,
             CAST(COALESCE(SUM(n_hits), 0) AS BIGINT) AS lh
      FROM ($annLshRecallSql)
    )
    SELECT ${cal.width} AS width, agg.n_queries, agg.total_hits,
           agg.recall_ppm, agg.target_met,
           CASE WHEN agg.target_met THEN 'ivf'
                WHEN lsh.lh * agg.n_queries > agg.total_hits * lsh.ln THEN 'sign_lsh'
                ELSE 'ivf_ceiling' END AS recommended_lane,
           CAST(CASE WHEN agg.target_met THEN NULL
                     ELSE COALESCE((1000000 * lsh.lh) // NULLIF($IvfTopK * lsh.ln, 0), 0)
                END AS BIGINT) AS alt_recall_ppm
    FROM agg, lsh"""
      }
    }

  /** Re-fit trigger: accept a quantizer only if its heaviest cell holds
    * at most this multiple of the even share (1M/k ppm). A giant cell
    * is exactly the hazard `q_ivf_stats` reports and [[KnnCellCap]]
    * bounds — when the SAMPLE already shows it, the fit re-runs once
    * at 2k (more centers land inside the dense region and split it)
    * rather than shipping a degenerate index. One re-fit attempt:
    * irreducible skew (a single repeated point) cannot be split by any
    * k, and the cell caps downstream still bound the work.
    */
  val IvfMaxShareMultiple = 4L

  val IvfTopK = 5

  /** Centroids of the most recent [[annIvf]] fit. The iterative FIT is
    * not SQL-expressible, but the scoring given frozen centroids is —
    * so the query caches its fitted centers here and
    * [[annIvfOracleSql]] renders them as exact literals into a DuckDB
    * mirror of the assignment+probe+rank stages. `Verify` runs every
    * query BEFORE dumping oracle_sql.json, so the dumped SQL always
    * scores with the very centroids that produced the parquet under
    * compare (the [[KmeansFit]] fit is bit-deterministic within a run
    * regardless).
    */
  private val ivfFits =
    scala.collection.concurrent.TrieMap.empty[String, IndexedSeq[Array[Double]]]

  /** The frozen coarse-quantizer centroids, also consumed by [[Pq]]'s
    * IVF+PQ oracle. The fit cache is keyed by dataset dir and this
    * refuses to render after fits on two datasets — one dump must not
    * gate another dataset's parquet (Verify's flow runs one dataset
    * per JVM).
    */
  private[pipeline] def ivfFrozen: Option[IndexedSeq[Array[Double]]] =
    FrozenFit.single(ivfFits, "IVF centroids")

  /** DuckDB oracle for q_ann_ivf, available once [[annIvf]] has run in
    * this JVM (None → the driver falls back to its rows-only check).
    */
  /** Shared oracle CTE prefix (cents/e/ranked/assigned) of the frozen
    * IVF coarse quantizer — one definition, consumed by the ANN probe
    * oracle and the kNN-graph oracle so cell assignment can never
    * drift between them.
    */
  private def ivfAssignCtesSql(centers: IndexedSeq[Array[Double]]): String =
    s"""cents(cell, cc, cv) AS (VALUES
      ${centroidValuesSql(centers)}),
    e AS (
      SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nsq
      FROM embeddings
    ),
    ranked AS (
      SELECT vec_id, embedding, nsq, cell, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crk
      FROM (
        SELECT e.vec_id, e.embedding, e.nsq, c.cell,
               greatest((e.nsq - CAST(2 AS DOUBLE) * ${dotCvSql("e.embedding", "c.cv")}) + c.cc,
                        CAST(0 AS DOUBLE)) AS d2
        FROM e CROSS JOIN cents c
      )
    ),
    assigned AS (SELECT vec_id, embedding, nsq, cell, d2 FROM ranked WHERE crk = 1)"""

  /** The frozen probe calibration, DERIVED on demand when the centers
    * are frozen but no calibrated-width query ran this JVM (e.g. a
    * session that only ran `q_ivf_stats` or explicit-nprobe sweeps) —
    * without the derivation the q_ann_ivf/q_ann_recall oracle gates
    * that predate the calibrated-width policy would silently degrade
    * to rows-only. Needs a live session to walk the ladder; if none is
    * active at dump time the degradation is at least NAMED on stderr
    * instead of silent.
    */
  private def frozenOrDerivedCalibration: Option[IvfCalibration] =
    FrozenFit.single(ivfCalibrations, "IVF probe calibration").orElse {
      val fittedDirs = ivfFits.readOnlySnapshot().keys.toSeq
      val session = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      (fittedDirs, session) match {
        case (Seq(dir), Some(spark)) =>
          ivfCalibratedWidth(spark, dir)
          FrozenFit.single(ivfCalibrations, "IVF probe calibration")
        case _ =>
          System.err.println(
            "[graft] IVF centers are frozen but no probe calibration exists and no " +
              "active session can derive one — q_ann_ivf oracle degrades to rows-only")
          None
      }
    }

  def annIvfOracleSql: Option[String] = {
    // the calibrated width freezes into the oracle as a literal, the
    // same contract as the centroids: the fit/calibration is not the
    // oracle's to re-run, the search AT that width is
    for {
      centers <- ivfFrozen
      cal <- frozenOrDerivedCalibration
    } yield
    s"""
    WITH ${ivfAssignCtesSql(centers)},
    probes AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nsq AS q_nsq, cell
      FROM ranked WHERE vec_id % 100 = 0 AND crk <= ${cal.width}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id,
             round(${dotSql("p.q_emb", "a.embedding")} / sqrt(p.q_nsq * a.nsq), 6) AS cos
      FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.q_id
    )
    SELECT q_id, rk, vec_id, cos FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored
    ) WHERE rk <= $IvfTopK"""
  }

  /** IVF (inverted-file) ANN — the second scale path beside LSH: a
    * coarse quantizer ([[KmeansFit]] over the distinct-aggregated
    * sample) assigns every vector to its nearest centroid cell; a
    * query probes only its [[ivfProbeOf]] nearest cells and ranks
    * candidates by exact cosine.
    *
    * Assignment and probing are fully codegen'd: each centroid is a
    * literal array, distances use the native DotProduct expression,
    * argmin/arg-top-p are `array_min`/`array_sort` over (dist, cell)
    * structs — no UDF, no model transform in the scoring path, and the
    * only shuffle is the (cell)-keyed candidate join.
    *
    * The iterative fit itself is not SQL-expressible, but the scoring
    * given the fitted centroids is: the fit freezes its centers into
    * [[annIvfOracleSql]] as exact literals, so assignment + probing +
    * ranking are fully oracle-gated in DuckDB (SimilarityRecallSpec pins
    * the fit's recall against the exact brute-force baseline).
    */
  /** The memoized IVF quantizer fit, shared by [[annIvf]], [[Pq]] and
    * [[semanticDedup]]: a deterministic 1/3 sample aggregated to
    * distinct (point, count) rows in Spark, then [[KmeansFit]]'s
    * deterministic weighted Lloyd on the driver — a quantizer needs
    * rough cells, not convergence, and sample-fit is the only viable
    * shape at 100 TB. k is AUTO-SIZED from the corpus ([[ivfCellsOf]])
    * and the fit self-checks for skew on the already-collected sample:
    * a heaviest cell over [[IvfMaxShareMultiple]]× its even share
    * re-fits once at 2k before the index is accepted ([[ivfFitLog]]
    * records the decision; Round9OpsSpec plants a corpus that forces
    * it). Fit memoized per dataset (deterministic — same as the
    * PCA/BPE fits), so repeated invocations (Bench's median-of-3) time
    * the scoring plan, not a redundant refit.
    */
  private[pipeline] def ivfCenters(spark: SparkSession, sfDir: String): IndexedSeq[Array[Double]] =
    ivfFits.getOrElseUpdate(sfDir, {
      // Spark does the heavy part (distinct + count over the sample);
      // the driver runs [[KmeansFit]]'s deterministic weighted Lloyd
      // over ≤ DistinctCap (point, count) rows. Density is preserved
      // exactly (counts weight the means), the collect is bounded at
      // any corpus size, and — unlike MLlib's block KMeans, which
      // crashes when its random init draws the same point twice on
      // duplicate-heavy data — the fit is total and bit-reproducible.
      val emb = Tables.embeddings(spark, sfDir)
      val n = emb.count() // parquet metadata count — no data scan
      val k = ivfCellsOf(n)
      val pts = KmeansFit.distinctSample(
        emb.filter(col("vec_id") % 3 === 0)
          .select(col("embedding").cast("array<double>").as("a")),
        col("a"))
      val first = KmeansFit.fit(pts, k, KmeansFit.Iters)
      val share = KmeansFit.maxSharePpm(pts, first)
      val threshold = IvfMaxShareMultiple * 1000000L / k
      // the re-fit target respects the same ceiling as the sizing rule
      // (at k = IvfCellsMax there is no headroom — accept the index and
      // rely on the downstream cell caps, don't refit at the same k)
      val k2 = math.min(2 * k, IvfCellsMax)
      val refit = share > threshold && k2 > k
      val centers = if (refit) KmeansFit.fit(pts, k2, KmeansFit.Iters) else first
      ivfFitLog.put(sfDir, IvfFitInfo(n, k, share, refit, centers.length))
      centers
    })

  /** One fit decision record (test/observability seam — the
    * auto-sizing and the skew re-fit must be assertable without
    * reverse-engineering the centroid list).
    */
  case class IvfFitInfo(n: Long, k0: Int, sampleMaxSharePpm: Long,
      refit: Boolean, finalCenters: Int)

  private val ivfFitLog =
    scala.collection.concurrent.TrieMap.empty[String, IvfFitInfo]

  private[pipeline] def ivfFitInfo(sfDir: String): Option[IvfFitInfo] =
    ivfFitLog.get(sfDir)

  /** Literal-centroid (d2, cell) distance array over the fixed
    * (embedding, nsq) column names — the codegen'd assignment shared by
    * [[annIvf]] and [[knnGraph]].
    */
  /** The sorted probe cells of an `embedding` column under the frozen
    * quantizer — `array<struct<d2, cell>>`, ascending (d2, cell), via
    * the [[graft.functions.NearestCenters]] codegen loop (model as a
    * reference object — generated code independent of the cell count,
    * which is what lets [[IvfCellsMax]] sit above the old 256 literal-
    * unroll ceiling). Selection order is identical to the
    * `slice(array_sort(array(struct(d2, cell)…)), 1, p)` literal form
    * it replaced (NearestCentersSpec pins equality incl. ties).
    */
  private def probeCells(centers: IndexedSeq[Array[Double]], p: Int): Column =
    graft.functions.VectorFunctions.nearestCenters(
      col("embedding"), 0, centers.head.length, centers, p)

  /** (vec_id, cell, embedding, nsq) of every vector under the frozen
    * coarse quantizer — the Spark-side mirror of the oracle's
    * cents/ranked/assigned prefix, shared by [[annIvf]] and
    * [[knnGraph]] so the assignment cannot drift between them.
    */
  private def assignedCells(spark: SparkSession, sfDir: String): DataFrame =
    memoized(assignedCellsMemo, spark, sfDir)(assignedCellsBuild(spark, sfDir))

  // the corpus-side assignment (the IVF index itself) is read by
  // q_ann_ivf, q_ivf_stats, the recall evals, and every width of the
  // calibration ladder — one full-corpus nearest-center pass per
  // snapshot, consumers read the layout. maxEntries = 2 (see
  // annTopkMemo).
  private val assignedCellsMemo = new graft.core.Memo("ivf_assigned", maxEntries = 2)

  private def assignedCellsBuild(spark: SparkSession, sfDir: String): DataFrame = {
    val centers = ivfCenters(spark, sfDir)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nsq"))
      // corpus-side argmin via the NearestCenter codegen loop (model as
      // a reference object — generated code independent of cell count);
      // the probe side keeps the literal (d2, cell) array because it
      // needs the SORTED top-p, not the argmin, and runs on the ~1%
      // query sample only
      .withColumn("best",
        graft.functions.VectorFunctions
          .nearestCenter(col("embedding"), 0, centers.head.length, centers))
      .select(col("vec_id"), col("best.code").as("cell"),
        col("best.d2").as("d2"), col("embedding"), col("nsq"))
  }

  def annIvf(spark: SparkSession, sfDir: String): DataFrame =
    annIvfProbe(spark, sfDir, None)

  /** Probe-width-parameterized IVF search — the recall-vs-nprobe
    * instrument ([[graft.ScaleProbe]]'s `recall_sweep` mode). The
    * registered `q_ann_ivf` always runs the production width
    * ([[ivfProbeOf]]); the override exists so the probe CAP's recall
    * cost is measurable at scale instead of asserted (the r13 10×
    * record read a degenerate 1.000 because verbatim replicas were
    * necessarily co-celled with their queries).
    */
  private[graft] def annIvfProbe(spark: SparkSession, sfDir: String,
      nprobe: Option[Int]): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nsq"))
    val centers = ivfCenters(spark, sfDir)
    val assigned = assignedCells(spark, sfDir)
    // production path (nprobe = None): the recall-CALIBRATED width —
    // the narrowest width whose measured probe-set recall clears
    // [[IvfRecallTarget]] ([[ivfCalibratedWidth]]). An explicit nprobe
    // (the recall_sweep instrument) stays EXACTLY that fixed width, so
    // the sweep prices pure widths.
    val width = nprobe.getOrElse(ivfCalibratedWidth(spark, sfDir))
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .withColumn("probe", explode(probeCells(centers, width)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nsq").as("q_nsq"), col("probe.cell").as("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(assigned, "cell") // equi join on the cell key — the only shuffle
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        round(dot(col("q_emb"), col("embedding")) / sqrt(col("q_nsq") * col("nsq")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= IvfTopK)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
  }

  // ---- q_ivf_stats -----------------------------------------------------

  /** q_ivf_stats: IVF index-health report — per cell, the member count,
    * corpus share (exact integer ppm), and the quantization-error
    * profile (mean/max distance-to-centroid). The eval an ANN operator
    * reads before trusting the index at 100 TB, and the detector for
    * exactly the skewed-giant-cell hazard the [[KnnCellCap]] core
    * bounds: a cell holding a disproportionate share (or whose max d2
    * dwarfs its mean) needs more cells (k ~ √n) or a cell split before
    * the pair-family queries run.
    *
    * Scale: the assignment is the shared codegen argmin pass; the
    * report is one hash aggregation to ≤ |cells| rows. mean_d2 sums in
    * exact DECIMAL space over the pre-rounded d2 (order-free — the
    * [[graft.functions.Exact]] discipline), max is order-free by
    * definition.
    */
  def ivfStats(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = assignedCells(spark, sfDir)
      .select(col("cell"), round(col("d2"), 6).as("d2"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        graft.functions.Exact.exactSum(col("d2")).as("sum_d2"),
        max(col("d2")).as("max_d2"))
      .crossJoin(broadcast(total))
      .select(col("cell"), col("n_vectors"),
        expr("(1000000 * n_vectors) div n_total").as("share_ppm"),
        round(col("sum_d2") / col("n_vectors"), 6).as("mean_d2"),
        col("max_d2"))
  }

  /** DuckDB oracle for q_ivf_stats (post-fit; None → rows-only). */
  def ivfStatsOracleSql: Option[String] =
    ivfFrozen.map { centers =>
      s"""
    WITH ${ivfAssignCtesSql(centers)},
    a AS (SELECT cell, round(d2, 6) AS d2 FROM assigned),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM a)
    SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
           (1000000 * CAST(count(*) AS BIGINT)) // n_total AS share_ppm,
           round(CAST(CAST(SUM(CAST(d2 AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
                 / count(*), 6) AS mean_d2,
           max(d2) AS max_d2
    FROM a, t GROUP BY cell, n_total"""
    }

  // ---- q_ann_recall --------------------------------------------------

  /** q_ann_recall: the index-quality measurement a pipeline runs before
    * trusting an ANN index — per-probe recall@[[IvfTopK]] of the IVF
    * search ([[annIvf]]) against the exact brute-force truth
    * ([[annTopk]]), as a first-class relation (the spec-level recall
    * floors pin the fits; this surfaces the same number where a
    * monitoring job can read it).
    *
    * Scale: both legs are the already-bounded probe queries (≤ 100
    * probes each at any corpus size), so the recall join touches ≤
    * probes·k rows — constant-size work after the legs. Probes are
    * [[annTopk]]'s capped set (the IVF leg's extras drop in the join).
    */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame =
    annRecallProbe(spark, sfDir, None)

  /** Probe-width-parameterized recall (None = production width) — see
    * [[annIvfProbe]].
    */
  private[graft] def annRecallProbe(spark: SparkSession, sfDir: String,
      nprobe: Option[Int]): DataFrame = {
    val exact = annTopk(spark, sfDir).select(col("q_id"), col("vec_id"))
    val approx = annIvfProbe(spark, sfDir, nprobe)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        (col("n_hits").cast("double") / lit(IvfTopK.toDouble)).as("recall"))
  }

  /** DuckDB oracle for q_ann_recall (post-fit; None → rows-only): the
    * exact-baseline CTE joined to the frozen-centroid IVF pipeline.
    */
  def annRecallOracleSql: Option[String] =
    annIvfOracleSql.map { ivfSql =>
      s"""
    WITH ex AS (SELECT q_id, vec_id FROM ($annTopkSql)),
    ap AS (SELECT q_id, vec_id FROM ($ivfSql))
    SELECT ex.q_id,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / $IvfTopK.0 AS recall
    FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
    GROUP BY 1"""
    }

  // ---- q_ann_lsh_recall ------------------------------------------------

  /** q_ann_lsh_recall: the recall instrument for the THIRD index — the
    * sign-LSH code ([[annLsh]]'s band family), measured as a top-k
    * search the way `q_ann_recall` measures IVF and `q_lsh_recall`
    * measures MinHash-LSH, so every index in the engine ships with its
    * recall eval as a first-class relation. Per probe (the
    * [[TopkQueryCap]]-bounded every-100th set, identical to
    * [[annTopk]]): candidates = vectors sharing ≥ 1 of the 8 sign-code
    * bands with the probe, exact-cosine top-[[IvfTopK]], recall
    * against the brute-force truth. Fully static oracle (the sign code
    * is closed-form — no frozen fit).
    *
    * Scale: the probe side is ≤ 100 rows broadcast into the banded
    * corpus (narrow (id, band, bv) rows — no vector payloads move for
    * candidate generation); payloads gather by id afterwards for the
    * bounded candidate set only; the truth leg is the declared capped
    * brute-force baseline.
    */
  def annLshRecall(spark: SparkSession, sfDir: String): DataFrame = {
    // round-16: the eager .mat + the count it forced cost ~0.45 s of
    // driver-synchronous build per call. The sign-code/nsq projection
    // is one generated loop per row (SignCodeHalf) — cheap enough to
    // inline into each consumer branch — and the width count reads the
    // parquet metadata directly instead of materializing the codes.
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        signCodeHi(col("embedding")).as("code_hi"),
        signCode(col("embedding")).as("code_lo"),
        dot(col("embedding"), col("embedding")).as("nsq"))
    val r = signBandWidthOf(embeddingsCount(spark, sfDir))
    def bandsOf(df: DataFrame): DataFrame = signBandRows(df, Seq("vec_id"), r)
    // the eval must search the index AS SHIPPED: the corpus side gets
    // the same hot-bucket stop-loss the pair lane applies (a probe
    // whose bucket the index drops finds no candidates there). The
    // pair-volume budget does not apply — the probe join is bounded by
    // the probe count, not C(bucket, 2) — so it is disabled here.
    val banded = signKeptBands(bandsOf(emb), "q_ann_lsh_recall",
      budget = Long.MaxValue, statsKey = Some(signStatsKey(spark, sfDir, r)))
    val probeBands = bandsOf(
      emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < TopkQueryCap))
      .select(col("vec_id").as("q_id"), col("band"), col("bv"))
    val cand = broadcast(probeBands).join(banded,
        Seq("band", "bv"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    val top = cand
      .join(emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nsq").as("q_nsq")), "q_id")
      .join(emb.select(col("vec_id"), col("embedding"), col("nsq")), "vec_id")
      .withColumn("cos",
        round(dot(col("q_emb"), col("embedding")) / sqrt(col("q_nsq") * col("nsq")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= IvfTopK)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    annTopk(spark, sfDir).select(col("q_id"), col("vec_id"))
      .join(top, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        (col("n_hits").cast("double") / lit(IvfTopK.toDouble)).as("recall"))
  }

  val annLshRecallSql: String =
    s"""
    WITH w AS ($signWidthCteSql),
    e AS (
      SELECT vec_id, embedding,
             ${signCodeHiSql.replace("v[", "embedding[")} AS code_hi,
             ${signCodeSql.replace("v[", "embedding[")} AS code_lo,
             ${dotSql("embedding", "embedding")} AS nsq
      FROM embeddings
    ),
    banded AS (
      SELECT vec_id, b.band,
             ${signBandValSql("code_hi", "code_lo", "b.band")} AS bv
      FROM e CROSS JOIN w
             CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS b(band)
    ),
    hot AS (
      SELECT band, bv FROM banded GROUP BY band, bv HAVING count(*) > $SignBucketCap
    ),
    kept AS (
      SELECT banded.* FROM banded
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = banded.band AND h.bv = banded.bv)
    ),
    pb AS (
      SELECT vec_id AS q_id, band, bv FROM banded
      WHERE vec_id % 100 = 0 AND vec_id < $TopkQueryCap
    ),
    cand AS (
      SELECT DISTINCT p.q_id, c.vec_id
      FROM pb p JOIN kept c ON p.band = c.band AND p.bv = c.bv
      WHERE c.vec_id <> p.q_id
    ),
    scored AS (
      SELECT cd.q_id, cd.vec_id,
             round(${dotSql("q.embedding", "c.embedding")} / sqrt(q.nsq * c.nsq), 6) AS cos
      FROM cand cd
      JOIN e q ON cd.q_id = q.vec_id
      JOIN e c ON cd.vec_id = c.vec_id
    ),
    top AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
        FROM scored
      ) WHERE rk <= $IvfTopK
    ),
    ex AS (SELECT q_id, vec_id FROM ($annTopkSql))
    SELECT ex.q_id,
           CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / $IvfTopK.0 AS recall
    FROM ex LEFT JOIN top t ON ex.q_id = t.q_id AND ex.vec_id = t.vec_id
    GROUP BY ex.q_id"""

  // ---- q_lsh_calibration -----------------------------------------------

  /** The planted-truth bar for the sign lane's pair recall evidence —
    * the cos ≥ 0.42 near-dup regime SimilarityRecallSpec pins at a
    * 0.8 floor on sf0.001 (the regime the lane EXISTS for; the
    * organic cos-0.3 tail decays by design at grown widths, which is
    * exactly what this report surfaces).
    */
  val LshTruthBar = 0.42

  /** Pair-recall target at [[LshTruthBar]] — between the measured
    * near-dup floors (0.74 clique recall at width 11, 0.8 at sf0.001's
    * width 4). A corpus whose geometry misses it still runs — the row
    * records `target_met = false`, the `q_ivf_calibration` discipline.
    */
  val LshPairRecallTargetPpm = 700000L

  /** q_lsh_calibration: the sign lane's width DECISION as a first-class
    * relation — the `q_ivf_calibration` discipline applied to the LSH
    * lane (r15 Next #4). One row: corpus n, the ladder width r(n), the
    * bucket histogram's p95 occupancy, the hot-bucket drop count, the
    * post-drop pair volume against [[SignPairVolumeBudget]], and the
    * measured pair recall at the [[LshTruthBar]] planted-truth bar on
    * the [[TopkQueryCap]]-bounded probe set. The monitoring row a
    * 100 TB pipeline reads before trusting `q_ann_lsh`'s candidates:
    * the width policy's organic low-cosine tail decay (p^r) is
    * SURFACED here per corpus instead of inherited as a default.
    * Unlike the IVF twin nothing needs freezing — the sign code is
    * deterministic, so the oracle RECOMPUTES every column from the
    * parquet (width ladder, histogram, volume pricing, probe-set
    * recall) with exact integer arithmetic end to end.
    *
    * Scale: the histogram legs aggregate the already-narrow band rows;
    * the p95 window runs over the histogram OF BUCKET SIZES (≤ max
    * bucket distinct values, not one row per bucket), so the single-
    * partition window is metadata-sized at any n. The truth leg is the
    * same declared O(probes · n) bounded scan as [[annTopk]]; the
    * driver-side reads are three single-row aggregates (the
    * adjudicated bounded-collect class).
    */
  def lshCalibrationReport(spark: SparkSession, sfDir: String): DataFrame =
    // computed per call (round-17: a registered query must execute its
    // plan per invocation — r16 memoized this query's own evidence row
    // and the bench median timed a cached readout). The shared
    // snapshot-stat memos the chain reads (sign band stats, the kept
    // bucket sets) stay; the evidence actions themselves run here.
    computeLshCalibrationReport(spark, sfDir)

  private def computeLshCalibrationReport(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        signCodeHi(col("embedding")).as("code_hi"),
        signCode(col("embedding")).as("code_lo"),
        dot(col("embedding"), col("embedding")).as("nsq"))
      .mat
    // the corpus size is the memoized snapshot scalar every sign lane
    // reads (the annLshRecall convention) — not a per-call count job
    val n = embeddingsCount(spark, sfDir)
    val r = signBandWidthOf(n)
    val banded = signBandRows(emb, Seq("vec_id"), r)
    val counts = banded.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("c"))
    // post-drop pricing, the signKeptBands convention: hot buckets are
    // dropped whole by the lane, so they price at zero, not C(cap, 2)
    val keptC = when(col("c") > SignBucketCap, lit(0L)).otherwise(col("c"))
    // ONE driver action for the whole histogram evidence (round-17: the
    // report's wall was ~7 sequential single-row actions over ~150 ms
    // of actual compute): volume pricing and the exact p95 occupancy —
    // smallest size s with ≥ ceil(0.95·buckets) buckets at or under s,
    // integer threshold (19m+19) DIV 20 exactly as before — ride the
    // same plan via a broadcast of the single volume row.
    val volAgg = counts.agg(
      coalesce(sum(shiftright(keptC * (keptC - lit(1L)), 1)), lit(0L)).as("pair_volume"),
      coalesce(sum(when(col("c") > SignBucketCap, 1L).otherwise(0L)), lit(0L)).as("n_hot"),
      count(lit(1)).as("n_buckets"))
    val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("k"))
    val histPlan = hist
      .withColumn("cum", sum(col("k")).over(Window.orderBy(col("c"))))
      .crossJoin(broadcast(volAgg))
      .filter(col("cum") >= expr("(19 * n_buckets + 19) DIV 20"))
      .agg(first(col("pair_volume")).as("pair_volume"),
        first(col("n_hot")).as("n_hot"),
        first(col("n_buckets")).as("n_buckets"),
        min(col("c")).as("p95"))
    // recall evidence at the planted-truth bar: search the index AS
    // SHIPPED (stop-loss applied; volume budget is the PAIR lane's,
    // probe joins are probe-bounded — disabled, the annLshRecall rule)
    val kept = signKeptBands(banded, "q_lsh_calibration",
      budget = Long.MaxValue, statsKey = Some(signStatsKey(spark, sfDir, r)))
    val probes = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < TopkQueryCap)
    val probeBands = signBandRows(probes, Seq("vec_id"), r)
      .select(col("vec_id").as("q_id"), col("band"), col("bv"))
    val cand = broadcast(probeBands).join(kept, Seq("band", "bv"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val truth = broadcast(probes.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("nsq").as("q_nsq")))
      .join(emb, col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        round(dot(col("q_emb"), col("embedding")) / sqrt(col("q_nsq") * col("nsq")), 6))
      .filter(col("cos") >= LshTruthBar)
      .select(col("q_id"), col("vec_id"))
    // ONE driver action for the recall evidence: truth count and hit
    // count from the same left join (a hit is a truth pair the kept
    // candidate set also produced); the two evidence actions are
    // independent, so they run as concurrent jobs (guide §2.6) — wall
    // is max(leg), not sum
    val recallPlan = truth.as("t")
      .join(cand.as("h"),
        col("t.q_id") === col("h.q_id") && col("t.vec_id") === col("h.vec_id"),
        "left")
      .agg(count(lit(1)).as("n_truth"), count(col("h.q_id")).as("n_hit"))
    val (histRow, recallRow) =
      graft.core.Jobs.concurrently(spark, histPlan.head(), recallPlan.head())
    val pairVolume = histRow.getLong(0)
    val nHot = histRow.getLong(1)
    val nBuckets = histRow.getLong(2)
    val p95 = histRow.getLong(3)
    val nTruth = recallRow.getLong(0)
    val nHit = recallRow.getLong(1)
    val recallPpm = if (nTruth == 0) 0L else 1000000L * nHit / nTruth
    val targetMet = nTruth > 0 && 1000000L * nHit >= LshPairRecallTargetPpm * nTruth
    import spark.implicits._
    Seq((n, r.toLong, nBuckets, p95, nHot, pairVolume, SignPairVolumeBudget,
        pairVolume <= SignPairVolumeBudget, nTruth, nHit, recallPpm, targetMet))
      .toDF("n", "width", "n_buckets", "p95_bucket", "n_hot", "pair_volume",
        "budget", "volume_ok", "n_truth_pairs", "n_hit_pairs", "recall_ppm",
        "target_met")
  }

  /** DuckDB oracle for q_lsh_calibration — recomputes the full
    * evidence chain (ladder width, bucket histogram, p95, post-drop
    * volume, probe-set pair recall) from the parquet; integer
    * arithmetic end to end.
    */
  val lshCalibrationReportSql: String =
    s"""
    WITH w AS ($signWidthCteSql),
    e AS (
      SELECT vec_id, embedding,
             ${signCodeHiSql.replace("v[", "embedding[")} AS code_hi,
             ${signCodeSql.replace("v[", "embedding[")} AS code_lo,
             ${dotSql("embedding", "embedding")} AS nsq
      FROM embeddings
    ),
    banded AS (
      SELECT vec_id, b.band,
             ${signBandValSql("code_hi", "code_lo", "b.band")} AS bv
      FROM e CROSS JOIN w
             CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS b(band)
    ),
    counts AS (SELECT band, bv, count(*) AS c FROM banded GROUP BY 1, 2),
    vol AS (
      SELECT CAST(COALESCE(sum(CASE WHEN c > $SignBucketCap THEN 0
                                    ELSE (c * (c - 1)) // 2 END), 0) AS BIGINT) AS pair_volume,
             CAST(COALESCE(sum(CASE WHEN c > $SignBucketCap THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hot,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM counts
    ),
    p95 AS (
      SELECT CAST(min(c) AS BIGINT) AS p95_bucket FROM (
        SELECT c, sum(k) OVER (ORDER BY c) AS cum FROM
          (SELECT c, count(*) AS k FROM counts GROUP BY c)
      ) WHERE cum >= (SELECT (19 * count(*) + 19) // 20 FROM counts)
    ),
    hot AS (
      SELECT band, bv FROM counts WHERE c > $SignBucketCap
    ),
    kept AS (
      SELECT banded.* FROM banded
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = banded.band AND h.bv = banded.bv)
    ),
    pb AS (
      SELECT vec_id AS q_id, band, bv FROM banded
      WHERE vec_id % 100 = 0 AND vec_id < $TopkQueryCap
    ),
    cand AS (
      SELECT DISTINCT p.q_id, c.vec_id
      FROM pb p JOIN kept c ON p.band = c.band AND p.bv = c.bv
      WHERE c.vec_id <> p.q_id
    ),
    truth AS (
      SELECT q.vec_id AS q_id, v.vec_id
      FROM e q JOIN e v ON v.vec_id <> q.vec_id
      WHERE q.vec_id % 100 = 0 AND q.vec_id < $TopkQueryCap
        AND round(${dotSql("q.embedding", "v.embedding")} / sqrt(q.nsq * v.nsq), 6)
              >= $LshTruthBar
    ),
    ev AS (
      SELECT CAST(count(*) AS BIGINT) AS n_truth,
             CAST(COALESCE(sum(CASE WHEN c.q_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
      FROM truth t LEFT JOIN cand c ON t.q_id = c.q_id AND t.vec_id = c.vec_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n,
           CAST(w.r AS BIGINT) AS width,
           vol.n_buckets, p95.p95_bucket, vol.n_hot, vol.pair_volume,
           CAST($SignPairVolumeBudget AS BIGINT) AS budget,
           vol.pair_volume <= $SignPairVolumeBudget AS volume_ok,
           ev.n_truth AS n_truth_pairs, ev.n_hit AS n_hit_pairs,
           CAST(CASE WHEN ev.n_truth = 0 THEN 0
                     ELSE (1000000 * ev.n_hit) // ev.n_truth END AS BIGINT) AS recall_ppm,
           ev.n_truth > 0 AND 1000000 * ev.n_hit >= $LshPairRecallTargetPpm * ev.n_truth AS target_met
    FROM w, vol, p95, ev"""

  // ---- q_knn_graph ---------------------------------------------------

  /** Neighbors per node in the kNN graph. */
  val KnnK = 3

  /** Per-cell candidate CORE size for the cell-scoped pair families
    * (kNN graph, SemDeDup): only the [[KnnCellCap]] most prototypical
    * members of a cell (smallest distance-to-centroid, vec_id
    * tie-break) serve as the candidate side, so a giant skewed cell
    * costs |cell|·cap comparisons instead of |cell|² — the one 100 TB
    * hazard the plain cell self-join left open. 512 is far above any
    * gate-scale cell (the cap binds only on pathological clusters;
    * SkewSpec proves the bound on a planted one), and neighbors/dup
    * prototypes concentrate near the centroid, so the recall floors
    * hold (SimilarityRecallSpec).
    */
  val KnnCellCap = 512

  /** q_knn_graph: cell-scoped k-nearest-neighbor graph over the
    * embedding corpus — the scaffold graph-based curation runs on
    * (density/diversity clustering, graph dedup, label propagation):
    * every vector gets its [[KnnK]] nearest neighbors WITHIN its IVF
    * cell by exact cosine, plus the `mutual` flag (the reverse edge is
    * also a top-k edge — mutual-kNN is the standard symmetrization that
    * drops hub edges before clustering) and `src_in_core` (whether the
    * source sits inside its cell's [[KnnCellCap]] candidate core — a
    * non-core source is structurally ineligible as anyone's candidate,
    * so its mutual = false means "capped out", not "rejected").
    *
    * Scale: assignment is the [[annIvf]] codegen literal-centroid pass;
    * candidate generation is one equi join on the cell key against the
    * cell's prototypical CORE (crk ≤ [[KnnCellCap]] by
    * distance-to-centroid — per-cell fanout |cell|·cap, never the
    * |cell|² self-join, so a planted giant cluster stays linear:
    * SkewSpec), the top-k window partitions by source node, and the
    * mutual check is a self equi-join of the (|V|·k)-row edge list on
    * the reversed key. The complementary dial remains more cells
    * (k ~ √n), exactly the IVF sizing rule.
    */
  def knnGraph(spark: SparkSession, sfDir: String): DataFrame =
    knnGraphCapped(spark, sfDir, KnnCellCap)

  /** [[knnGraph]] with an explicit candidate-core size — exposed so
    * SkewSpec can prove the bound with a cap small enough to bind on
    * spec-sized planted clusters.
    */
  def knnGraphCapped(spark: SparkSession, sfDir: String, cellCap: Int): DataFrame =
    knnGraphOnAssigned(assignedCells(spark, sfDir), cellCap)

  /** The core+join+top-k+mutual pipeline over any
    * (vec_id, cell, d2, embedding, nsq) assignment relation — exposed
    * so SkewSpec-style tests can plant a giant single cell without
    * going through the KMeans fit.
    */
  private[pipeline] def knnGraphOnAssigned(assigned: DataFrame, cellCap: Int): DataFrame = {
    val cw = Window.partitionBy(col("cell")).orderBy(col("d2").asc, col("vec_id").asc)
    // ranked once, read by BOTH join sides: the b-side keeps only the
    // core, the a-side carries `src_in_core` so the cap's effect on the
    // mutual flag is visible in the output — a node OUTSIDE its cell's
    // core can never be anyone's candidate, so every edge it sources
    // reports mutual = false STRUCTURALLY (ineligible), not because the
    // reverse edge lost the top-k race. Consumers symmetrizing on
    // mutual = true must treat src_in_core = false rows as "cap-eligible
    // sinks", not as rejected neighbors; the flag makes the two cases
    // distinguishable downstream (ADVICE r8).
    val ranked = assigned
      .withColumn("crk", row_number().over(cw))
      .select(col("vec_id"), col("cell"), col("embedding"), col("nsq"),
        (col("crk") <= cellCap).as("in_core"))
    val core = ranked.filter(col("in_core"))
      .select(col("vec_id"), col("cell"), col("embedding"), col("nsq"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
    // the (|V|·k)-row edge list is read twice (forward + reversed side
    // of the mutual join); persist so the cell join runs once
    val edges = ranked.as("a")
      .join(core.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        round(dot(col("a.embedding"), col("b.embedding"))
          / sqrt(col("a.nsq") * col("b.nsq")), 6).as("cos"),
        col("a.in_core").as("src_in_core"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= KnnK)
    edges.as("e")
      .join(edges.select(col("src").as("r_src"), col("dst").as("r_dst")).as("r"),
        col("e.src") === col("r.r_dst") && col("e.dst") === col("r.r_src"), "left")
      .select(col("e.src"), col("e.rk"), col("e.dst"), col("e.cos"),
        col("r.r_src").isNotNull.as("mutual"), col("e.src_in_core"))
  }

  /** DuckDB oracle for q_knn_graph (post-fit; None → rows-only): the
    * shared frozen-centroid assignment prefix, the cell-scoped top-k,
    * and the reversed-edge join.
    */
  def knnGraphOracleSql: Option[String] =
    ivfFrozen.map { centers =>
      s"""
    WITH ${ivfAssignCtesSql(centers)},
    rankedv AS (
      SELECT vec_id, cell, embedding, nsq,
             row_number() OVER (PARTITION BY cell ORDER BY d2 ASC, vec_id ASC)
               <= $KnnCellCap AS in_core
      FROM assigned
    ),
    core AS (
      SELECT vec_id, cell, embedding, nsq FROM rankedv WHERE in_core
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(${dotSql("a.embedding", "b.embedding")} / sqrt(a.nsq * b.nsq), 6) AS cos,
             a.in_core AS src_in_core
      FROM rankedv a JOIN core b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    edges AS (
      SELECT src, dst, cos, rk, src_in_core FROM (
        SELECT src, dst, cos, src_in_core,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
        FROM scored
      ) WHERE rk <= $KnnK
    )
    SELECT e.src, e.rk, e.dst, e.cos, (r.src IS NOT NULL) AS mutual, e.src_in_core
    FROM edges e LEFT JOIN edges r ON e.src = r.dst AND e.dst = r.src"""
    }

  // ---- q_hard_negatives ----------------------------------------------

  /** q_hard_negatives: contrastive-training negative mining — for each
    * query embedding, the most similar vectors carrying a DIFFERENT
    * label (the "hard negatives" an embedding-model trainer pairs with
    * each anchor). Identical machinery to [[annIvf]] — frozen coarse
    * cells, probe the [[ivfProbeOf]] nearest, exact cosine rank — plus
    * the label-mismatch predicate on the candidate join; the label
    * rides the same narrow candidate row, so the plan shape (one
    * cell-keyed equi join + per-query window) is unchanged at any
    * corpus size.
    */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nsq"))
    val centers = ivfCenters(spark, sfDir)
    val assigned = emb
      .withColumn("cell",
        graft.functions.VectorFunctions
          .nearestCenter(col("embedding"), 0, centers.head.length, centers)
          .getField("code"))
      .select(col("vec_id"), col("label"), col("cell"), col("embedding"), col("nsq"))
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .withColumn("probe", explode(probeCells(centers, ivfProbeOf(centers.length))))
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nsq").as("q_nsq"), col("probe.cell").as("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    probes.join(assigned, "cell") // equi join on the cell key — the only shuffle
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cos",
        round(dot(col("q_emb"), col("embedding")) / sqrt(col("q_nsq") * col("nsq")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= IvfTopK)
      .select(col("q_id"), col("q_label"), col("rk"), col("vec_id"),
        col("label"), col("cos"))
  }

  /** DuckDB oracle for q_hard_negatives (post-fit; None → rows-only):
    * [[annIvfOracleSql]]'s pipeline with labels carried through and the
    * mismatch predicate on the candidate join.
    */
  def hardNegativesOracleSql: Option[String] =
    ivfFrozen.map { centers =>
      s"""
    WITH cents(cell, cc, cv) AS (VALUES
      ${centroidValuesSql(centers)}),
    e AS (
      SELECT vec_id, label, embedding, ${dotSql("embedding", "embedding")} AS nsq
      FROM embeddings
    ),
    ranked AS (
      SELECT vec_id, label, embedding, nsq, cell, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crk
      FROM (
        SELECT e.vec_id, e.label, e.embedding, e.nsq, c.cell,
               greatest((e.nsq - CAST(2 AS DOUBLE) * ${dotCvSql("e.embedding", "c.cv")}) + c.cc,
                        CAST(0 AS DOUBLE)) AS d2
        FROM e CROSS JOIN cents c
      )
    ),
    assigned AS (SELECT vec_id, label, embedding, nsq, cell FROM ranked WHERE crk = 1),
    probes AS (
      SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb, nsq AS q_nsq, cell
      FROM ranked WHERE vec_id % 100 = 0 AND crk <= ${ivfProbeOf(centers.length)}
    ),
    scored AS (
      SELECT p.q_id, p.q_label, a.vec_id, a.label,
             round(${dotSql("p.q_emb", "a.embedding")} / sqrt(p.q_nsq * a.nsq), 6) AS cos
      FROM probes p JOIN assigned a
        ON p.cell = a.cell AND a.vec_id <> p.q_id AND a.label <> p.q_label
    )
    SELECT q_id, q_label, rk, vec_id, label, cos FROM (
      SELECT q_id, q_label, vec_id, label, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored
    ) WHERE rk <= $IvfTopK"""
    }

  // ---- q_semantic_dedup ----------------------------------------------

  /** Cosine bar for a semantic duplicate — matches [[embedDedup]]'s
    * near-dup threshold so the two operators' verdicts are comparable.
    */
  val SemDedupThreshold = 0.4

  /** q_semantic_dedup: SemDeDup-style cluster-scoped semantic dedup
    * (Abbas et al. 2023, "SemDeDup" — public arXiv 2303.09540): assign
    * every embedding to its nearest frozen-KMeans cell, rank cell
    * members by prototypicality (distance to centroid, vec_id
    * tie-break), and DROP a vector when a better-ranked cell-mate is
    * semantically equivalent (cosine >= [[SemDedupThreshold]]). The
    * keeper rule is what distinguishes this from [[embedDedup]]'s flat
    * pair list: each duplicate group resolves toward its most
    * prototypical member, so the survivor set is diverse by
    * construction.
    *
    * Scale: the quadratic danger in SemDeDup is the within-cluster
    * all-pairs compare. This implementation never forms it — candidate
    * pairs come from the SAME sign-LSH band buckets as [[annLsh]]
    * (equi join on (band, bv, cell)) with the keeper side capped
    * at the cell's prototypical core (rk ≤ [[KnnCellCap]] — a skewed
    * giant cell stays |cell|·cap, never |cell|²), deduplicated as
    * narrow (id, id) rows BEFORE the 64-float payload gather, then
    * cosine-verified. Assignment + ranking are codegen literal-centroid
    * arithmetic and one cell-partitioned window; the only shuffles are
    * the band key and the cell window. The KMeans fit is the memoized
    * [[ivfCenters]] sample fit.
    */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val centers = ivfCenters(spark, sfDir)
    // codes/norms consumed by the band explode and two pair-side
    // gathers; persist so signCode runs once per vector (annLsh's
    // discipline). Self-releasing Mat boundary, no harness discipline.
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        signCodeHi(col("embedding")).as("code_hi"),
        signCode(col("embedding")).as("code_lo"),
        dot(col("embedding"), col("embedding")).as("nsq"))
    val w = Window.partitionBy(col("cell")).orderBy(col("d2").asc, col("vec_id").asc)
    val ranked = emb
      .withColumn("best",
        graft.functions.VectorFunctions
          .nearestCenter(col("embedding"), 0, centers.head.length, centers))
      .select(col("vec_id"), col("embedding"), col("code_hi"), col("code_lo"), col("nsq"),
        col("best.code").as("cell"), col("best.d2").as("d2"))
      .withColumn("rk", row_number().over(w))
      .mat
    // ranked is row-1:1 with embeddings (no filter above the window),
    // so the width sizes from the memoized corpus count — the per-call
    // count job over the checkpoint is gone
    val r = signBandWidthOf(embeddingsCount(spark, sfDir))
    // narrow (band, bv, cell)-keyed self-join; pairs dedup'd as ids
    // before the payload gather, exactly like annLsh
    val bandedTagged = signBandRows(ranked, Seq("vec_id", "cell", "rk"), r)
    // keeper side capped at the cell's prototypical core (rk ≤
    // KnnCellCap): a giant skewed cell generates |cell|·cap candidates
    // per band bucket instead of |cell|² — dup groups resolve toward
    // their most prototypical members anyway, so the core IS where
    // keepers live (SemDeDup's keeper rule, made skew-safe)
    val cand = bandedTagged.as("a")
      .join(bandedTagged.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.cell") === col("b.cell") && col("a.rk") < col("b.rk") &&
          col("a.rk") <= KnnCellCap)
      .select(col("a.vec_id").as("id_keep"), col("b.vec_id").as("id_dup"))
      .distinct()
    val dropped = cand
      .join(ranked.as("ea"), col("id_keep") === col("ea.vec_id"))
      .join(ranked.as("eb"), col("id_dup") === col("eb.vec_id"))
      .withColumn("cos",
        round(dot(col("ea.embedding"), col("eb.embedding")) / sqrt(col("ea.nsq") * col("eb.nsq")), 6))
      .filter(col("cos") >= SemDedupThreshold)
      .select(col("id_dup")).distinct()
    ranked
      .join(dropped, col("vec_id") === col("id_dup"), "left")
      .select(col("vec_id"), col("cell"), col("rk"), col("id_dup").isNull.as("kept"))
  }

  /** DuckDB oracle for q_semantic_dedup — same frozen-centroid contract
    * as [[annIvfOracleSql]]: available once the IVF fit has run in this
    * JVM, refuses to render after fits on two datasets.
    */
  def semanticDedupOracleSql: Option[String] = {
    FrozenFit.single(ivfFits, "IVF centroids").map { centers =>
      s"""
    WITH cents(cell, cc, cv) AS (VALUES
      ${centroidValuesSql(centers)}),
    w AS ($signWidthCteSql),
    e AS (
      SELECT vec_id, embedding,
             ${signCodeHiSql.replace("v[", "embedding[")} AS code_hi,
             ${signCodeSql.replace("v[", "embedding[")} AS code_lo,
             ${dotSql("embedding", "embedding")} AS nsq
      FROM embeddings
    ),
    celled AS (
      SELECT vec_id, embedding, code_hi, code_lo, nsq, cell, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crk
      FROM (
        SELECT e.vec_id, e.embedding, e.code_hi, e.code_lo, e.nsq, c.cell,
               greatest((e.nsq - CAST(2 AS DOUBLE) * ${dotCvSql("e.embedding", "c.cv")}) + c.cc,
                        CAST(0 AS DOUBLE)) AS d2
        FROM e CROSS JOIN cents c
      )
    ),
    ranked AS (
      SELECT vec_id, embedding, code_hi, code_lo, nsq, cell, d2,
             row_number() OVER (PARTITION BY cell ORDER BY d2 ASC, vec_id ASC) AS rk
      FROM celled WHERE crk = 1
    ),
    banded AS (
      SELECT vec_id, cell, rk, embedding, nsq, b.band,
             ${signBandValSql("code_hi", "code_lo", "b.band")} AS bv
      FROM ranked CROSS JOIN w
             CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS b(band)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_keep, b.vec_id AS id_dup,
             a.embedding AS emb_a, b.embedding AS emb_b, a.nsq AS na, b.nsq AS nb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bv = b.bv AND a.cell = b.cell AND a.rk < b.rk
           AND a.rk <= $KnnCellCap
    ),
    dropped AS (
      SELECT DISTINCT id_dup FROM cand
      WHERE round(${dotSql("emb_a", "emb_b")} / sqrt(na * nb), 6) >= $SemDedupThreshold
    )
    SELECT r.vec_id, r.cell, r.rk, (d.id_dup IS NULL) AS kept
    FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.id_dup"""
    }
  }

  // ---- q_embed_incremental ---------------------------------------------

  /** q_embed_incremental: INCREMENTAL semantic-cluster maintenance —
    * the [[Dedup.componentsIncremental]] operation on the VECTOR side,
    * closing the incremental matrix (text, image, and audio already
    * maintain clusters through [[Dedup.quotientMerge]]; the embed
    * modality recomputed `q_semantic_dedup`'s clusters from scratch per
    * crawl). Snapshot A (even vec ids, the estate) has materialized
    * cluster labels over its semantic-dup edges; snapshot B (odd)
    * arrives with its internal edges and its bridges into A; the
    * resolver runs over the QUOTIENT only (B nodes + bridge-touched A
    * roots — snapshot-sized, never estate-sized).
    *
    * Edges are the estate indexes' own candidate discipline, per leg:
    *  - lane edges (within A, within B): the persisted
    *    [[graft.sources.EmbedIndex]] snapshot tables self-join on the
    *    estate CELL with the lower-ranked side capped at the cell's
    *    prototypical core (stored `rk` ≤ [[KnnCellCap]] — the
    *    [[semanticDedup]] keeper discipline on the stored rank), exact
    *    cosine ≥ [[SemDedupThreshold]] verified in the join projection;
    *  - bridges (B → A): [[graft.sources.EmbedIndex.crossSnapshotPairs]]
    *    verbatim — the same leg the cross-snapshot sweep and the live
    *    admission ride, so the incremental clusters can never disagree
    *    with the gates about what matched.
    *
    * The DuckDB oracle recomputes everything FROM SCRATCH as one
    * recursive CTE over the same three edge relations under the frozen
    * estate centroids — quotient == full is a theorem the hash gate
    * re-proves per run (the `q_profile_incremental` contract). Both
    * snapshot indexes are cell-bucketed, so the lane self-joins and the
    * bridge join are exchange-free; the merged labels persist per
    * dataset ([[graft.core.DatasetStore]]) and memoize per application.
    */
  def embedIncremental(spark: SparkSession, sfDir: String): DataFrame =
    embedMergedMemo.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}|$sfDir",
      graft.core.DatasetStore.persisted(spark, sfDir, "embed_merged_state",
        version = s"1:$KnnCellCap:$SemDedupThreshold")(
        computeEmbedIncremental(spark, sfDir)))

  private val embedMergedMemo = new graft.core.Memo("embed_merged_state")
  private val embedEstateMemo = new graft.core.Memo("embed_estate_components")

  /** Test seam: forget the memoized incremental artifacts (specs that
    * rebuild a dataset must call this — the Memo-estate contract).
    */
  private[graft] def resetEmbedIncrementalMemos(): Unit = {
    embedMergedMemo.clear()
    embedEstateMemo.clear()
  }

  /** The three edge legs (A-lane pairs, B-lane pairs, B→A bridges) —
    * the seam the from-scratch spec re-clusters over.
    */
  private[graft] def embedIncrementalEdges(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) = {
    val (ta, tb) = graft.sources.EmbedIndex.snapshotTables(spark, sfDir)
    def lanePairs(t: String): DataFrame = {
      val i = spark.table(t)
        .select(col("cell"), col("rk"), col("vec_id"), col("embedding"), col("nsq"))
      i.as("a").join(i.as("b"),
          col("a.cell") === col("b.cell") && col("a.rk") < col("b.rk") &&
            col("a.rk") <= KnnCellCap)
        .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"),
          round(dot(col("a.embedding"), col("b.embedding"))
            / sqrt(col("a.nsq") * col("b.nsq")), 6).as("cos"))
        .filter(col("cos") >= SemDedupThreshold)
        .select(col("doc_a"), col("doc_b"))
    }
    val bridges = graft.sources.EmbedIndex.crossSnapshotPairs(spark, ta, tb)
      .select(col("vec_id").as("b_doc"), col("corpus_vec").as("a_doc"))
      .distinct()
    (lanePairs(ta), lanePairs(tb), bridges)
  }

  private def computeEmbedIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val (aPairs, bPairs, bridges) = embedIncrementalEdges(spark, sfDir)
    val aLabels = embedEstateMemo.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}|$sfDir",
      Dedup.componentsOfPairs(aPairs)
        .select(col("doc_id"), col("cluster_root"))
        .localCheckpoint(eager = true))
    Dedup.quotientMerge(aLabels, bPairs, graft.core.Mat(bridges))
      .select(col("doc_id").as("vec_id"), col("cluster_root"), col("cluster_size"))
  }

  /** DuckDB oracle for q_embed_incremental — the from-scratch
    * recursive-CTE re-clustering over the same three edge legs under
    * the frozen estate centroids (post-fit, the [[estateFrozen]]
    * contract).
    */
  def embedIncrementalOracleSql: Option[String] =
    estateFrozen.map { centers =>
      def lane(parity: Int, rk: String, p: String): String =
        s"""$rk AS (
      SELECT vec_id, embedding, nsq, cell,
             row_number() OVER (PARTITION BY cell ORDER BY d2 ASC, vec_id ASC) AS rk
      FROM asg WHERE vec_id % 2 = $parity
    ),
    $p AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM $rk a JOIN $rk b ON a.cell = b.cell AND a.rk < b.rk AND a.rk <= $KnnCellCap
      WHERE round(${dotSql("a.embedding", "b.embedding")}
                  / sqrt(a.nsq * b.nsq), 6) >= $SemDedupThreshold
    )"""
      s"""
    WITH RECURSIVE cents(cell, cc, cv) AS (VALUES
      ${centroidValuesSql(centers)}),
    e AS (
      SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nsq
      FROM embeddings
    ),
    celled AS (
      SELECT vec_id, embedding, nsq, cell, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crk
      FROM (
        SELECT e.vec_id, e.embedding, e.nsq, c.cell,
               greatest((e.nsq - CAST(2 AS DOUBLE) * ${dotCvSql("e.embedding", "c.cv")}) + c.cc,
                        CAST(0 AS DOUBLE)) AS d2
        FROM e CROSS JOIN cents c
      )
    ),
    asg AS (SELECT vec_id, embedding, nsq, cell, d2 FROM celled WHERE crk = 1),
    ${lane(0, "rkA", "pA")},
    ${lane(1, "rkB", "pB")},
    br AS (
      SELECT b.vec_id AS doc_a, a.vec_id AS doc_b
      FROM rkB b JOIN rkA a ON b.cell = a.cell AND a.rk <= $KnnCellCap
      WHERE round(${dotSql("b.embedding", "a.embedding")}
                  / sqrt(b.nsq * a.nsq), 6) >= ${graft.sources.EmbedIndex.Tau}
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM pA UNION ALL SELECT doc_a, doc_b FROM pB
      UNION ALL SELECT doc_a, doc_b FROM br
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e2.b, r.lab FROM reach r JOIN edges e2 ON e2.a = r.node
    ),
    comp AS (SELECT node AS vec_id, min(lab) AS cluster_root FROM reach GROUP BY 1)
    SELECT c.vec_id, c.cluster_root, s.cluster_size
    FROM comp c JOIN (
      SELECT cluster_root, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1
    ) s ON c.cluster_root = s.cluster_root"""
    }

  // ---- q_pca_project -------------------------------------------------

  /** Output dimensionality of the PCA projection. */
  val PcaDims = 8

  /** Fitted principal components, keyed by dataset dir: PcaDims vectors
    * of input-dim doubles (the frozen-fit pattern — see [[ivfFits]]).
    */
  private val pcaFits =
    scala.collection.concurrent.TrieMap.empty[String, IndexedSeq[Array[Double]]]

  /** Test seam: the fitted components for one dataset. */
  private[pipeline] def pcaComponents(sfDir: String): Option[IndexedSeq[Array[Double]]] =
    pcaFits.get(sfDir)

  /** Test seam: drop all frozen PCA fits (multi-dataset specs must
    * reset so the single-dataset oracle guard stays meaningful).
    */
  private[pipeline] def resetPcaFits(): Unit = pcaFits.clear()

  /** Test seam: drop all frozen IVF fits (same contract). */
  private[pipeline] def resetIvfFits(): Unit = {
    ivfFits.clear()
    ivfCalibrations.clear()
    // derived-from-the-fit materializations must fall with the fit:
    // a spec that rewrites a dataset dir in place would otherwise read
    // a stale assignment/truth checkpoint against fresh centroids
    assignedCellsMemo.clear()
    annTopkMemo.clear()
    signPairsMemo.clear()
  }

  /** Dev instrument (spec-only): per probe, the sorted-cell d2/d2min
    * ratio at each rank — the raw signal the [[IvfProbeSlackSq]] gate
    * reads, surfaced so the slack constant is CHOSEN from measured
    * geometry, not guessed.
    */
  private[pipeline] def ivfD2Ratios(spark: SparkSession, sfDir: String): DataFrame = {
    val centers = ivfCenters(spark, sfDir)
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0)
      .withColumn("probes", probeCells(centers, ivfProbeOf(centers.length)))
      .withColumn("d2min", element_at(col("probes"), 1).getField("d2"))
      .select(col("vec_id"), col("d2min"),
        posexplode(col("probes")).as(Seq("pp", "probe")))
      .select(col("vec_id"), col("pp"),
        (col("probe.d2") / greatest(col("d2min"), lit(1e-12))).as("ratio"))
  }

  /** The ESTATE quantizer: the [[ivfCenters]] fit computed over the
    * EVEN-vec_id half only — the codebook a 100 TB embedding estate
    * owns. Crawl N is assigned with the estate's frozen centers, never
    * with a fit of its own: cell-scoped verdicts are only comparable
    * inside one codebook, and re-fitting per crawl would silently
    * shift every historical cell boundary. Same auto-sizing and skew
    * re-fit discipline as [[ivfCenters]]; memoized per dataset, frozen
    * into the cross-snapshot oracle via [[estateFrozen]].
    */
  private val estateFits =
    scala.collection.concurrent.TrieMap.empty[String, IndexedSeq[Array[Double]]]

  private[graft] def estateCenters(spark: SparkSession, sfDir: String): IndexedSeq[Array[Double]] =
    estateFits.getOrElseUpdate(sfDir, {
      val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 2 === 0)
      val n = emb.count()
      val k = ivfCellsOf(n)
      val pts = KmeansFit.distinctSample(
        emb.filter(col("vec_id") % 3 === 0)
          .select(col("embedding").cast("array<double>").as("a")),
        col("a"))
      val first = KmeansFit.fit(pts, k, KmeansFit.Iters)
      val share = KmeansFit.maxSharePpm(pts, first)
      val threshold = IvfMaxShareMultiple * 1000000L / k
      val k2 = math.min(2 * k, IvfCellsMax)
      if (share > threshold && k2 > k) KmeansFit.fit(pts, k2, KmeansFit.Iters) else first
    })

  /** The frozen estate centroids (single-dataset oracle guard — the
    * [[ivfFrozen]] contract).
    */
  private[graft] def estateFrozen: Option[IndexedSeq[Array[Double]]] =
    FrozenFit.single(estateFits, "estate centroids")

  /** Test seam: drop all frozen estate fits (same contract). */
  private[graft] def resetEstateFits(): Unit = estateFits.clear()

  /** q_pca_project: dimensionality reduction for the embedding column —
    * the standard preprocessing step before an ANN index (smaller
    * vectors, cheaper distance evaluations, denser cells for IVF). The
    * MLlib PCA FIT is the only non-SQL step; the PROJECTION given
    * frozen components is PcaDims literal dot products per row — pure
    * whole-stage codegen via the native DotProduct expression, no UDF,
    * no shuffle, and [[pcaProjectOracleSql]] renders the identical
    * left-fold arithmetic so the stage is hash-gated like IVF/KMeans
    * scoring (Spark ML PCA projects x·V without mean-centering; the
    * oracle mirrors exactly that).
    *
    * Scale: fit cost is one covariance pass (Gram-matrix aggregation,
    * the MLlib shape) — at 100 TB, fit on a sample like the IVF
    * quantizer; apply is embarrassingly parallel projection.
    */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.embeddings(spark, sfDir)
    // fit once per dataset (the Bpe.mergesFor pattern — deterministic,
    // so caching changes nothing but work): without this, every
    // invocation re-ran the full Gram-matrix pass + eigendecomposition,
    // and q_ann_pca paid it a second time on top of q_pca_project
    val comps = pcaFits.getOrElseUpdate(sfDir, {
      import org.apache.spark.ml.feature.PCA
      import org.apache.spark.ml.functions.array_to_vector
      val fitInput = raw.select(
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
      val pc = new PCA().setK(PcaDims).setInputCol("features").setOutputCol("pca")
        .fit(fitInput).pc // column-major: numRows = input dim, numCols = PcaDims
      (0 until PcaDims).map(j => Array.tabulate(pc.numRows)(i => pc(i, j)))
    })
    val x = col("embedding").cast("array<double>")
    raw.select(col("vec_id") +: col("label").cast("long").as("label") +:
      comps.zipWithIndex.map { case (v, j) =>
        dot(x, typedLit(v.toSeq)).as(s"pc${j + 1}")
      }: _*)
  }

  // ---- q_ann_pca -----------------------------------------------------

  /** q_ann_pca: brute-force cosine top-k IN THE PROJECTED SPACE — what
    * [[pcaProject]] exists for: distance evaluations over
    * [[PcaDims]]-double vectors instead of 64, an 8× flop/byte cut per
    * candidate with recall pinned against the exact 64-dim baseline by
    * AnnPcaRecallSpec. Same capped-probe contract as [[annTopk]]
    * (every-100th vector, O(cap·n) never O(n²)); ranking by rounded
    * projected cosine with the vec_id tie-break.
    *
    * Scale: one projection pass (pure codegen), then the capped
    * scan-and-rank; at 100 TB this is the cheap re-rank layer under
    * IVF/LSH candidate generation.
    */
  def annPca(spark: SparkSession, sfDir: String): DataFrame = {
    val proj = pcaProject(spark, sfDir)
    val comps = pcaFits(sfDir)
    val pcArr = array((1 to comps.length).map(j => col(s"pc$j")): _*)
    val emb = proj.select(col("vec_id"), pcArr.as("p"))
      .select(col("vec_id"), col("p"), dot(col("p"), col("p")).as("nsq"))
    val queries = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < TopkQueryCap)
      .select(col("vec_id").as("q_id"), col("p").as("q_p"), col("nsq").as("q_nsq"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    queries.crossJoin(emb)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        round(dot(col("q_p"), col("p")) / sqrt(col("q_nsq") * col("nsq")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos"))
  }

  def annPcaOracleSql: Option[String] = {
    FrozenFit.single(pcaFits, "PCA components").map { comps =>
      val d = comps.length
      val pcs = comps.zipWithIndex.map { case (v, j) =>
        val lits = s"[${v.map(dlit).mkString(", ")}]"
        s"${dotCvSql("embedding", lits, v.length)} AS pc${j + 1}"
      }.mkString(",\n             ")
      val pList = s"[${(1 to d).map(j => s"pc$j").mkString(", ")}]"
      s"""
    WITH proj AS (
      SELECT vec_id,
             $pcs
      FROM embeddings
    ),
    e AS (
      SELECT vec_id, $pList AS p, ${dotSql(pList, pList, d)} AS nsq FROM proj
    ),
    q AS (
      SELECT vec_id AS q_id, p AS q_p, nsq AS q_nsq FROM e
      WHERE vec_id % 100 = 0 AND vec_id < $TopkQueryCap
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round(${dotSql("q.q_p", "e.p", d)} / sqrt(q.q_nsq * e.nsq), 6) AS cos
      FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, rk, vec_id, cos FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored
    ) WHERE rk <= 5"""
    }
  }

  /** Present once [[pcaProject]] has run in this JVM; refuses to render
    * after fits on two datasets (cf. [[annIvfOracleSql]]).
    */
  def pcaProjectOracleSql: Option[String] = {
    FrozenFit.single(pcaFits, "PCA components").map { comps =>
      val cols = comps.zipWithIndex.map { case (v, j) =>
        val lits = s"[${v.map(dlit).mkString(", ")}]"
        s"${dotCvSql("embedding", lits, v.length)} AS pc${j + 1}"
      }.mkString(",\n           ")
      s"""
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           $cols
    FROM embeddings"""
    }
  }
}
