package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches. [[graft.functions.BitmapDistinct]]
  * covers the dense-integer-domain case exactly; the KMV
  * (k-minimum-values) sketch here covers arbitrary domains with a
  * bounded-size summary — the deterministic cousin of HyperLogLog
  * (Bar-Yossef et al. 2002): keep the k smallest uniform hashes ever
  * seen; the k-th smallest estimates the density, so
  * `distinct ≈ (k−1)·2^60 / kth_hash`. Unlike HLL the sketch is
  * exactly reproducible from the data (md5 hashing, no randomness), so
  * the whole operator is oracle-checkable.
  */
object SketchQueries {

  /** Sketch size (minimum hashes kept per group). */
  val KmvK = 64

  /** Salt fan-out for the partial-sketch phase. */
  val KmvSalt = 32

  /** 2^60 as an exact double (the hash domain size). Shared with the
    * streaming form ([[graft.streaming.KmvState]]).
    */
  val Domain = 1152921504606846976.0

  /** Scalar KMV estimator — the single definition both the batch query
    * and the streaming state use: below-k sketches are exact.
    */
  def kmvEstimateOf(nHeld: Int, kth: Long, k: Int = KmvK): Double =
    if (nHeld < k) nHeld.toDouble
    else (k - 1).toDouble * Domain / kth.toDouble

  // ---- q_kmv_distinct ------------------------------------------------

  /** KMV distinct-count estimate of user-days per topic, alongside the
    * exact count for calibration.
    *
    * Scale: KMV sketches are mergeable — union the hash sets, keep the
    * k smallest. The plan exploits that: per-(topic, salt) partial
    * top-k first (32-way fan-out, each bucket keeps ≤ 64 hashes), then
    * the global top-k per topic over ≤ 64·32 survivors — a window over
    * ~2k rows per topic, never over the full distinct set. That is the
    * same partial-then-merge shape a 1000-executor cluster needs; the
    * unpartitioned alternative (rank ALL distinct hashes per topic)
    * would move every distinct value of a topic to one task.
    */
  def kmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    // round-16 probe record: a 32-way spread of this scan was tried
    // and REVERTED — the (topic, hv) dedup stage's CPU grew ~8× (the
    // 2 MB shuffle from 32 map tasks pays per-task fixed costs far
    // exceeding the serialized md5 it saved). Serial sub-second is
    // this query's sf0.1 floor; real input splits parallelize the scan.
    val ev = Tables.events(spark, sfDir).filter(col("event_type").isNotNull)
    val day = expr("unix_micros(ts) div 86400000000")
    val hv = conv(
      substring(md5(concat(col("user_id").cast("string"), lit(":"), day.cast("string"))), 1, 15),
      16, 10).cast("long")
    val h = ev.select(col("event_type").as("topic"), hv.as("hv"))
      .dropDuplicates("topic", "hv")
    // phase 1: partial sketches per (topic, salt)
    val partial = h
      .withColumn("salt", pmod(col("hv"), lit(KmvSalt)))
      .groupBy(col("topic"), col("salt"))
      .agg(slice(array_sort(collect_list(col("hv"))), 1, KmvK).as("top"))
      .select(col("topic"), explode(col("top")).as("hv"))
    // phase 2: merge — global k smallest per topic over the survivors
    val ranked = partial
      .withColumn("rn", row_number().over(Window.partitionBy(col("topic")).orderBy(col("hv"))))
      .filter(col("rn") <= KmvK)
    val kth = ranked.groupBy(col("topic"))
      .agg(max(col("hv")).as("kth_hash"), count(lit(1)).as("nk"))
    val exact = h.groupBy(col("topic")).agg(count(lit(1)).as("n_exact"))
    exact.as("e").join(broadcast(kth).as("k"), col("e.topic") === col("k.topic"))
      .select(
        col("e.topic").as("topic"),
        col("e.n_exact").as("n_exact"),
        col("k.kth_hash").as("kth_hash"),
        round(
          when(col("k.nk") < KmvK, col("k.nk").cast("double"))
            .otherwise(lit((KmvK - 1).toDouble) * lit(Domain) / col("k.kth_hash").cast("double")),
          6).as("kmv_estimate"),
      )
  }

  val kmvDistinctSql: String =
    s"""
    WITH h AS (
      SELECT DISTINCT event_type AS topic,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
                   CAST(epoch_us(ts) // 86400000000 AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM events WHERE event_type IS NOT NULL
    ),
    r AS (SELECT topic, hv, row_number() OVER (PARTITION BY topic ORDER BY hv) AS rn FROM h),
    kth AS (SELECT topic, max(hv) AS kth_hash, count(*) AS nk FROM r WHERE rn <= $KmvK GROUP BY 1),
    ex AS (SELECT topic, count(*) AS n_exact FROM h GROUP BY 1)
    SELECT e.topic, e.n_exact, k.kth_hash,
           round(CASE WHEN k.nk < $KmvK THEN CAST(k.nk AS DOUBLE)
                      ELSE ${KmvK - 1}.0 * $Domain / CAST(k.kth_hash AS DOUBLE) END, 6) AS kmv_estimate
    FROM ex e JOIN kth k ON e.topic = k.topic"""

  // ---- q_cms_topk ----------------------------------------------------

  /** Count-min sketch depth (independent hash rows). */
  val CmsDepth = 4

  /** Count-min sketch width (counters per row). */
  val CmsWidth = 256

  /** The CMS cell coordinate for hash row `r` and `key` — md5-derived
    * (engine-parity, like every hash in the suite). Shared by the batch
    * sketch and the streaming [[graft.streaming.CmsState]] JVM twin
    * ([[cmsCellJvm]]), which CmsStateSpec pins equal.
    */
  def cmsCell(r: Column, key: Column): Column = pmod(
    conv(substring(md5(concat(r.cast("string"), lit(":"), key.cast("string"))), 1, 15),
      16, 10).cast("long"),
    lit(CmsWidth.toLong))

  /** JVM evaluation of [[cmsCell]] for the streaming state fold — the
    * exact same md5("r:key") first-15-hex-chars mod width.
    */
  def cmsCellJvm(r: Int, key: Long, width: Int = CmsWidth): Int =
    cmsCellWith(java.security.MessageDigest.getInstance("MD5"), r, key, width)

  /** All depth cells of one key with a single digest instance — the
    * streaming hot-path form (per-call getInstance + format-string hex
    * would dominate the fold at ~100k msg/s).
    */
  def cmsCellsJvm(digest: java.security.MessageDigest, key: Long,
      depth: Int = CmsDepth, width: Int = CmsWidth): Array[Int] = {
    val out = new Array[Int](depth)
    var r = 0
    while (r < depth) { out(r) = cmsCellWith(digest, r, key, width); r += 1 }
    out
  }

  private def cmsCellWith(digest: java.security.MessageDigest, r: Int,
      key: Long, width: Int): Int = {
    digest.reset()
    val d = digest.digest(s"$r:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: fold the top 7 bytes and the
    // high nibble of the 8th (hex digit 15) into an unsigned long
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) >> 4) & 0xfL)
    (v % width).toInt
  }

  /** Candidate pool size for the CMS-driven heavy-hitter walk: the
    * top [[CmsCandidates]] keys by SKETCH estimate are the only keys
    * whose exact count is ever computed. 64 for a top-20 report leaves
    * a 3× collision-inflation margin (CMS error is one-sided, so a
    * truly heavy key can only be displaced by lighter keys whose
    * estimates were inflated ABOVE it — the spec cross-checks the pool
    * covers the exact top-20 at test scale).
    */
  val CmsCandidates = 64

  /** Count-min-sketch frequency estimates for the heaviest user_ids,
    * next to the exact counts (Cormode & Muthukrishnan 2005). Like the
    * KMV sketch the hashes are md5-derived, so the sketch is exactly
    * reproducible and oracle-checkable; the `cms_ge_exact` column pins
    * the CMS one-sided guarantee (estimate never undercounts).
    *
    * Scale: the sketch is a fixed $CmsDepth×$CmsWidth counter grid
    * built by ONE hash aggregation (map-side partials collapse each
    * partition to ≤ depth·width cells before the shuffle), and two CMS
    * sketches merge by cell-wise addition — the shape that survives a
    * 1000-executor fan-in. The candidate side is SKETCH-DRIVEN: the
    * key universe is a DISTINCT (narrow — no counting state), each
    * key's estimate is a broadcast lookup into the ≤ 1024-cell grid,
    * and the top-[[CmsCandidates]] by (estimate, key) — a TakeOrdered,
    * never a global sort — are the only keys whose exact counts are
    * then aggregated (broadcast semi-filter over the events, ≤ 64
    * groups). No full per-key count aggregate exists anywhere in the
    * plan; the operator's contract is "exact top-20 among the top-64
    * CMS-estimated keys", deterministic on both engines because the
    * estimate and the tie-break are. PlanSpec pins the shape; the
    * Round8 spec cross-checks the pool covers the unconditional exact
    * top-20 at test scale.
    *
    * Pool-truncation is DETECTABLE IN THE OUTPUT, not only at gate
    * scale: `pool_floor_est` is the pool's admission threshold (the
    * 64th-largest estimate) and `topk_guaranteed` certifies the
    * report — any key outside the pool has exact ≤ estimate ≤
    * pool_floor_est (one-sided CMS + top-by-estimate pool), so
    * pool_floor_est ≤ the reported 20th exact count proves no dropped
    * key can strictly beat a reported row. A key-distribution shift
    * that voids the covering property flips the flag to false instead
    * of silently dropping a heavy hitter.
    */
  def cmsTopk(spark: SparkSession, sfDir: String): DataFrame = {
    // all three legs (sketch build, candidate grid, exact survivors)
    // read ONLY user_id — one narrow projection, spread so the 4·n md5
    // cell computations stop running on the single unsplittable scan
    // task (measured 0.67 s of the wall; guide §2.6). The identical
    // subplan in all three legs lets exchange reuse pay the
    // repartition once. (The round-15 attempt spread each leg
    // separately — three repartitions — and measured worse; the shared
    // base is what makes it pay.)
    val ev = Tables.spread(
      Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
        .select(col("user_id")),
      col("user_id"))
    val rows = (0 until CmsDepth).map(lit(_))
    def cellOf(r: Column, key: Column): Column = cmsCell(r, key)
    // build: one pass, explode each event into its depth coordinates
    val sketch = ev
      .select(explode(array(rows.map(r => struct(r.as("r"), cellOf(r, col("user_id")).as("c"))): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cell"))
    // candidates: distinct keys -> min over the depth cells of the
    // broadcast grid -> top-CmsCandidates by (estimate desc, key asc)
    val candidates = ev.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(array(rows.map(r => struct(r.as("r"), cellOf(r, col("user_id")).as("c"))): _*)).as("rc"))
      .join(broadcast(sketch),
        col("rc.r") === col("r") && col("rc.c") === col("c"))
      .groupBy(col("user_id"))
      .agg(min(col("cell")).as("cms_estimate"))
      .orderBy(col("cms_estimate").desc, col("user_id").asc)
      .limit(CmsCandidates)
    // exact counts ONLY for the survivors: broadcast semi-filter, then
    // a <= CmsCandidates-group aggregation
    val exact = ev.join(broadcast(candidates.select(col("user_id"))), "user_id")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
    // pool-truncation detector (over the 64-row joined pool — windows
    // on a post-TakeOrdered relation, constant-size at any SF): any key
    // OUTSIDE the pool has exact ≤ estimate ≤ pool_floor_est (CMS is
    // one-sided and the pool is the top-64 by estimate), so when
    // pool_floor_est ≤ the reported 20th exact count, no dropped key
    // can strictly beat a reported row — the report IS a true top-20.
    // Emitted per row so a distribution shift that voids the guarantee
    // is visible IN the output, not only in a gate-scale spec.
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val w20 = Window.partitionBy().orderBy(col("n_exact").desc, col("user_id").asc)
    candidates.join(exact, "user_id")
      .withColumn("pool_floor_est", min(col("cms_estimate")).over(all))
      .withColumn("rk", row_number().over(w20))
      .withColumn("topk_guaranteed",
        col("pool_floor_est") <=
          min(when(col("rk") <= 20, col("n_exact"))).over(all))
      .filter(col("rk") <= 20)
      .select(col("user_id"), col("n_exact"), col("cms_estimate"),
        (col("cms_estimate") >= col("n_exact")).as("cms_ge_exact"),
        col("pool_floor_est"), col("topk_guaranteed"))
      .orderBy(col("n_exact").desc, col("user_id").asc)
  }

  val cmsTopkSql: String =
    s"""
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    coords AS (
      SELECT ev.user_id, r.r,
             ((CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || CAST(ev.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % $CmsWidth) + $CmsWidth) % $CmsWidth AS c
      FROM ev CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(r)
    ),
    sketch AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cell FROM coords GROUP BY 1, 2),
    est AS (
      SELECT k.user_id, min(s.cell) AS cms_estimate
      FROM (SELECT DISTINCT user_id FROM ev) k
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(r)
      JOIN sketch s ON s.r = r.r
        AND s.c = ((CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || CAST(k.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    % $CmsWidth) + $CmsWidth) % $CmsWidth
      GROUP BY 1
    ),
    cand AS (
      SELECT user_id, cms_estimate FROM est
      ORDER BY cms_estimate DESC, user_id ASC LIMIT $CmsCandidates
    ),
    exact AS (
      SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_exact
      FROM ev e JOIN cand c ON e.user_id = c.user_id GROUP BY 1
    ),
    pool AS (
      SELECT c.user_id, x.n_exact, c.cms_estimate,
             min(c.cms_estimate) OVER () AS pool_floor_est,
             row_number() OVER (ORDER BY x.n_exact DESC, c.user_id ASC) AS rk
      FROM cand c JOIN exact x ON c.user_id = x.user_id
    )
    SELECT user_id, n_exact, cms_estimate,
           cms_estimate >= n_exact AS cms_ge_exact,
           pool_floor_est,
           pool_floor_est <= min(CASE WHEN rk <= 20 THEN n_exact END) OVER ()
             AS topk_guaranteed
    FROM pool WHERE rk <= 20
    ORDER BY n_exact DESC, user_id ASC"""

  // ---- q_hll_distinct --------------------------------------------------

  /** HLL register count (m). 256 registers → ~6.5% standard error. */
  val HllM = 256

  /** Bits of hash remaining after the 8 register bits (60 − 8). A rank
    * can therefore be 1..53 (53 = the all-zero remainder).
    */
  val HllMaxRank = 53

  /** 2^53 — the harmonic contribution of an empty register when the
    * harmonic sum is kept as the exact integer Σ 2^(53 − M_j).
    */
  val HllEmptyTerm = 9007199254740992L

  /** Rank of the all-zero remainder for register count m (60-bit hash,
    * log2(m) register bits). m=256 → 53 ([[HllMaxRank]]).
    */
  def hllMaxRankOf(m: Int): Int = {
    require(m >= 2 && (m & (m - 1)) == 0, s"register count must be a power of two, got $m")
    60 - Integer.numberOfTrailingZeros(m) + 1
  }

  /** Register index of a 60-bit hash (low log2(m) bits; floorMod keeps
    * it total for out-of-contract negative inputs).
    */
  def hllRegisterOf(hv: Long, m: Int = HllM): Int =
    java.lang.Math.floorMod(hv, m.toLong).toInt

  /** Register rank of a 60-bit hash (rank of its high-bit remainder) —
    * the scalar twin of both the SQL `53 − length(bin(w))` and the
    * native aggregate's `numberOfLeadingZeros` form, for ANY
    * power-of-two m (the constants derive from m).
    */
  def hllRankOf(hv: Long, m: Int = HllM): Int = {
    val maxRank = hllMaxRankOf(m)
    val w = java.lang.Math.floorDiv(hv, m.toLong)
    if (w == 0L) maxRank
    else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  /** Scalar HLL estimator over a register array (m = regs.length, any
    * power of two): every constant — maxRank, α_m, m², 2^maxRank —
    * derives from m, and at m=256 the arithmetic is operation-for-
    * operation identical to the SQL the batch query mirrors (the
    * HllStateSpec equality pins that on the gate corpus). Returns
    * (n_hit, harmonic_num, estimate rounded to 4).
    */
  def hllEstimateOf(regs: IndexedSeq[Int]): (Long, Long, Double) = {
    val m = regs.length
    val maxRank = hllMaxRankOf(m)
    var nHit = 0L
    var num = 0L
    regs.foreach { r =>
      if (r > 0) nHit += 1
      num += 1L << (maxRank - r)
    }
    val zeros = m - nHit
    val md = m.toDouble
    val raw = 0.7213 / (1.0 + 1.079 / md) * (md * md) * (1L << maxRank).toDouble / num.toDouble
    val est =
      if (raw <= 2.5 * md && zeros > 0) md * math.log(md / zeros)
      else raw
    (nHit, num,
      BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** HyperLogLog distinct-count estimate (Flajolet et al. 2007) over two
    * key populations of `events` — `user_id` (small cardinality: the
    * linear-counting branch) and the `user:day` composite (the harmonic
    * branch) — next to exact counts for calibration. Complements the KMV
    * sketch ([[kmvDistinct]]): HLL is the industry-standard fixed-memory
    * register array (m integers, here 256), KMV the k-smallest-hash set.
    *
    * Determinism discipline: hashes are md5-derived (no randomness); the
    * register rank is `53 − length(bin(w))` (exact integer both
    * engines — `bin` prints no leading zeros in Spark or DuckDB); and
    * the harmonic sum Σ 2^(−M_j) is carried as the EXACT bigint
    * numerator Σ 2^(53 − M_j) ≤ 256·2^53 < 2^63, so the only floating
    * ops are one literal-constant multiply chain and one division (plus
    * `ln` on the linear-counting branch, rounded to 4 decimals) —
    * bit-stable cross-engine.
    *
    * Scale: the sketch is ONE hash aggregation to ≤ m rows per group
    * (map-side partials collapse each partition to ≤ m registers before
    * the shuffle), and two HLL sketches merge by register-wise max —
    * the canonical 1000-executor fan-in shape. The exact-distinct leg
    * exists for the oracle anchor only; at 100 TB you run the registers
    * leg alone.
    */
  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).filter(col("user_id").isNotNull)
    val day = expr("unix_micros(ts) div 86400000000")
    val keys = ev.select(explode(array(
      struct(lit("user_id").as("col_name"), col("user_id").cast("string").as("k")),
      struct(lit("user_day").as("col_name"),
        concat(col("user_id").cast("string"), lit(":"), day.cast("string")).as("k")),
    )).as("ck")).select(col("ck.col_name").as("col_name"), col("ck.k").as("k"))
    val hv = conv(substring(md5(concat(lit("hll|"), col("k"))), 1, 15), 16, 10).cast("long")
    val hashed = keys.select(col("col_name"), hv.as("hv"))
    val exact = hashed.groupBy(col("col_name"))
      .agg(count_distinct(col("hv")).as("n_exact"))
    exact.join(broadcast(hllEstimateDf(hashed, "col_name")), "col_name")
      .select(col("col_name"), col("n_exact"), col("n_hit"),
        col("harmonic_num"), col("hll_estimate"))
  }

  /** Shared register→estimate pipeline over a ($key, hv) relation —
    * ONE bounded-state aggregation via the native mergeable register
    * array ([[graft.functions.HllSketch]]: O(m) state, map-side
    * partials, register-wise-max merge — the shuffle carries one sketch
    * row per key, not m register rows). Empty registers eval to rank 0,
    * so the exact-integer harmonic numerator Σ 2^(maxRank − M_j) is a
    * single array fold — every empty register contributes 2^53
    * ([[HllEmptyTerm]]) automatically. One definition, consumed by
    * q_hll_distinct and q_shingle_cardinality.
    */
  private[queries] def hllEstimateDf(hashed: DataFrame, key: String): DataFrame = {
    val sketch = hashed
      .groupBy(col(key))
      .agg(graft.functions.HllAggregates.hllSketch(col("hv"), HllM).as("regs"))
      .select(col(key),
        expr("CAST(size(filter(regs, r -> r > 0)) AS BIGINT)").as("n_hit"),
        expr(s"aggregate(regs, CAST(0 AS BIGINT), " +
          s"(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), $HllMaxRank - r))")
          .as("harmonic_num"))
      .withColumn("zeros", lit(HllM.toLong) - col("n_hit"))
    // alpha_256 · m² · 2^53 — written as ONE literal expression so both
    // engines parse and fold the identical IEEE-754 value
    val rawNum = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(9007199254740992.0)
    sketch
      .withColumn("raw", rawNum / col("harmonic_num").cast("double"))
      .withColumn("hll_estimate",
        round(
          when(col("raw") <= lit(2.5 * HllM) && col("zeros") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros").cast("double")))
            .otherwise(col("raw")),
          4))
      .select(col(key), col("n_hit"), col("harmonic_num"), col("hll_estimate"))
  }

  /** Shared oracle CTE chain (regs/sk/est) over a prior `hashed` CTE
    * with columns ($key, hv); `est` ends with ($key, n_hit,
    * harmonic_num, hll_estimate).
    */
  private[queries] def hllEstCtesSql(key: String): String =
    s"""regs AS (
      SELECT $key, hv % $HllM AS reg,
             max(CASE WHEN hv // $HllM = 0 THEN $HllMaxRank
                      ELSE $HllMaxRank - length(bin(hv // $HllM)) END) AS mj
      FROM hashed GROUP BY 1, 2
    ),
    sk AS (
      SELECT $key, count(*) AS n_hit,
             CAST(SUM(1::BIGINT << ($HllMaxRank - mj)) AS BIGINT)
               + ($HllM - count(*)) * $HllEmptyTerm AS harmonic_num,
             $HllM - count(*) AS zeros
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT $key, CAST(n_hit AS BIGINT) AS n_hit, harmonic_num,
             round(CASE WHEN raw <= CAST('${2.5 * HllM}' AS DOUBLE) AND zeros > 0
                        THEN CAST('256.0' AS DOUBLE) * ln(CAST('256.0' AS DOUBLE) / CAST(zeros AS DOUBLE))
                        ELSE raw END, 4) AS hll_estimate
      FROM (
        SELECT *, CAST('0.7213' AS DOUBLE) / (CAST('1.0' AS DOUBLE) + CAST('1.079' AS DOUBLE) / CAST('256.0' AS DOUBLE))
                  * CAST('65536.0' AS DOUBLE) * CAST('9007199254740992.0' AS DOUBLE)
                  / CAST(harmonic_num AS DOUBLE) AS raw
        FROM sk)
    )"""

  val hllDistinctSql: String =
    s"""
    WITH keys AS (
      SELECT 'user_id' AS col_name, CAST(user_id AS VARCHAR) AS k
      FROM events WHERE user_id IS NOT NULL
      UNION ALL
      SELECT 'user_day' AS col_name,
             CAST(user_id AS VARCHAR) || ':' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS k
      FROM events WHERE user_id IS NOT NULL
    ),
    hashed AS (
      SELECT col_name,
             CAST(('0x' || substr(md5('hll|' || k), 1, 15)) AS BIGINT) AS hv
      FROM keys
    ),
    ${hllEstCtesSql("col_name")},
    ex AS (SELECT col_name, count(DISTINCT hv) AS n_exact FROM hashed GROUP BY 1)
    SELECT e.col_name, x.n_exact, e.n_hit, e.harmonic_num, e.hll_estimate
    FROM est e JOIN ex x ON e.col_name = x.col_name"""

  // ---- q_shingle_cardinality -----------------------------------------

  /** q_shingle_cardinality: per-source distinct 5-gram-shingle count —
    * the capacity-planning number for the dedup index (how many
    * distinct shingles a source contributes sizes the LSH band tables
    * and the shingle join's shuffle), via the SAME mergeable HLL
    * register aggregate as `q_hll_distinct`, against a keyspace that
    * actually stresses it (shingles ≫ user ids). `dup_ratio` = 1 −
    * distinct/total shingle instances is the source's internal
    * repetitiveness — a high value predicts heavy near-dup pressure
    * BEFORE any pair join runs.
    *
    * Scale: shingle explode is the dedup family's narrow projection;
    * the sketch collapses each partition to ≤ m registers per source
    * before the shuffle (the 1000-executor fan-in shape). The exact
    * leg anchors the oracle; at 100 TB only the register leg runs.
    */
  def shingleCardinality(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = graft.pipeline.Dedup
      .shingleHashes(
        Tables.spread(Tables.documents(spark, sfDir), col("doc_id")),
        keep = Seq("source"))
      .select(col("source"), explode(col("hs")).as("sh"))
    val hv = conv(substring(md5(concat(lit("hll|"), col("sh").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val hashed = sh.select(col("source"), hv.as("hv"))
    val exact = hashed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"), count_distinct(col("hv")).as("n_exact"))
    exact.join(broadcast(hllEstimateDf(hashed, "source")), "source")
      .select(col("source"), col("n_shingles"), col("n_exact"),
        round(lit(1.0) - col("n_exact").cast("double") / col("n_shingles").cast("double"), 6)
          .as("dup_ratio"),
        col("n_hit"), col("harmonic_num"), col("hll_estimate"))
  }

  val shingleCardinalitySql: String =
    s"""
    WITH shdoc AS (${graft.pipeline.Dedup.shingleHashesSql(keep = Seq("source"))}),
    sh AS (SELECT source, unnest(hs) AS sh FROM shdoc),
    hashed AS (
      SELECT source,
             CAST(('0x' || substr(md5('hll|' || CAST(sh AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM sh
    ),
    ${hllEstCtesSql("source")},
    ex AS (SELECT source, count(*) AS n_shingles, count(DISTINCT hv) AS n_exact
           FROM hashed GROUP BY 1)
    SELECT e.source, x.n_shingles, x.n_exact,
           round(CAST('1.0' AS DOUBLE) - CAST(x.n_exact AS DOUBLE) / CAST(x.n_shingles AS DOUBLE), 6)
             AS dup_ratio,
           e.n_hit, e.harmonic_num, e.hll_estimate
    FROM est e JOIN ex x ON e.source = x.source"""

  // ---- q_quantile_sample -----------------------------------------------

  /** Rows kept per topic in the quantile sample. */
  val QuantileSampleK = 256

  /** Salt fan-out for the sample's partial bottom-k phase. */
  val QuantileSampleSalt = 32

  /** q_quantile_sample: per-topic quantiles from a deterministic
    * bottom-k hash sample, next to the exact quantiles for calibration
    * — the bounded-state path for percentiles at scale. Exact
    * `percentile()` needs every value of a group in one place (sort or
    * full value buffer — the costliest aggregate after exact
    * distinct); a bottom-k-by-md5 sample is a uniform [[
    * QuantileSampleK]]-row subset that is mergeable (union, keep the k
    * smallest hashes), reproducible (no randomness), and
    * oracle-checkable, and its empirical quantiles converge at
    * O(1/√k) like any uniform sample.
    *
    * Scale: the sample is built with the two-phase salted rank (per
    * (topic, salt) partial bottom-k, then global bottom-k over ≤ k·32
    * survivors) — a hot topic never funnels its full row set through
    * one task. The exact leg exists for the oracle/calibration only;
    * at 100 TB you run just the sample leg.
    */
  def quantileSample(spark: SparkSession, sfDir: String): DataFrame = {
    // round-16 probe record: a 32-way spread of this scan was tried and
    // REVERTED — wall flat, total CPU 6× (the salted window's partial
    // leg pays per-task buffering on a 1.3 MB shuffle)
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
    val hv = conv(substring(md5(concat(lit("qs|"), col("event_id").cast("string"))), 1, 15),
      16, 10).cast("long")
    val base = ev.select(col("event_type").as("topic"), col("value"), hv.as("hv"))
    val partial = base
      .withColumn("salt", pmod(col("hv"), lit(QuantileSampleSalt.toLong)))
      .withColumn("rn1", row_number().over(
        Window.partitionBy(col("topic"), col("salt")).orderBy(col("hv"))))
      .filter(col("rn1") <= QuantileSampleK)
    val sampled = partial
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("topic")).orderBy(col("hv"))))
      .filter(col("rn") <= QuantileSampleK)
      .groupBy(col("topic"))
      .agg(
        count(lit(1)).as("n_sample"),
        round(expr("percentile(value, 0.5)"), 6).as("p50_sample"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_sample"),
      )
    val exact = base.groupBy(col("topic"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_exact"),
      )
    exact.join(broadcast(sampled), "topic")
      .select(col("topic"), col("n"), col("p50_exact"), col("p95_exact"),
        col("n_sample"), col("p50_sample"), col("p95_sample"))
  }

  val quantileSampleSql: String =
    s"""
    WITH base AS (
      SELECT event_type AS topic, value,
             CAST(('0x' || substr(md5('qs|' || event_id), 1, 15)) AS BIGINT) AS hv
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    r AS (
      SELECT topic, value, row_number() OVER (PARTITION BY topic ORDER BY hv) AS rn
      FROM base
    ),
    samp AS (
      SELECT topic, count(*) AS n_sample,
             round(quantile_cont(value, 0.5), 6) AS p50_sample,
             round(quantile_cont(value, 0.95), 6) AS p95_sample
      FROM r WHERE rn <= $QuantileSampleK GROUP BY 1
    ),
    ex AS (
      SELECT topic, count(*) AS n,
             round(quantile_cont(value, 0.5), 6) AS p50_exact,
             round(quantile_cont(value, 0.95), 6) AS p95_exact
      FROM base GROUP BY 1
    )
    SELECT e.topic, e.n, e.p50_exact, e.p95_exact,
           s.n_sample, s.p50_sample, s.p95_sample
    FROM ex e JOIN samp s ON e.topic = s.topic"""

  // ---- q_approx_quantiles ----------------------------------------------

  /** Histogram bin width. A power of two, so `value / 4` is an exact
    * IEEE scaling and `floor` is engine-identical.
    */
  val HistBinWidth = 4.0

  /** Quantile points the histogram is read at. */
  val HistPs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** q_approx_quantiles: per-topic quantiles from a FIXED-BIN histogram
    * — the constant-state percentile sketch (the shape of
    * Prometheus/OTel histograms and of t-digest's role, made
    * deterministic: fixed bucket boundaries instead of data-adaptive
    * ones, so the sketch is exactly reproducible and oracle-checkable).
    * Bin counts are a plain hash aggregation — mergeable partials,
    * state O(range/width) per topic regardless of row count — and the
    * quantile is read back by linear interpolation inside the bin the
    * target rank falls in: `est = lo + w·(rank − cum_below)/cnt`.
    *
    * The exact leg (`percentile`) rides the SAME single scan/shuffle as
    * the count, for calibration: `err` is the rounded difference — the
    * sketch's measured accuracy at this width. At 100 TB you keep only
    * the histogram leg.
    *
    * Scale: one shuffle keyed (topic, bin) for the sketch, one keyed
    * topic for n/exact; the rank pick is a broadcast join of a ≤
    * topics×|ps| relation against a ≤ topics×bins relation; the cum-sum
    * window is PARTITIONED by topic (never a global sort).
    */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("topic"), col("value"))
    val binned = ev
      .groupBy(col("topic"), floor(col("value") / lit(HistBinWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("topic")).orderBy(col("bin"))))
    val nBins = binned.groupBy(col("topic")).agg(count(lit(1)).as("n_bins"))
    val pStructs = HistPs.map { p =>
      struct(lit(p).as("p"),
        round(expr(s"percentile(value, $p)"), 6).as("exact"))
    }
    val ranks = ev.groupBy(col("topic"))
      .agg(count(lit(1)).as("n"), array(pStructs: _*).as("pe"))
      .select(col("topic"), col("n"), explode(col("pe")).as("pe"))
      .select(col("topic"), col("n"), col("pe.p").as("p"), col("pe.exact").as("exact"))
      .withColumn("rank", col("p") * col("n"))
    val est = round(
      col("bin") * lit(HistBinWidth) +
        lit(HistBinWidth) * (col("rank") - (col("cum") - col("cnt"))) / col("cnt"), 6)
    ranks
      .join(binned, Seq("topic"))
      .filter(col("cum") >= col("rank") && col("cum") - col("cnt") < col("rank"))
      .join(broadcast(nBins), Seq("topic"))
      .select(col("topic"), col("p"), col("n"), col("n_bins"),
        est.as("est"), col("exact"),
        round(est - col("exact"), 6).as("err"))
  }

  val approxQuantilesSql: String = {
    // one aggregate leg per p (quantile_cont needs a constant
    // parameter), p emitted as an explicit DOUBLE (a bare 0.5 literal
    // would be DECIMAL in DuckDB -> decimal rank arithmetic != Spark)
    val rLegs = HistPs.map { p =>
      s"""SELECT topic, count(*) AS n, CAST('$p' AS DOUBLE) AS p,
             round(quantile_cont(value, $p), 6) AS exact
      FROM base GROUP BY topic"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH base AS (
      SELECT event_type AS topic, value FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    b AS (
      SELECT topic, CAST(floor(value / $HistBinWidth) AS BIGINT) AS bin, count(*) AS cnt
      FROM base GROUP BY 1, 2
    ),
    c AS (
      SELECT topic, bin, cnt,
             sum(cnt) OVER (PARTITION BY topic ORDER BY bin) AS cum
      FROM b
    ),
    nb AS (SELECT topic, count(*) AS n_bins FROM b GROUP BY 1),
    r AS (
      $rLegs
    ),
    k AS (SELECT topic, n, p, exact, p * n AS rank FROM r)
    SELECT k.topic, k.p, k.n, nb.n_bins,
           round(c.bin * $HistBinWidth
                 + $HistBinWidth * (k.rank - (c.cum - c.cnt)) / c.cnt, 6) AS est,
           k.exact,
           round((round(c.bin * $HistBinWidth
                 + $HistBinWidth * (k.rank - (c.cum - c.cnt)) / c.cnt, 6)) - k.exact, 6) AS err
    FROM k
    JOIN c ON k.topic = c.topic AND c.cum >= k.rank AND c.cum - c.cnt < k.rank
    JOIN nb ON k.topic = nb.topic"""
  }
}
