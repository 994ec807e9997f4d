package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling / validation — the pre-training sanity report
  * (completeness, uniqueness, ranges) a production pipeline asserts
  * before a 100 TB job burns a cluster on malformed input.
  */
object ProfileQueries {

  /** q_profile: per-column profile of the events table — row count,
    * nulls, distincts, numeric min/max, string min/max — plus the two
    * standard derived constraints (`is_complete`, `is_unique`).
    *
    * Scale (round-16 restructure, measured): the non-distinct metrics
    * stay ONE wide single-scan aggregation with map-side partials —
    * never one pass per column. The six exact `count(DISTINCT)` slots
    * used to ride the same aggregate, which Spark plans as an Expand
    * (×7 row fan-out) where EVERY expanded row carries the full
    * 25-slot aggregation buffer through the partial agg and shuffle —
    * measured 2.6 s of the old 2.7 s wall at sf0.1, ~25 µs/row. They
    * are now a second pass: one typed explode into narrow
    * (col, v_long, v_dbl, v_str) keys and a two-level aggregate
    * (map-side partial DEDUP, then count per column) — the shuffle
    * moves one narrow row per locally-distinct value, no wide buffers.
    * Distinct semantics are identical: values group as their NATIVE
    * types, so Spark's float normalization (-0.0 = 0.0, one NaN class)
    * applies exactly as in count(DISTINCT). Two scans for the exact
    * form mirrors [[profileApprox]]'s adjudicated shape (base pass +
    * sketch pass); at 100 TB the approx form remains the production
    * path and this stays the calibration row.
    */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val evRaw = Tables.events(spark, sfDir).withColumn("ts_us", expr("unix_micros(ts)"))
    val numeric = Seq("event_id", "user_id", "value", "ts_us")
    val strings = Seq("event_type", "props")
    val aggs = (numeric ++ strings).flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt")) ++ (if (numeric.contains(c))
        Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
      else
        Seq(min(col(c)).as(s"${c}__smin"), max(col(c)).as(s"${c}__smax")))
    }
    // the base-metric partial aggregate collapses inside the scan task
    // (one narrow output row), so it reads the UNSPREAD scan; only the
    // distinct leg — whose partial rows are one per distinct value —
    // pays the spread. The two legs are independent jobs, so they run
    // concurrently (guide §2.6) and the wall is max, not sum.
    val nullL = lit(null).cast("long")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def tag(c: String, vl: Column, vd: Column, vs: Column) =
      struct(lit(c).as("c"), vl.as("vl"), vd.as("vd"), vs.as("vs"))
    val tagged = Tables.spread(evRaw, col("event_id")).select(explode(array(
      tag("event_id", col("event_id"), nullD, nullS),
      tag("user_id", col("user_id"), nullD, nullS),
      tag("ts_us", col("ts_us"), nullD, nullS),
      tag("value", nullL, col("value"), nullS),
      tag("event_type", nullL, nullD, col("event_type")),
      tag("props", nullL, nullD, col("props")),
    )).as("p")).select(col("p.c").as("c"), col("p.vl").as("vl"),
      col("p.vd").as("vd"), col("p.vs").as("vs"))
    val (row, ndMap) = graft.core.Jobs.concurrently(spark,
      evRaw.agg(count(lit(1)).as("n_rows"), aggs: _*).collect().head,
      tagged
        .filter(col("vl").isNotNull || col("vd").isNotNull || col("vs").isNotNull)
        .groupBy(col("c"), col("vl"), col("vd"), col("vs")).agg(count(lit(1)))
        .groupBy(col("c")).agg(count(lit(1)).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    val n = row.getAs[Long]("n_rows")
    val out = (numeric ++ strings).map { c =>
      val cnt = row.getAs[Long](s"${c}__cnt")
      val nd = ndMap.getOrElse(c, 0L)
      def numAt(f: String): Option[Double] = {
        val i = row.fieldIndex(f)
        if (row.isNullAt(i)) None else Some(row.getDouble(i)) // all-null column -> null min/max
      }
      val (mn, mx) = if (numeric.contains(c))
        (numAt(s"${c}__min"), numAt(s"${c}__max"))
      else (None, None)
      val (smn, smx) = if (strings.contains(c))
        (Option(row.getAs[String](s"${c}__smin")), Option(row.getAs[String](s"${c}__smax")))
      else (None, None)
      (c, n, n - cnt, nd, mn, mx, smn, smx, n - cnt == 0L, nd == n)
    }
    out.toDF("col_name", "n_rows", "n_null", "n_distinct",
      "min_num", "max_num", "min_str", "max_str", "is_complete", "is_unique")
  }

  val profileSql: String =
    """
    WITH m AS (
      SELECT count(*) AS n_rows,
             count(event_id) AS event_id__cnt, count(DISTINCT event_id) AS event_id__nd,
             CAST(min(event_id) AS DOUBLE) AS event_id__min, CAST(max(event_id) AS DOUBLE) AS event_id__max,
             count(user_id) AS user_id__cnt, count(DISTINCT user_id) AS user_id__nd,
             CAST(min(user_id) AS DOUBLE) AS user_id__min, CAST(max(user_id) AS DOUBLE) AS user_id__max,
             count(value) AS value__cnt, count(DISTINCT value) AS value__nd,
             CAST(min(value) AS DOUBLE) AS value__min, CAST(max(value) AS DOUBLE) AS value__max,
             count(epoch_us(ts)) AS ts_us__cnt, count(DISTINCT epoch_us(ts)) AS ts_us__nd,
             CAST(min(epoch_us(ts)) AS DOUBLE) AS ts_us__min, CAST(max(epoch_us(ts)) AS DOUBLE) AS ts_us__max,
             count(event_type) AS event_type__cnt, count(DISTINCT event_type) AS event_type__nd,
             min(event_type) AS event_type__smin, max(event_type) AS event_type__smax,
             count(props) AS props__cnt, count(DISTINCT props) AS props__nd,
             min(props) AS props__smin, max(props) AS props__smax
      FROM events
    )
    SELECT * FROM (
      SELECT 'event_id' AS col_name, n_rows, n_rows - event_id__cnt AS n_null,
             event_id__nd AS n_distinct, event_id__min AS min_num, event_id__max AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
             n_rows - event_id__cnt = 0 AS is_complete, event_id__nd = n_rows AS is_unique
      FROM m
      UNION ALL
      SELECT 'user_id', n_rows, n_rows - user_id__cnt, user_id__nd,
             user_id__min, user_id__max, NULL, NULL,
             n_rows - user_id__cnt = 0, user_id__nd = n_rows FROM m
      UNION ALL
      SELECT 'value', n_rows, n_rows - value__cnt, value__nd,
             value__min, value__max, NULL, NULL,
             n_rows - value__cnt = 0, value__nd = n_rows FROM m
      UNION ALL
      SELECT 'ts_us', n_rows, n_rows - ts_us__cnt, ts_us__nd,
             ts_us__min, ts_us__max, NULL, NULL,
             n_rows - ts_us__cnt = 0, ts_us__nd = n_rows FROM m
      UNION ALL
      SELECT 'event_type', n_rows, n_rows - event_type__cnt, event_type__nd,
             NULL, NULL, event_type__smin, event_type__smax,
             n_rows - event_type__cnt = 0, event_type__nd = n_rows FROM m
      UNION ALL
      SELECT 'props', n_rows, n_rows - props__cnt, props__nd,
             NULL, NULL, props__smin, props__smax,
             n_rows - props__cnt = 0, props__nd = n_rows FROM m
    )"""

  // ---- q_profile_approx ----------------------------------------------

  /** q_profile_approx: [[profile]] with the exact `count(DISTINCT)`
    * slots — the costliest state in the exact pass — replaced by the
    * in-repo KMV sketch ([[SketchQueries]]). This is the 100 TB form:
    * the non-distinct metrics stay one wide single-scan aggregation,
    * and distincts become bounded-size mergeable sketches (≤ [[
    * SketchQueries.KmvK]] hashes per column) built by the native
    * [[graft.functions.KmvSketch]] aggregate — O(k) state, map-side
    * partials, merge = union + trim — so no aggregation state or
    * shuffle payload grows with column cardinality.
    *
    * The KMV hashes are md5-derived (no randomness), so unlike an HLL
    * swap this stays fully oracle-gated. Hash inputs are cross-engine
    * exact string reprs: BIGINT columns cast to string, strings as-is,
    * and the DOUBLE column via exact DECIMAL(18,6) micro-units (double
    * → string differs between engines; integer micro-units do not —
    * distinctness at 1e-6 resolution, a declared property of the
    * approximate profile). ProfilingOpsSpec pins the estimates against
    * the exact profile within KMV error bounds.
    */
  def profileApprox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.spread(Tables.events(spark, sfDir), col("event_id"))
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val numeric = Seq("event_id", "user_id", "value", "ts_us")
    val strings = Seq("event_type", "props")
    val aggs = (numeric ++ strings).flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt")) ++ (if (numeric.contains(c))
        Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
      else
        Seq(min(col(c)).as(s"${c}__smin"), max(col(c)).as(s"${c}__smax")))
    }
    val row = ev.agg(count(lit(1)).as("n_rows"), aggs: _*).collect().head
    val n = row.getAs[Long]("n_rows")
    val base = (numeric ++ strings).map { c =>
      val cnt = row.getAs[Long](s"${c}__cnt")
      def numAt(f: String): Option[Double] = {
        val i = row.fieldIndex(f)
        if (row.isNullAt(i)) None else Some(row.getDouble(i))
      }
      val (mn, mx) = if (numeric.contains(c))
        (numAt(s"${c}__min"), numAt(s"${c}__max"))
      else (None, None)
      val (smn, smx) = if (strings.contains(c))
        (Option(row.getAs[String](s"${c}__smin")), Option(row.getAs[String](s"${c}__smax")))
      else (None, None)
      (c, n, n - cnt, mn, mx, smn, smx, n - cnt == 0L)
    }.toDF("col_name", "n_rows", "n_null",
      "min_num", "max_num", "min_str", "max_str", "is_complete")

    // KMV leg: one scan exploding each row into (column, repr) pairs,
    // aggregated by the NATIVE bounded-state kmv_sketch aggregate
    // ([[graft.functions.KmvSketch]]): O(k) state per group, map-side
    // partials, merge = union + trim — the shuffle moves ≤ k longs per
    // (column, partition), never one row per distinct value (the
    // dedup-then-rank formulation shuffled every distinct hash and was
    // 2× SLOWER than the exact profile it was meant to relieve)
    val repr = map(
      lit("event_id"), col("event_id").cast("string"),
      lit("user_id"), col("user_id").cast("string"),
      lit("ts_us"), col("ts_us").cast("string"),
      lit("event_type"), col("event_type"),
      lit("props"), col("props"),
      lit("value"), (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long").cast("string"),
    )
    val pairs = ev.select(explode(repr).as(Seq("col_name", "s")))
      .filter(col("s").isNotNull)
    val hv = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
    val kth = pairs
      .select(col("col_name"), hv.as("hv"))
      .groupBy(col("col_name"))
      .agg(graft.functions.KmvAggregates.kmvSketch(col("hv"), SketchQueries.KmvK).as("top"))
      .select(col("col_name"),
        element_at(col("top"), -1).as("kth_hash"),
        size(col("top")).cast("long").as("nk"))
    // LEFT join + coalesce-to-0: a fully-null column has no hashes and
    // therefore no sketch row, but the profile must still REPORT it —
    // the all-null column is exactly what a profile exists to surface
    base.join(broadcast(kth), Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(
          round(
            when(col("nk") < SketchQueries.KmvK, col("nk").cast("double"))
              .otherwise(lit((SketchQueries.KmvK - 1).toDouble) * lit(SketchQueries.Domain)
                / col("kth_hash").cast("double")),
            6),
          lit(0.0)).as("n_distinct_kmv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"),
        col("is_complete"))
  }

  val profileApproxSql: String = {
    import SketchQueries.{Domain, KmvK}
    s"""
    WITH pairs AS (
      SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS s FROM events WHERE event_id IS NOT NULL
      UNION ALL
      SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events WHERE user_id IS NOT NULL
      UNION ALL
      SELECT 'ts_us', CAST(epoch_us(ts) AS VARCHAR) FROM events WHERE ts IS NOT NULL
      UNION ALL
      SELECT 'event_type', event_type FROM events WHERE event_type IS NOT NULL
      UNION ALL
      SELECT 'props', props FROM events WHERE props IS NOT NULL
      UNION ALL
      SELECT 'value', CAST(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS VARCHAR)
      FROM events WHERE value IS NOT NULL
    ),
    h AS (SELECT DISTINCT col_name, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS hv FROM pairs),
    r AS (SELECT col_name, hv, row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rn FROM h),
    kth AS (SELECT col_name, max(hv) AS kth_hash, count(*) AS nk FROM r WHERE rn <= $KmvK GROUP BY 1),
    m AS (
      SELECT count(*) AS n_rows,
             count(event_id) AS event_id__cnt,
             CAST(min(event_id) AS DOUBLE) AS event_id__min, CAST(max(event_id) AS DOUBLE) AS event_id__max,
             count(user_id) AS user_id__cnt,
             CAST(min(user_id) AS DOUBLE) AS user_id__min, CAST(max(user_id) AS DOUBLE) AS user_id__max,
             count(value) AS value__cnt,
             CAST(min(value) AS DOUBLE) AS value__min, CAST(max(value) AS DOUBLE) AS value__max,
             count(epoch_us(ts)) AS ts_us__cnt,
             CAST(min(epoch_us(ts)) AS DOUBLE) AS ts_us__min, CAST(max(epoch_us(ts)) AS DOUBLE) AS ts_us__max,
             count(event_type) AS event_type__cnt,
             min(event_type) AS event_type__smin, max(event_type) AS event_type__smax,
             count(props) AS props__cnt,
             min(props) AS props__smin, max(props) AS props__smax
      FROM events
    ),
    percol AS (
      SELECT 'event_id' AS col_name, n_rows, n_rows - event_id__cnt AS n_null,
             event_id__min AS min_num, event_id__max AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
             n_rows - event_id__cnt = 0 AS is_complete
      FROM m
      UNION ALL
      SELECT 'user_id', n_rows, n_rows - user_id__cnt,
             user_id__min, user_id__max, NULL, NULL, n_rows - user_id__cnt = 0 FROM m
      UNION ALL
      SELECT 'value', n_rows, n_rows - value__cnt,
             value__min, value__max, NULL, NULL, n_rows - value__cnt = 0 FROM m
      UNION ALL
      SELECT 'ts_us', n_rows, n_rows - ts_us__cnt,
             ts_us__min, ts_us__max, NULL, NULL, n_rows - ts_us__cnt = 0 FROM m
      UNION ALL
      SELECT 'event_type', n_rows, n_rows - event_type__cnt,
             NULL, NULL, event_type__smin, event_type__smax, n_rows - event_type__cnt = 0 FROM m
      UNION ALL
      SELECT 'props', n_rows, n_rows - props__cnt,
             NULL, NULL, props__smin, props__smax, n_rows - props__cnt = 0 FROM m
    )
    SELECT p.col_name, p.n_rows, p.n_null,
           coalesce(round(CASE WHEN k.nk < $KmvK THEN CAST(k.nk AS DOUBLE)
                      ELSE ${KmvK - 1}.0 * $Domain / CAST(k.kth_hash AS DOUBLE) END, 6),
                    CAST(0 AS DOUBLE)) AS n_distinct_kmv,
           p.min_num, p.max_num, p.min_str, p.max_str, p.is_complete
    FROM percol p LEFT JOIN kth k ON p.col_name = k.col_name"""
  }

  // ---- q_skew_report -------------------------------------------------

  /** Shuffle-key skew diagnostics: for each candidate partitioning
    * column of the events table (user_id, event_type, day), the group
    * count, the largest group, its share of all rows, the p99 group
    * size, and the max/mean skew ratio — the report that decides
    * whether a join key needs salting BEFORE the 100 TB job runs
    * (`q_salted_join` / `q_salted_agg` are the remediation).
    *
    * Scale: ONE scan — each row explodes into (column, key) pairs and
    * a single hash agg counts group sizes (map-side partials absorb
    * the 3× fanout); the per-column report aggregates the group-size
    * relation, which is orders of magnitude smaller than the input.
    * The skew ratio and share are double quotients of exact BIGINTs;
    * only the interpolated p99 is rounded.
    */
  def skewReport(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.spread(Tables.events(spark, sfDir), col("event_id"))
    val pairs = ev.select(explode(map(
      lit("user_id"), coalesce(col("user_id").cast("string"), lit("<null>")),
      lit("event_type"), coalesce(col("event_type"), lit("<null>")),
      lit("day"), expr("unix_micros(ts) div 86400000000").cast("string"),
    )).as(Seq("col_name", "key")))
    val sizes = pairs.groupBy(col("col_name"), col("key")).agg(count(lit(1)).as("sz"))
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c.cast("double")
    sizes.groupBy(col("col_name")).agg(
        count(lit(1)).as("n_groups"),
        sum(col("sz")).as("n_rows"),
        max(col("sz")).as("max_sz"),
        round(expr("percentile(sz, 0.99)"), 6).as("p99_sz"),
      )
      .select(col("col_name"), col("n_groups"), col("n_rows"), col("max_sz"), col("p99_sz"),
        (d(col("max_sz")) / d(col("n_rows"))).as("top_share"),
        (d(col("max_sz")) * d(col("n_groups")) / d(col("n_rows"))).as("skew_ratio"),
        (d(col("max_sz")) * d(col("n_groups")) / d(col("n_rows")) > 4.0).as("skewed"))
  }

  val skewReportSql: String =
    """
    WITH pairs AS (
      SELECT 'user_id' AS col_name, coalesce(CAST(user_id AS VARCHAR), '<null>') AS key FROM events
      UNION ALL
      SELECT 'event_type', coalesce(event_type, '<null>') FROM events
      UNION ALL
      SELECT 'day', CAST(epoch_us(ts) // 86400000000 AS VARCHAR) FROM events
    ),
    sizes AS (SELECT col_name, key, count(*) AS sz FROM pairs GROUP BY 1, 2),
    agg AS (
      SELECT col_name, CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(sz) AS BIGINT) AS n_rows, max(sz) AS max_sz,
             round(quantile_cont(sz, 0.99), 6) AS p99_sz
      FROM sizes GROUP BY 1
    )
    SELECT col_name, n_groups, n_rows, max_sz, p99_sz,
           CAST(max_sz AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top_share,
           CAST(max_sz AS DOUBLE) * CAST(n_groups AS DOUBLE) / CAST(n_rows AS DOUBLE) AS skew_ratio,
           CAST(max_sz AS DOUBLE) * CAST(n_groups AS DOUBLE) / CAST(n_rows AS DOUBLE) > 4.0 AS skewed
    FROM agg"""
}
