package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * Scale: ONE scan computes every metric for every column (a single
    * wide aggregation with map-side partials: 6 columns × ~5 metrics =
    * one 30-slot aggregate row); the per-column report rows are then a
    * driver-side reshape of that single row. Never one pass per column
    * — the naive loop would scan 100 TB six times. `count(DISTINCT)`
    * slots expand internally, the costliest part of the pass; swap in
    * the KMV/bitmap sketches when approximate distincts suffice.
    */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val numeric = Seq("event_id", "user_id", "value", "ts_us")
    val strings = Seq("event_type", "props")
    val aggs = (numeric ++ strings).flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        countDistinct(col(c)).as(s"${c}__nd"),
      ) ++ (if (numeric.contains(c))
        Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
      else
        Seq(min(col(c)).as(s"${c}__smin"), max(col(c)).as(s"${c}__smax")))
    }
    val row = ev.agg(count(lit(1)).as("n_rows"), aggs: _*).collect().head
    val n = row.getAs[Long]("n_rows")
    val out = (numeric ++ strings).map { c =>
      val cnt = row.getAs[Long](s"${c}__cnt")
      val nd = row.getAs[Long](s"${c}__nd")
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
    val ev = Tables.events(spark, sfDir)
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
