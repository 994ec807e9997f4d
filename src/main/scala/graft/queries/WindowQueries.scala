package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** Additional analytic coverage: native event-time tumbling windows,
  * rollup aggregation, and exact median — the reference stores "median"
  * but actually computes the mean ("no median supported, average used
  * instead", reference: lib/db/model/SigmaModel.js:48); this engine
  * supports the real thing.
  */
object WindowQueries {

  // ---- q_tumbling_stats ----------------------------------------------

  /** Tumbling 1-hour event-time windows per topic via the native
    * `window()` operator (the Structured Streaming windowing primitive,
    * exercised here in batch). Window start crosses the oracle boundary
    * as epoch micros.
    */
  def tumblingStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type").as("topic"))
      .agg(
        count(lit(1)).as("cnt"),
        exactSum(col("value")).as("sumv"),
      )
      .select(
        unix_micros(col("w.start")).as("bucket_us"),
        col("topic"),
        col("cnt"),
        round(col("sumv") / col("cnt"), 6).as("mean"),
      )
  }

  val tumblingStatsSql: String =
    """
    SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us,
           event_type AS topic,
           count(*) AS cnt,
           round(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / count(*), 6) AS mean
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2"""

  // ---- q_rollup ------------------------------------------------------

  /** Rollup aggregation over the star schema: revenue by
    * (returnflag, linestatus) with subtotals and a grand total.
    */
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).cast("double").as("sum_qty"),
      )
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
        col("n"), col("sum_qty"),
      )
  }

  val rollupRevenueSql: String =
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           count(*) AS n,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

  // ---- q_cube --------------------------------------------------------

  /** Cube aggregation over the event stream: all 2² grouping
    * combinations of (event_type, epoch-weekday) in one pass —
    * weekday as integer epoch-day mod 7 so the calendar math is
    * engine-exact (no locale/week-start parity risk). Sums go through
    * the DECIMAL(18,6) trim for cross-engine bit equality.
    *
    * Scale: Spark expands the cube into grouping sets inside a single
    * hash aggregation with map-side partials — 4× the group cardinality
    * of the base agg (still tiny), one shuffle.
    */
  def cubeActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("weekday"),
        col("value"))
    ev.cube(col("event_type"), col("weekday"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.Exact.exactSum(col("value")).as("sum_value"),
      )
      .select(
        coalesce(col("event_type"), lit("<all>")).as("event_type"),
        coalesce(col("weekday"), lit(-1L)).as("weekday"),
        col("n"), col("sum_value"))
  }

  val cubeActivitySql: String =
    """
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(weekday, -1) AS weekday,
           count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_value
    FROM (
      SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS weekday, value
      FROM events WHERE event_type IS NOT NULL
    )
    GROUP BY CUBE (event_type, weekday)"""

  // ---- q_median ------------------------------------------------------

  /** Exact interpolated median (percentile_cont semantics) of `value`
    * per topic — the aggregation the reference's "median" pretended to
    * be. Rounded to 6 on both sides (interpolation shapes may differ in
    * final ulps between engines).
    */
  def median(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type").as("topic"))
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("median"),
        round(percentile(col("value"), lit(0.95)), 6).as("p95"),
        count(lit(1)).as("cnt"),
      )
  }

  val medianSql: String =
    """
    SELECT event_type AS topic,
           round(quantile_cont(value, 0.5), 6) AS median,
           round(quantile_cont(value, 0.95), 6) AS p95,
           count(*) AS cnt
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY 1"""

  // ---- q_source_quantiles --------------------------------------------

  /** Grouped multi-quantile summary: the document-length distribution
    * per source (q25/q50/q75/q95 of n_chars) — the profile a curation
    * pipeline reads before setting per-source length filters. One hash
    * aggregation computing all four exact interpolated quantiles in a
    * single percentile pass; interpolated values rounded to 6.
    */
  def sourceQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(col("n_chars"), typedlit(Seq(0.25, 0.5, 0.75, 0.95))).as("qs"))
      .select(
        col("source"), col("n_docs"),
        round(element_at(col("qs"), 1), 6).as("q25"),
        round(element_at(col("qs"), 2), 6).as("q50"),
        round(element_at(col("qs"), 3), 6).as("q75"),
        round(element_at(col("qs"), 4), 6).as("q95"),
      )
  }

  val sourceQuantilesSql: String =
    """
    SELECT source, count(*) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS q25,
           round(quantile_cont(n_chars, 0.50), 6) AS q50,
           round(quantile_cont(n_chars, 0.75), 6) AS q75,
           round(quantile_cont(n_chars, 0.95), 6) AS q95
    FROM documents GROUP BY 1"""
}
