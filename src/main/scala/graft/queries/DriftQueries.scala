package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust-statistics anomaly scoring and sequential drift detection —
  * the two classical alternatives to the reference's mean/stddev
  * z-score (reference: lib/dsl/DSLHandler.js:191-192). The reference's
  * "median" field is actually the mean ("no median supported",
  * lib/db/model/SigmaModel.js:48); this engine supplies the real
  * robust pipeline: median + MAD scoring (outlier-resistant where one
  * huge spike inflates a stddev and masks later anomalies) and
  * EWMA/CUSUM drift statistics (the streaming-friendly change
  * detectors that need O(1) state per key instead of a trailing
  * window of samples).
  */
object DriftQueries {

  /** Robust-score threshold: |value − median| > MadK · MAD. */
  val MadK = 5.0

  // ---- q_mad_anomaly -------------------------------------------------

  /** Median/MAD robust anomaly detection per topic.
    *
    * Two exact-percentile passes (median of values, then median of
    * absolute deviations), both rounded to 6 decimals before use so
    * the engines' interpolation ulp drift cannot flip a comparison;
    * events are then flagged where |value − med| > 5·MAD.
    *
    * Scale: the stats relation is one row per topic — broadcast both
    * joins; the events side is scanned twice (two percentile passes)
    * but never shuffles on the scoring pass. At 100 TB the second pass
    * rides the same partition layout as the first (no repartition
    * between them), and percentile can be swapped for the two-level
    * bucketed form if a single-pass approximation is acceptable.
    */
  def madAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
    val med = ev.groupBy(col("event_type").as("topic"))
      .agg(round(percentile(col("value"), lit(0.5)), 6).as("med"))
    val mad = ev.as("e")
      .join(broadcast(med).as("m"), col("e.event_type") === col("m.topic"))
      .groupBy(col("m.topic").as("topic"))
      .agg(round(percentile(abs(col("e.value") - col("m.med")), lit(0.5)), 6).as("mad"))
    ev.as("e")
      .join(broadcast(med).as("m"), col("e.event_type") === col("m.topic"))
      .join(broadcast(mad).as("d"), col("m.topic") === col("d.topic"))
      // mad = 0 (a majority-constant topic) would make every deviation
      // "anomalous" and the score division-by-zero — gate like the
      // reference's stddev≠0 guard (lib/dsl/DSLHandler.js:191)
      .filter(col("d.mad") > 0 &&
        abs(col("e.value") - col("m.med")) > lit(MadK) * col("d.mad"))
      .select(
        col("e.event_id").as("event_id"),
        col("m.topic").as("topic"),
        col("e.value").as("value"),
        col("m.med").as("med"),
        col("d.mad").as("mad"),
        round((col("e.value") - col("m.med")) / col("d.mad"), 6).as("rscore"),
      )
  }

  val madAnomalySql: String =
    s"""
    WITH med AS (
      SELECT event_type AS topic, round(quantile_cont(value, 0.5), 6) AS med
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type AS topic,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m ON e.event_type = m.topic
      WHERE e.value IS NOT NULL
      GROUP BY 1
    )
    SELECT e.event_id, e.event_type AS topic, e.value, m.med, d.mad,
           round((e.value - m.med) / d.mad, 6) AS rscore
    FROM events e
    JOIN med m ON e.event_type = m.topic
    JOIN dev d ON e.event_type = d.topic
    WHERE e.value IS NOT NULL AND d.mad > 0
      AND abs(e.value - m.med) > $MadK * d.mad"""

  // ---- q_seasonal_anomaly --------------------------------------------

  /** Residual z-score threshold against the seasonal baseline. */
  val SeasonalZ = 3.0

  /** Seasonal-baseline anomaly detection: the global mean/stddev the
    * reference z-scores against flags every rush hour as anomalous; a
    * per-(topic, hour-of-day) baseline scores each event against its
    * OWN season's statistics — the standard monitoring upgrade.
    * Stats use the exact-decimal sum/sumsq shapes (graft.functions
    * .Exact) and the reference's gates (≥ 3 samples, stddev ≠ 0).
    *
    * Scale: the baseline is topics × 24 rows — broadcast; the event
    * side computes hour-of-day as a codegen projection and never
    * shuffles. Identical plan shape to `q_anomaly`, different
    * dimension key.
    */
  def seasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Exact
    val base = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("event_type").as("topic"),
        pmod(expr("unix_micros(ts) div 3600000000"), lit(24)).as("hod"), col("value"))
    val stats = base.groupBy(col("topic"), col("hod"))
      .agg(count(lit(1)).as("cnt"),
        Exact.exactSum(col("value")).as("sumv"),
        Exact.exactSumSq(col("value")).as("sumsq"))
      .select(col("topic"), col("hod"), col("cnt"),
        (col("sumv") / col("cnt")).as("mean"),
        Exact.popStddev(col("sumsq"), col("sumv") / col("cnt"), col("cnt")).as("stddev"))
      .filter(col("cnt") >= 3 && col("stddev") > 0)
    base.as("e")
      .join(broadcast(stats).as("s"),
        col("e.topic") === col("s.topic") && col("e.hod") === col("s.hod"))
      .filter(abs((col("e.value") - col("s.mean")) / col("s.stddev")) > lit(SeasonalZ))
      .select(
        col("e.event_id").as("event_id"),
        col("e.topic").as("topic"),
        col("e.hod").as("hod"),
        col("e.value").as("value"),
        round(col("s.mean"), 6).as("mean_hod"),
        round(col("s.stddev"), 6).as("stddev_hod"),
        round((col("e.value") - col("s.mean")) / col("s.stddev"), 6).as("z"),
      )
  }

  val seasonalAnomalySql: String =
    s"""
    WITH b AS (
      SELECT event_id, event_type AS topic,
             (((epoch_us(ts) // 3600000000) % 24) + 24) % 24 AS hod, value
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    m AS (
      SELECT topic, hod, count(*) AS cnt,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sumv,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sumsq
      FROM b GROUP BY 1, 2
    ),
    s AS (
      SELECT topic, hod, cnt, sumv / cnt AS mean,
             sqrt(greatest(sumsq / cnt - (sumv / cnt) * (sumv / cnt), 0.0)) AS stddev
      FROM m WHERE cnt >= 3
    )
    SELECT e.event_id, e.topic, e.hod, e.value,
           round(s.mean, 6) AS mean_hod,
           round(s.stddev, 6) AS stddev_hod,
           round((e.value - s.mean) / s.stddev, 6) AS z
    FROM b e JOIN s ON e.topic = s.topic AND e.hod = s.hod
    WHERE s.stddev > 0 AND abs((e.value - s.mean) / s.stddev) > $SeasonalZ"""

  // ---- q_ewma --------------------------------------------------------

  /** EWMA smoothing factor — 1/4 is exactly representable in binary so
    * `s·0.75 + x·0.25` is the identical IEEE computation in any engine.
    */
  val EwmaAlpha = 0.25

  /** Per-topic EWMA and CUSUM drift statistics over the event-id-ordered
    * value sequence.
    *
    * EWMA folds `s ← s·0.75 + x·0.25` from the first value; CUSUM folds
    * `c ← max(0, c + (x − mean))` from 0 with the exact-decimal global
    * mean as the target — the textbook one-sided change detector: a
    * persistent upward shift accumulates, noise resets to 0. Both are
    * left folds (`functions.aggregate`), bit-identical to the oracle's
    * `list_reduce` because the sequence of IEEE operations is the same.
    *
    * Scale: a sequential per-key fold is inherently ordered — the
    * DataFrame form (sort + collect_list per key) is right when per-key
    * history fits an executor (here: ≤ tens of MB per topic). At 100 TB
    * the same fold runs incrementally as keyed streaming state
    * ([[graft.streaming.DriftState]]) with O(1) memory per key, or
    * segment-wise: EWMA over a partitioned series composes as
    * `s_out = s_in·0.75^n + partial` with per-segment prefolds.
    */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
    val mean = ev.groupBy(col("event_type").as("topic"))
      .agg((graft.functions.Exact.exactSum(col("value")) / count(lit(1))).as("mean"),
        count(lit(1)).as("n"))
    val series = ev
      .groupBy(col("event_type").as("topic"))
      .agg(array_sort(collect_list(struct(col("event_id"), col("value")))).as("ordered"))
      .withColumn("vals", transform(col("ordered"), r => r.getField("value")))
      .drop("ordered")
    series.as("l")
      .join(broadcast(mean).as("m"), col("l.topic") === col("m.topic"))
      .select(
        col("l.topic").as("topic"),
        col("m.n").as("n"),
        round(col("m.mean"), 6).as("mean"),
        round(
          aggregate(
            slice(col("vals"), lit(2), greatest(size(col("vals")) - 1, lit(0))),
            element_at(col("vals"), 1),
            (s, x) => s * lit(0.75) + x * lit(0.25)),
          6).as("ewma_last"),
        round(
          aggregate(col("vals"), lit(0.0),
            (c, x) => greatest(lit(0.0), c + (x - col("m.mean")))),
          6).as("cusum"),
      )
  }

  val ewmaSql: String =
    """
    WITH m AS (
      SELECT event_type AS topic,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / count(*) AS mean,
             count(*) AS n
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    l AS (
      SELECT event_type AS topic, list(value ORDER BY event_id) AS vals
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    )
    SELECT l.topic, m.n, round(m.mean, 6) AS mean,
           round(list_reduce(l.vals, (s, x) -> s * 0.75 + x * 0.25), 6) AS ewma_last,
           round(list_reduce(list_prepend(0.0, l.vals),
                 (c, x) -> greatest(0.0, c + (x - m.mean))), 6) AS cusum
    FROM l JOIN m ON l.topic = m.topic"""
}
