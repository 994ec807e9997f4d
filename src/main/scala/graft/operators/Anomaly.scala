package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-score anomaly detection: each sample inside a trailing window is
  * judged against that window's (mean, stddev_pop);
  * `three_sigma = (value - mean) / (3 * stddev)`, anomaly iff |z| > 1
  * (reference: lib/dsl/DSLHandler.js:191-192 — the 68-95-99.7 rule).
  *
  * The stats side is tiny (one row per (topic, path, window)) so the join
  * is an explicit broadcast hash join — the stream side never shuffles.
  * This is the Spark restatement of the reference's per-message lookup of
  * the cached stats snapshot (lib/dsl/DSLHandler.js:180-189), an equi
  * inner join: samples whose key has no valid stats are dropped.
  */
object Anomaly {

  /** Detect anomalies among `samples` (long format: topic, path, value,
    * produced, plus any carry-through columns) against a `stats` relation
    * (topic, path, window_sec, cnt, mean, stddev_pop). Samples are
    * window-filtered against `now` so each is only judged within windows
    * that contain it.
    */
  def detect(samples: DataFrame, stats: DataFrame, now: Column): DataFrame = {
    val joined = samples.join(broadcast(stats), Seq("topic", "path"), "inner")
      .filter(
        unix_micros(col("produced")) >= unix_micros(now) - col("window_sec") * lit(1000000L)
      )
      .filter(unix_micros(col("produced")) <= unix_micros(now))
    score(joined)
  }

  /** Score pre-joined rows (value, mean, stddev_pop present). */
  def score(joined: DataFrame): DataFrame =
    joined
      // F5 Infinity guard (stdDev == 0 -> z infinite; reference drops it,
      // lib/dsl/DSLHandler.js:194-197). Guarding before the division also
      // keeps the expression ANSI-safe.
      .filter(col("stddev_pop") =!= 0.0)
      .withColumn("three_sigma", (col("value") - col("mean")) / (lit(3.0) * col("stddev_pop")))
      // F4 anomaly predicate (lib/dsl/DSLHandler.js:191-192)
      .filter(col("three_sigma") > 1.0 || col("three_sigma") < -1.0)
}
