package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the round-17 nested-window restructure of the trailing-stats
  * aggregation: the smallest-containing-window partial form must be
  * BIT-identical to the explicit explode-per-window form (decimal
  * partials merge associatively; the trim + double conversion happens
  * once after the merge). Randomized values with >6-decimal doubles
  * exercise the decimal rounding edge; boundary ages exercise the
  * window-edge inclusivity.
  */
class NestedTrailingSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Exact._

  private val t0 = Timestamp.valueOf("2024-03-01 12:00:00")
  private def at(secAgo: Long) = new Timestamp(t0.getTime - secAgo * 1000)

  test("nested smallest-window partials == explode-per-window, bit for bit") {
    val windows = Seq(60L, 3600L, 43200L, 604800L)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val topic = s"t${i % 3}"
      val path = if (i % 2 == 0) "value" else "props.k"
      // ages land on and around every window boundary, plus a few
      // beyond the max window and one in the future (must drop)
      val age = Seq(0L, 59L, 60L, 61L, 3599L, 3600L, 3601L, 43200L,
        604800L, 604801L, 900000L, -5L)(i % 12) + (i / 12) * 7L
      (topic, path, rnd.nextDouble() * 400 - 100, at(age))
    }
    val df = rows.toDF("topic", "path", "value", "produced")

    val reference = df
      .withColumn("window_sec", explode(array(windows.map(lit): _*)))
      .filter(unix_micros(col("produced")) >=
        unix_micros(lit(t0)) - col("window_sec") * lit(1000000L))
      .filter(unix_micros(col("produced")) <= unix_micros(lit(t0)))
      .groupBy(col("topic"), col("path"), col("window_sec"))
      .agg(count(lit(1)).as("cnt"),
        exactSum(col("value")).as("sumv"),
        exactSumSq(col("value")).as("sumsq"))
      .withColumn("mean", col("sumv") / col("cnt"))
      .withColumn("stddev_pop", popStddev(col("sumsq"), col("mean"), col("cnt")))
      .filter(col("cnt") >= graft.core.Dsl.MinSamples)
      .filter(col("mean") =!= 0.0 && col("stddev_pop") =!= 0.0)
      .select(col("topic"), col("path"), col("window_sec"), col("cnt"),
        col("mean"), col("stddev_pop"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        // bit-exactness, not approximate equality
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(5))))
      .toSet

    val nested = WindowStats.rawTrailingStats(df, windows, lit(t0))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(5))))
      .toSet

    assert(nested == reference)
    assert(nested.nonEmpty)
  }

  test("future samples (produced > now) are excluded") {
    val df = Seq(("t", "f", 10.0, at(-5)), ("t", "f", 20.0, at(5)),
      ("t", "f", 30.0, at(6)), ("t", "f", 40.0, at(7)))
      .toDF("topic", "path", "value", "produced")
    val out = WindowStats.rawTrailingStats(df, Seq(60L), lit(t0)).collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(3L))
  }
}
