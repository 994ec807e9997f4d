package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loading for the driver test data (TESTDATA.md).
  *
  * The driver regenerates the parquet between rounds and the physical
  * timestamp encoding has changed before (TIMESTAMP(NANOS) in rounds
  * 1-5, `timestamp[us]` without timezone — i.e. TIMESTAMP_NTZ to
  * Spark 4 — from round 6). Every query downstream assumes plain
  * session-UTC `TIMESTAMP`, so `load` normalizes the declared
  * timestamp columns from ANY physical encoding it may meet:
  *
  *   - `LongType` — legacy nanos-as-long read (`nanosAsLong`);
  *     nano values are micro-precise, so `DIV 1000` is exact.
  *   - `TimestampNTZType` — cast to `TIMESTAMP`; the session zone is
  *     UTC in every entry point, so the wall-clock values match what
  *     DuckDB reads from the same file.
  *   - `TimestampType` — already the target type, pass through.
  */
object Tables {

  private val timestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"),
  )

  /** Normalize one column to session-UTC TIMESTAMP regardless of how the
    * parquet file physically stored it. Exposed for TablesSpec.
    */
  private[graft] def normalizeTimestamp(d: DataFrame, c: String): DataFrame =
    if (!d.columns.contains(c)) d
    else d.schema(c).dataType match {
      case LongType => d.withColumn(c, expr(s"timestamp_micros($c DIV 1000)"))
      case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
      case _ => d
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    timestampCols.getOrElse(name, Nil).foldLeft(df)(normalizeTimestamp)
  }

  /** Scale-adaptive map-side parallelism for per-row-HEAVY subplans
    * (JSON extraction, tokenization, shingling, wide aggregation).
    *
    * The driver's tables are single-file, single-row-group parquet, so
    * a scan is ONE unsplittable task regardless of `maxPartitionBytes`
    * — on local[32] every downstream per-row stage runs on 1 of 32
    * cores until the first exchange (measured: q_profile's partial
    * aggregate spent 1.76 s in a 1-task stage, 2.6 s of its 2.7 s
    * total). At production scale a 100 TB input arrives as many
    * splits, so this helper is a NO-OP there: it redistributes only
    * when the scan yields fewer partitions than the session's cores
    * (`defaultParallelism`), i.e. exactly the small-input case where
    * one shuffle of the (tiny) table buys full-width compute. Guide
    * §2: derive partitioning from input size, never a constant.
    *
    * With `keys` the redistribution is hash partitioning on those
    * columns (no pre-shuffle sort, deterministic under retries);
    * without, deterministic round-robin (Spark sorts each input
    * partition first — SPARK-23207 — so retried tasks reproduce the
    * same assignment). Only for order-insensitive consumers
    * (aggregation, join, explode-then-aggregate).
    */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
