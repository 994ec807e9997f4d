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
