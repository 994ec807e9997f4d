package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loading for the driver test data (TESTDATA.md).
  *
  * The driver parquet stores timestamps as TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects; we read them as nano longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to micros
  * timestamps (the data is micro-precise: every nano value is a
  * multiple of 1000).
  */
object Tables {

  private val nanoTimestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"),
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanoTimestampCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, expr(s"timestamp_micros($c DIV 1000)"))
      else d
    }
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
