package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

import graft.queries.Tables

/** File-based message sources in the SAME (topic, key, value, ts) shape
  * the Kafka decode stage emits — so the whole anomaly pipeline (and
  * every batch query built on `Extraction.longFormat`) can run from
  * files for replay, backfill, and testing, not only from a live
  * broker. The reference can ONLY consume Kafka
  * (/root/reference/lib/Stream.js:24-41); file replay is the
  * engine-side generalization a Spark user expects.
  *
  * Scale: all readers take an EXPLICIT schema — no inference pass over
  * 100 TB — and parallelize by file split like any Spark scan; the
  * malformed-row guard (F1) is the same null filter the Kafka decode
  * applies. Streaming variants use `readStream` with `maxFilesPerTrigger`
  * left to the caller's option map.
  */
object MessageSources {

  /** The canonical decoded-message schema (matches
    * `AnomalyPipeline.decodeKafka` output and `Message`).
    */
  val MessageSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("ts", TimestampType),
  ))

  private def guard(df: DataFrame): DataFrame =
    df.filter(col("topic").isNotNull && col("value").isNotNull) // F1

  /** JSON-lines messages: {"topic":..,"key":..,"value":..,"ts":..}. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    guard(spark.read.schema(MessageSchema).json(path))

  /** CSV messages with a header row (topic,key,value,ts). RFC-4180
    * quoting: a doubled quote inside a quoted field is an escaped quote
    * (Spark's default escape is backslash, which no standard CSV writer
    * emits).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    guard(spark.read.schema(MessageSchema)
      .option("header", "true").option("escape", "\"").csv(path))

  /** ORC messages (same logical schema). ORC rides Spark's built-in
    * datasource: columnar with min/max stripe statistics, so the F1
    * guard's IsNotNull predicates push into stripe pruning — the
    * right archival format for replay corpora that get re-read often.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    guard(spark.read.schema(MessageSchema).orc(path))

  /** Streaming ORC source (file-arrival replay, like [[jsonlStream]]). */
  def orcStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    guard(spark.readStream.schema(MessageSchema).options(options).orc(path))

  /** Streaming JSON-lines source — drop-in for the Kafka source in
    * `AnomalyPipeline.run` (file-arrival replay). Pass reader options
    * (e.g. maxFilesPerTrigger to rate-limit a backfill) via `options`.
    */
  def jsonlStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    guard(spark.readStream.schema(MessageSchema).options(options).json(path))

  /** The driver's `events` parquet re-expressed as messages:
    * topic = event_type, key = user_id, value = a JSON payload carrying
    * the numeric `value` and the raw `props` object — the batch replay
    * adapter that feeds the full pipeline from the test tables.
    */
  def eventsAsMessages(spark: SparkSession, sfDir: String): DataFrame =
    guard(Tables.events(spark, sfDir).select(
      col("event_type").as("topic"),
      col("user_id").cast("string").as("key"),
      concat(lit("""{"value":"""),
        coalesce(col("value").cast("string"), lit("null")),
        lit(""","props":"""), coalesce(col("props"), lit("null")),
        lit("}")).as("value"),
      col("ts"),
    ))
}
