package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.load` against every physical timestamp encoding the
  * driver testdata has shipped so far, so a regeneration of
  * /root/testdata cannot silently brick the engine again (the round-6
  * incident: rounds 1-5 wrote TIMESTAMP(NANOS), round 6 switched to
  * `timestamp[us]` no-tz = TIMESTAMP_NTZ, and the loader only handled
  * the legacy long case — 29 queries and 16 tests went down).
  */
class TablesSpec extends SparkSpec {

  private val wall = "2024-03-01 12:34:56.789012"

  private def roundTrip(outType: DataType): Timestamp = {
    val dir = Files.createTempDirectory("tables-spec").toFile
    dir.deleteOnExit()
    val sfDir = dir.getAbsolutePath
    spark.range(1)
      .select(lit(1L).as("event_id"), to_timestamp(lit(wall)).cast(outType).as("ts"))
      .write.mode("overwrite").parquet(s"$sfDir/events.parquet")
    val loaded = Tables.events(spark, sfDir)
    assert(loaded.schema("ts").dataType === TimestampType,
      s"ts must normalize to TIMESTAMP, got ${loaded.schema("ts").dataType}")
    loaded.select(col("ts")).head.getTimestamp(0)
  }

  private val expected = Timestamp.valueOf(wall)

  test("load normalizes TIMESTAMP_NTZ (round-6+ testdata encoding) to session-UTC TIMESTAMP") {
    assert(roundTrip(TimestampNTZType) === expected)
  }

  test("load passes through plain TIMESTAMP unchanged") {
    assert(roundTrip(TimestampType) === expected)
  }

  test("load converts legacy nanos-as-long to TIMESTAMP") {
    // Simulate the rounds-1-5 shape: after nanosAsLong the column arrives
    // as a LongType of nanoseconds; write it as a long and let the
    // loader's LongType branch do the DIV 1000 conversion.
    val dir = Files.createTempDirectory("tables-spec-nanos").toFile
    dir.deleteOnExit()
    val sfDir = dir.getAbsolutePath
    spark.range(1)
      .select(
        lit(1L).as("event_id"),
        (unix_micros(to_timestamp(lit(wall))) * lit(1000L)).as("ts"))
      .write.mode("overwrite").parquet(s"$sfDir/events.parquet")
    val loaded = Tables.events(spark, sfDir)
    assert(loaded.schema("ts").dataType === TimestampType)
    assert(loaded.select(col("ts")).head.getTimestamp(0) === expected)
  }

  test("load normalizes declared columns on the real driver tables when present") {
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(sfDir).isDirectory) {
      for ((t, c) <- Seq("events" -> "ts", "lineitem" -> "l_shipdate", "orders" -> "o_orderdate")) {
        val df = Tables.load(spark, sfDir, t)
        assert(df.schema(c).dataType === TimestampType, s"$t.$c")
        assert(df.limit(1).count() === 1L, s"$t readable")
      }
    } else cancel(s"$sfDir not present")
  }
}
