package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.IncrementalProfile

/** Persisted per-crawl PROFILE STATE — the cross-JOB form of the
  * session profile-state memo ([[graft.queries.IncrementalProfile]]),
  * completing the same lifecycle the index triple has: each crawl
  * appends its 6 state rows (scalar metrics + the ≤K-long KMV array
  * per column, tagged with the snapshot id) at ingest, and every
  * later consumer — the estate profile, any pairwise drift gate, a
  * retention delete — reads ONLY this table. The table is O(columns ×
  * snapshots) rows of O(K) payload: kilobytes per crawl at ANY corpus
  * size, so unlike the signature/phash/embed indexes there is nothing
  * to bucket — the scale story is that the table is trivially small,
  * not that its joins co-locate.
  *
  * Retention is exact, not compensating: because every metric is a
  * pure fold over its snapshot's rows, expiring a crawl is just
  * dropping its state rows and re-folding the survivors — no
  * re-scan, no tombstones, no approximation debt (contrast a
  * decayed-counter design, which can never un-count an expired
  * crawl exactly).
  */
object ProfileStateStore {

  /** Append one crawl's profile state. The crawl's ONE raw scan
    * happens here, ever; pass `mode = Overwrite` to start a fresh
    * estate table.
    */
  def write(events: DataFrame, table: String, snapshot: String,
      mode: SaveMode = SaveMode.Append): Unit = {
    if (mode == SaveMode.Overwrite)
      TableUtil.dropTableAndLocation(events.sparkSession, table)
    IncrementalProfile.stateOf(events)
      .withColumn("snapshot", lit(snapshot))
      .write.mode(mode).format("parquet").saveAsTable(table)
  }

  /** All held state rows (optionally restricted to some snapshots). */
  def read(spark: SparkSession, table: String,
      snapshots: Seq[String] = Nil): DataFrame = {
    val t = spark.table(table)
    if (snapshots.isEmpty) t else t.filter(col("snapshot").isin(snapshots: _*))
  }

  /** The estate profile over the held snapshots — identical output
    * (and oracle shape) to the single-pass `q_profile_approx` over
    * the concatenated crawls; no raw scan.
    */
  def profile(spark: SparkSession, table: String,
      snapshots: Seq[String] = Nil): DataFrame =
    IncrementalProfile.profileOfStates(
      read(spark, table, snapshots).drop("snapshot"))

  /** The cross-crawl drift gate between two held snapshots. */
  def drift(spark: SparkSession, table: String,
      history: String, arriving: String): DataFrame =
    IncrementalProfile.driftOf(
      read(spark, table, Seq(history)).drop("snapshot"),
      read(spark, table, Seq(arriving)).drop("snapshot"))

  /** RETENTION: expire a crawl from the estate. State rows are the
    * only thing deleted — every downstream number re-folds exactly
    * from the survivors. The rewrite is O(state), i.e. kilobytes.
    *
    * CRASH-SAFE: the survivors are written to a durable side table
    * FIRST, and only then does the estate table drop and take the
    * rename — so no failure window loses the estate's profile state
    * (which by design cannot be rebuilt without re-scanning every
    * crawl). A crash before the drop leaves the estate intact (plus a
    * stale side table the next retention clears); a crash between the
    * drop and the rename leaves the complete survivor set durable
    * under `<table>__retain`, recovered by re-issuing the rename. The
    * earlier localCheckpoint form held the only copy of the survivors
    * in executor memory across the drop — one executor loss away from
    * losing the estate.
    */
  def removeSnapshot(spark: SparkSession, table: String, snapshot: String): Unit = {
    val side = s"${table}__retain"
    // RECOVERY FIRST: a prior attempt that crashed between the drop and
    // the rename left the survivors ONLY under the side table — the
    // side must be promoted, never cleared, when the main is missing.
    // Under the default in-memory catalog a fresh JVM has no catalog
    // entry for either name, so recovery reads the side's warehouse
    // FILES (the durable artifact) when the catalog cannot rename.
    // After promotion the normal path below re-applies the filter,
    // which is idempotent for a same-snapshot retry.
    if (!spark.catalog.tableExists(table)) {
      if (spark.catalog.tableExists(side)) {
        spark.sql(s"ALTER TABLE `$side` RENAME TO `$table`")
      } else {
        val wh = graft.core.DatasetStore.warehousePath(spark)
        val mainDir = wh.resolve(table.toLowerCase(java.util.Locale.ROOT))
        val sideDir = wh.resolve(side.toLowerCase(java.util.Locale.ROOT))
        if (java.nio.file.Files.isDirectory(mainDir)) {
          // The MAIN table's files are intact — a healthy estate seen
          // from a fresh JVM (in-memory catalog forgot the entry, the
          // warehouse did not), or a crash in the window "side written,
          // main not yet dropped". Either way the main files are the
          // authoritative complete estate: re-register them IN PLACE
          // (saveAsTable would throw LOCATION_ALREADY_EXISTS over its
          // own files). Any side files are a stale earlier attempt,
          // cleared by the normal path below.
          spark.sql(s"CREATE TABLE `$table` USING parquet LOCATION '${mainDir.toUri}'")
        } else {
          // Main files gone: only the crash window "main dropped,
          // rename not issued" reaches here, and the survivors live
          // solely under the side table's files — promote, never clear.
          require(java.nio.file.Files.isDirectory(sideDir),
            s"profile state lost: neither $table nor $side exists (no files at $sideDir)")
          spark.read.parquet(sideDir.toString)
            .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
          TableUtil.deletePath(sideDir.toString)
        }
      }
    }
    TableUtil.dropTableAndLocation(spark, side) // stale leftover, main known good
    read(spark, table).filter(col("snapshot") =!= snapshot)
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(side)
    TableUtil.dropTableAndLocation(spark, table)
    spark.sql(s"ALTER TABLE `$side` RENAME TO `$table`")
  }
}
