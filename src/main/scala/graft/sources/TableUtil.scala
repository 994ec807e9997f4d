package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared managed-table hygiene for the persisted index writers.
  *
  * With the default in-memory catalog, a managed table's WAREHOUSE
  * DIRECTORY outlives the session that wrote it while the catalog
  * entry does not — so a fresh JVM overwriting the "same" table sees
  * `LOCATION_ALREADY_EXISTS` (the catalog has nothing to overwrite,
  * but the location is occupied by the previous run's files). An
  * overwrite-mode index write must therefore clear BOTH: the catalog
  * entry if present, and the stale location if orphaned. (A Hive
  * metastore deployment does not hit this — the catalog entry
  * persists with the files — but the library must be safe under the
  * default catalog the driver contract runs with.)
  */
private[graft] object TableUtil {

  /** Drop `table` from the catalog and delete its default warehouse
    * location if the directory exists (orphaned by a previous JVM).
    */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, table.toLowerCase(java.util.Locale.ROOT))
    if (loc.exists()) deleteRecursively(loc)
  }

  /** Read a bucketed table's parquet files RAW — same rows, but the
    * scan carries NO bucket-partitioning claim. Compaction ([[
    * SignatureIndex.merge]] and friends) must read its inputs this
    * way: Spark 4.1's UnionExec propagates compatible children
    * bucket-partitioning, yet executes a concatenating union — a
    * clustering-requiring operator (aggregate, window) planned over a
    * union of identically-bucketed scans then gets NO exchange (an
    * explicit repartition is even elided as redundant), and same-key
    * rows from different snapshots never meet: duplicate groups,
    * per-snapshot ranks (IndexMergeSpec caught the duplicate groups).
    * A raw file scan makes no partitioning claim, so the normal
    * exchange is planned and the merge pays exactly the one
    * co-locating shuffle it budgets.
    */
  def rawTable(spark: SparkSession, table: String): org.apache.spark.sql.DataFrame = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    // the catalog schema, not inference: an EMPTY snapshot lane (a
    // crawl that matched nothing) has a location with no parquet files,
    // and schema inference would fail where the catalog knows the shape
    spark.read.schema(meta.schema).parquet(meta.location.toString)
  }

  /** Delete a filesystem path recursively (no catalog interaction). */
  def deletePath(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) deleteRecursively(f)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
