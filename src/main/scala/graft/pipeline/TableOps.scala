package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Lakehouse table-maintenance operators: CDC-style snapshot diffing
  * (the MERGE-feed: classify every key as insert/update/delete/
  * unchanged between two table versions) and z-order layout clustering
  * (multi-dimensional sort keys so file-level min/max statistics prune
  * scans on either dimension). Both are batch table operations a
  * 100 TB corpus needs continuously: incremental ingestion diffs
  * yesterday's snapshot against today's; layout clustering keeps data
  * skipping effective as data arrives unordered.
  */
object TableOps {

  // ---- q_snapshot_diff -----------------------------------------------

  /** Snapshot diff / CDC classification between two table versions,
    * derived deterministically from `documents`: the "old" snapshot is
    * the even doc_ids, the "new" snapshot the ids divisible by 3, with
    * every 12th document's text rewritten (upper-cased) to model an
    * in-place update. One full outer join on the unique key plus a
    * payload-hash comparison yields the change feed.
    *
    * Scale: the canonical CDC merge plan — a single co-partitioned
    * sort-merge full outer join on the primary key (unique keys, no
    * skew), comparing 16-byte md5 payload hashes instead of full
    * payloads so the wide columns never participate in the shuffle.
    */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // presence markers classify insert/delete (NOT payload-hash
    // nullness: a NULL payload is a legal row value, so insert/delete
    // must key on which SIDE the key appeared, and update on null-safe
    // hash inequality)
    val oldSnap = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), md5(col("text")).as("old_md5"), lit(true).as("in_old"))
    val newSnap = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 12 === 0, upper(col("text"))).otherwise(col("text")))
          .as("new_md5"), lit(true).as("in_new"))
    oldSnap.as("o").join(newSnap.as("n"), Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("in_old").isNull, lit("insert"))
          .when(col("in_new").isNull, lit("delete"))
          .when(!(col("old_md5") <=> col("new_md5")), lit("update"))
          .otherwise(lit("unchanged")).as("change_type"),
        col("old_md5"),
        col("new_md5"),
      )
  }

  val snapshotDiffSql: String =
    """
    WITH old AS (
      SELECT doc_id, md5(text) AS old_md5 FROM documents WHERE doc_id % 2 = 0
    ),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 12 = 0 THEN upper(text) ELSE text END) AS new_md5
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'insert'
                WHEN n.doc_id IS NULL THEN 'delete'
                WHEN o.old_md5 IS DISTINCT FROM n.new_md5 THEN 'update'
                ELSE 'unchanged' END AS change_type,
           o.old_md5, n.new_md5
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id"""

  // ---- q_zorder ------------------------------------------------------

  /** Bits per dimension in the z-value (8 → 16-bit interleaved key). */
  val ZBits = 8

  /** Z-order (Morton) clustering of events on (user bucket, hour
    * bucket): interleave the low 8 bits of each dimension into a 16-bit
    * z-value, cluster on the high 6 bits (64 clusters ≈ target files),
    * and report per-cluster min/max of both dimensions — exactly the
    * file-statistics footprint a scan planner prunes with. Tight
    * per-cluster ranges on BOTH dimensions are the point of z-ordering
    * vs a linear sort (tight on one, full-range on the other).
    *
    * Scale: the z-value is a pure per-row codegen projection; writing
    * clustered files is then `repartitionByRange(zval)` + sortWithin —
    * one range shuffle, the same cost as any global sort, paid once to
    * make every later scan on either dimension prune.
    */
  def zorder(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val z = ev
      // pmod on BOTH dims: a sign-preserving % would feed negative
      // values into the bit interleave (garbage for pre-1970 ts or
      // negative ids); the oracle mirrors with ((x % m) + m) % m
      .withColumn("ux", pmod(col("user_id"), lit(256)))
      .withColumn("tx", pmod(expr("unix_micros(ts) div 3600000000"), lit(256)))
      // UNROLLED bit interleave: the higher-order `aggregate` form is
      // interpreted per row (HOFs don't codegen — guide step 4, the
      // agreeSql lesson); eight literal shift/mask terms compile into
      // the stage's generated code. Arithmetic identical.
      .withColumn("zval",
        expr((0 to 7).map(i =>
          s"shiftleft(shiftright(ux, $i) & 1, ${2 * i}) + " +
            s"shiftleft(shiftright(tx, $i) & 1, ${2 * i + 1})")
          .mkString("CAST(", " + ", " AS BIGINT)")))
    z.groupBy(shiftright(col("zval"), 10).as("zcluster"))
      .agg(
        count(lit(1)).as("n"),
        min(col("ux")).as("ux_lo"), max(col("ux")).as("ux_hi"),
        min(col("tx")).as("tx_lo"), max(col("tx")).as("tx_hi"),
      )
  }

  val zorderSql: String =
    """
    WITH b AS (
      SELECT ((user_id % 256) + 256) % 256 AS ux,
             (((epoch_us(ts) // 3600000000) % 256) + 256) % 256 AS tx
      FROM events
    ),
    z AS (
      SELECT ux, tx,
             CAST(list_sum([(((ux >> i) & 1) << (2 * i)) + (((tx >> i) & 1) << (2 * i + 1))
                       for i in generate_series(0, 7)]) AS BIGINT) AS zval
      FROM b
    )
    SELECT zval >> 10 AS zcluster, count(*) AS n,
           min(ux) AS ux_lo, max(ux) AS ux_hi,
           min(tx) AS tx_lo, max(tx) AS tx_hi
    FROM z GROUP BY 1"""

  // ---- q_compaction_plan ---------------------------------------------

  /** Compaction bin target (bytes per output file). */
  val CompactionTarget = 4000L

  /** Small-file compaction planning: pack each source's documents
    * (stand-ins for data files, sized by n_chars) into sequential bins
    * of ~[[CompactionTarget]] bytes via a prefix-sum partitioner —
    * `bin = floor(bytes_before / target)` — and report each planned
    * output file's count, size, and id range. This is the maintenance
    * pass that turns a million 100 KB files into target-sized ones so
    * scan task counts stop exploding.
    *
    * Scale: one window pass per source (running sum, partitioned — no
    * global window) and one hash agg. Pure integer math; the plan is
    * deterministic, so retries and the oracle agree exactly. The
    * prefix-sum rule bounds every bin by target + one file, the same
    * guarantee a greedy sequential packer gives without being
    * order-sensitive to parallel execution.
    */
  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val bySrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(bySrc))
      .withColumn("bin", expr(s"(cum - n_chars) div $CompactionTarget"))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
      )
  }

  val compactionPlanSql: String =
    s"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM documents
    )
    SELECT source, (cum - n_chars) // $CompactionTarget AS bin,
           count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1, 2"""
}
