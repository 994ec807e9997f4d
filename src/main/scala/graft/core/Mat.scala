package graft.core

import org.apache.spark.sql.DataFrame

/** Materialization boundary for multi-consumer intermediates.
  *
  * Every batch operator that derives an expensive relation once and
  * reads it from several branches needs a boundary so the subplan does
  * not re-execute per consumer. A bare `.persist()` gives that boundary
  * but LEAKS outside the Bench/Verify harness: the cache is registered
  * in the session's CacheManager and survives until an explicit
  * `unpersist`/`clearCache`, so a library caller composing these
  * operators accumulates dead caches for the life of the session. An
  * eager `localCheckpoint` is the self-releasing form — the
  * materialized blocks are tied to the checkpointed RDD and the
  * ContextCleaner frees them as soon as the relation is
  * garbage-collected, no harness discipline required. (At cluster
  * scale the equivalent move is writing the intermediate to storage
  * once and reading it back; executor loss mid-query is the accepted
  * trade, as with every localCheckpoint in this engine.)
  *
  * [[transparent]] is a test seam for the plan guards only: PlanSpec
  * asserts properties of subplans (codegen expressions, window
  * partitioning) that an eager checkpoint hides behind an RDD scan, so
  * those tests flip the boundary to identity, inspect the full logical
  * tree, and restore it. Production and the driver contract always run
  * with the boundary on.
  */
object Mat {
  @volatile private[graft] var transparent = false

  def apply(df: DataFrame): DataFrame =
    if (transparent) df else df.localCheckpoint(eager = true)

  /** Postfix form: `relation.mat` reads like `.persist()` at the call
    * site but is self-releasing (see the object doc).
    */
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def mat: DataFrame = Mat(df)
  }
}
