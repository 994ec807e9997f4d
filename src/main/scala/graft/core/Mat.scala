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
  * [[withTransparent]] is a test seam for the plan guards only:
  * PlanSpec asserts properties of subplans (codegen expressions,
  * window partitioning) that an eager checkpoint hides behind an RDD
  * scan, so those tests build the plan inside the seam, inspect the
  * full logical tree, and the boundary is restored on exit. The seam
  * is THREAD-CONFINED (a DynamicVariable, not a process global):
  * under parallel test execution or concurrent plan construction, one
  * thread's transparent window can never leak into another thread's
  * plans. Callers that fan plan construction out to worker threads
  * (e.g. the keep-list legs) capture the current value and re-scope
  * it on the workers. Production and the driver contract always run
  * with the boundary on.
  */
object Mat {
  private val transparentVar = new scala.util.DynamicVariable[Boolean](false)

  /** Whether the current THREAD is inside a transparent window. */
  private[graft] def isTransparent: Boolean = transparentVar.value

  /** Run `body` with the boundary flipped to identity (or explicitly
    * re-scoped, for propagating a captured value onto a worker
    * thread) for the current thread only.
    */
  private[graft] def withTransparent[T](on: Boolean = true)(body: => T): T =
    transparentVar.withValue(on)(body)

  def apply(df: DataFrame): DataFrame =
    if (transparentVar.value) df else df.localCheckpoint(eager = true)

  /** Postfix form: `relation.mat` reads like `.persist()` at the call
    * site but is self-releasing (see the object doc).
    */
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def mat: DataFrame = Mat(df)
  }
}
