package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

import graft.SparkSpec

/** The memo contract the per-object TrieMaps could not give: bounded
  * (LRU past maxEntries, with the evicted checkpoint's storage
  * released), timed (build seconds land in the shared log the bench
  * `artifacts` map reads), and releasable (a public clear path for
  * library callers).
  */
class MemoSpec extends SparkSpec {

  private def ckpt(n: Long): DataFrame =
    spark.range(n).toDF("id").localCheckpoint(eager = true)

  private def checkpointRdds(df: DataFrame) =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  test("builds once per key and logs the build") {
    val m = new Memo("memospec_once")
    var builds = 0
    def get(k: String) = m.getOrElseUpdate(k, { builds += 1; ckpt(10) })
    val a = get("k1")
    assert(get("k1") eq a, "second lookup must return the memoized relation")
    assert(builds == 1)
    get("k2")
    assert(builds == 2)
    val log = Memo.buildLog
    assert(log.contains("memospec_once") && log("memospec_once") >= 0.0,
      s"build seconds must land in the shared log: $log")
    m.clear()
  }

  test("LRU-evicts past maxEntries and releases the evicted checkpoint") {
    val m = new Memo("memospec_lru", maxEntries = 2)
    val first = m.getOrElseUpdate("a", ckpt(5))
    val firstRdds = checkpointRdds(first)
    assert(firstRdds.nonEmpty && firstRdds.forall(
      _.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE),
      "an eager localCheckpoint must hold materialized storage")
    m.getOrElseUpdate("b", ckpt(5))
    // touch "a" so "b" is the LRU entry, then overflow with "c"
    m.getOrElseUpdate("a", fail("'a' must still be memoized"))
    m.getOrElseUpdate("c", ckpt(5))
    m.getOrElseUpdate("a", fail("the recently-touched entry must survive eviction"))
    var rebuilt = false
    m.getOrElseUpdate("b", { rebuilt = true; ckpt(5) })
    assert(rebuilt, "the LRU entry must have been evicted")
    m.clear()
  }

  test("clear releases the checkpointed storage (the public release path)") {
    val m = new Memo("memospec_release")
    val df = m.getOrElseUpdate("k", ckpt(7))
    val rdds = checkpointRdds(df)
    assert(rdds.nonEmpty)
    m.clear()
    assert(rdds.forall(_.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE),
      "clear() must unpersist the checkpointed RDD blocks")
    var rebuilt = false
    m.getOrElseUpdate("k", { rebuilt = true; ckpt(7) })
    assert(rebuilt)
    m.clear()
  }
}
