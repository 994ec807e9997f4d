package graft.core

import java.util.concurrent.{CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-JVM store's publish protocol under contention. The
  * stage-and-swap design (`DatasetStore.scala`) is reasoned-correct in
  * its scaladoc; these specs pin the two branches a reasoning error
  * would silently corrupt: the memo hit (no rebuild on a fresh
  * signature) and the LOSER-RESCUES-WINNER branch — a writer whose own
  * build fails after a racing writer has already published the
  * identical relation must adopt the winner's store instead of
  * propagating its failure.
  */
class DatasetStoreSpec extends SparkSpec {

  /** A throwaway dataset: one top-level parquet entry, enough for
    * datasetSignature to fingerprint.
    */
  private def freshDataset(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"dstore_$tag").toString
    spark.range(10).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(s"$dir/base.parquet")
    dir
  }

  private def expected = Seq.tabulate(10)(i => (i.toLong, i * 3L)).toSet

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("second call reads the store without rebuilding; version salt rebuilds") {
    val ds = freshDataset("memo")
    val builds = new AtomicInteger(0)
    def build = {
      builds.incrementAndGet()
      spark.read.parquet(s"$ds/base.parquet").select(col("id"), (col("id") * 3).as("w"))
    }
    val a = DatasetStore.persisted(spark, ds, "spec_memo", "v1")(build)
    assert(rowsOf(a) == expected)
    assert(builds.get() == 1)
    val b = DatasetStore.persisted(spark, ds, "spec_memo", "v1")(build)
    assert(rowsOf(b) == expected)
    assert(builds.get() == 1, "a fresh signature must be a pure read, not a rebuild")
    // bumping the derivation version invalidates the store even though
    // the dataset's files are untouched
    DatasetStore.persisted(spark, ds, "spec_memo", "v2")(build)
    assert(builds.get() == 2, "a version bump must rebuild")
  }

  /** Hand-publish a store the way another JVM's persisted() would —
    * build + sig marker staged, then moved into place. Runs OUTSIDE
    * the store lock, exactly like a foreign JVM.
    */
  private def foreignPublish(ds: String, name: String, version: String): Unit = {
    val wh = DatasetStore.warehousePath(spark)
    val sfx = ds.replaceAll("[^A-Za-z0-9]+", "_")
    val stage = wh.resolve(s"graft_${name}_${sfx}__foreign")
    spark.read.parquet(s"$ds/base.parquet").select(col("id"), (col("id") * 3).as("w"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stage.toString)
    val sig = s"${DatasetStore.datasetSignature(ds)}#$version"
    val abs = java.nio.file.Paths.get(ds).toAbsolutePath.toString
    java.nio.file.Files.writeString(stage.resolve("_graft_sig"), s"$sig\n$abs\n")
    java.nio.file.Files.move(stage, wh.resolve(s"graft_${name}_$sfx"))
  }

  test("a writer whose build fails after a cross-JVM winner published rescues the winner's store") {
    val ds = freshDataset("race")
    // the loser's build crashes — but only AFTER "another JVM" (the
    // foreign publisher, running outside the store lock) has published
    // the identical relation. The loser must adopt that store instead
    // of propagating its own failure.
    val df = DatasetStore.persisted(spark, ds, "spec_race", "v1") {
      foreignPublish(ds, "spec_race", "v1")
      throw new RuntimeException("loser build crashed mid-derivation")
    }
    assert(rowsOf(df) == expected, "the rescued store must be the winner's bytes")
    // and with no winner, the failure propagates
    val boom = intercept[RuntimeException] {
      DatasetStore.persisted(spark, ds, "spec_race_none", "v1") {
        throw new RuntimeException("no winner this time")
      }
    }
    assert(boom.getMessage == "no winner this time")
  }

  test("a stale build discards its stage when a cross-JVM winner already published") {
    val ds = freshDataset("skip")
    // the re-check between stage and swap: the foreign winner publishes
    // while our build is in flight; our writer must NOT swap (tearing
    // the winner's readers for identical bytes) — the stage is
    // discarded and the winner's files survive untouched.
    val wh = DatasetStore.warehousePath(spark)
    val sfx = ds.replaceAll("[^A-Za-z0-9]+", "_")
    val df = DatasetStore.persisted(spark, ds, "spec_skip", "v1") {
      foreignPublish(ds, "spec_skip", "v1")
      spark.read.parquet(s"$ds/base.parquet").select(col("id"), (col("id") * 3).as("w"))
    }
    assert(rowsOf(df) == expected)
    val stages = java.nio.file.Files.list(wh).toArray.map(_.toString)
      .filter(p => p.contains(s"spec_skip_$sfx") && p.contains("__stage_"))
    assert(stages.isEmpty, s"the losing stage must be discarded: ${stages.mkString(",")}")
  }

  test("two concurrent same-relation writers: one build, both read the full relation") {
    val ds = freshDataset("both")
    // the per-store lock serializes same-JVM writers: exactly ONE build
    // runs, the second caller waits, re-checks freshness, and reads —
    // previously both passed the freshness check and the second's
    // delete-then-move swap tore part files out from under the first's
    // in-flight read (this spec's original form failed exactly so).
    val builds = new AtomicInteger(0)
    val started = new CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Long)]]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 2).map { i =>
      new Thread(() => {
        try {
          started.await(60, TimeUnit.SECONDS)
          val df = DatasetStore.persisted(spark, ds, "spec_both", "v1") {
            builds.incrementAndGet()
            spark.read.parquet(s"$ds/base.parquet").select(col("id"), (col("id") * 3).as("w"))
          }
          results.add(rowsOf(df))
        } catch { case t: Throwable => errors.add(t) }
      }, s"dstore-writer-$i")
    }
    ts.foreach(_.start())
    ts.foreach(_.join(120000))
    assert(errors.isEmpty, s"no writer may fail: ${errors.peek()}")
    assert(results.size == 2)
    results.forEach(r => assert(r == expected))
    assert(builds.get() == 1, "the store lock must make the build run exactly once")
    // and the published store itself is whole + fresh: a third call is
    // a pure read of the same rows
    val after = DatasetStore.persisted(spark, ds, "spec_both", "v1") {
      fail("the surviving store must satisfy a later reader without a rebuild")
    }
    assert(rowsOf(after) == expected)
  }

  test("a corrupt stage is unpublishable: missing _SUCCESS, lingering _temporary, no parts") {
    import java.nio.file.{Files, Paths}
    // complete stage: _SUCCESS + a part file, no _temporary → publishable
    val ok = Files.createTempDirectory("stage_ok")
    Files.writeString(ok.resolve("_SUCCESS"), "")
    Files.writeString(ok.resolve("part-00000-abc.snappy.parquet"), "x")
    DatasetStore.assertStageComplete(ok)
    // a killed JVM mid-commit: task output present, no _SUCCESS
    val noSuccess = Files.createTempDirectory("stage_nosuccess")
    Files.writeString(noSuccess.resolve("part-00000-abc.snappy.parquet"), "x")
    intercept[IllegalArgumentException](DatasetStore.assertStageComplete(noSuccess))
    // commit half-done: _SUCCESS racing a lingering _temporary subtree
    val lingering = Files.createTempDirectory("stage_temp")
    Files.writeString(lingering.resolve("_SUCCESS"), "")
    Files.writeString(lingering.resolve("part-00000-abc.snappy.parquet"), "x")
    Files.createDirectory(lingering.resolve("_temporary"))
    intercept[IllegalArgumentException](DatasetStore.assertStageComplete(lingering))
    // a foreign sweep deleted the task files: marker present, no parts
    val noParts = Files.createTempDirectory("stage_noparts")
    Files.writeString(noParts.resolve("_SUCCESS"), "")
    intercept[IllegalArgumentException](DatasetStore.assertStageComplete(noParts))
    // a nonexistent stage dir never publishes
    intercept[IllegalArgumentException](
      DatasetStore.assertStageComplete(Paths.get("/nonexistent/stage")))
  }

  test("marksuccessfuljobs=false: missing _SUCCESS degrades to a warning, other checks stay hard") {
    import java.nio.file.Files
    // no marker, but the conf disables it → publishable on parts alone
    val noSuccess = Files.createTempDirectory("stage_nosuccess_ok")
    Files.writeString(noSuccess.resolve("part-00000-abc.snappy.parquet"), "x")
    DatasetStore.assertStageComplete(noSuccess, requireSuccessMarker = false)
    // the _temporary and part-file checks do NOT degrade with it
    val lingering = Files.createTempDirectory("stage_temp_nomarker")
    Files.writeString(lingering.resolve("part-00000-abc.snappy.parquet"), "x")
    Files.createDirectory(lingering.resolve("_temporary"))
    intercept[IllegalArgumentException](
      DatasetStore.assertStageComplete(lingering, requireSuccessMarker = false))
    val noParts = Files.createTempDirectory("stage_noparts_nomarker")
    intercept[IllegalArgumentException](
      DatasetStore.assertStageComplete(noParts, requireSuccessMarker = false))
  }

  test("an empty relation still publishes (Spark writes a schema-bearing empty part file)") {
    // the completeness gate's hasPart test must not reject a
    // legitimately empty deterministic relation (e.g. a dup-pair store
    // on a dup-free corpus)
    val ds = freshDataset("empty")
    val df = DatasetStore.persisted(spark, ds, "spec_empty", "v1") {
      spark.read.parquet(s"$ds/base.parquet")
        .filter(col("id") < 0).select(col("id"), (col("id") * 3).as("w"))
    }
    assert(df.count() == 0)
    // and the published store satisfies a later reader without a rebuild
    val again = DatasetStore.persisted(spark, ds, "spec_empty", "v1") {
      fail("empty store must be fresh, not rebuilt")
    }
    assert(again.count() == 0)
  }
}
