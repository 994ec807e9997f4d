package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{IncrementalProfile, ProfileQueries, Tables}

/** The persisted profile-state lifecycle over N=3 crawls: append →
  * estate profile (== the single-pass approximate profile over the
  * concatenated crawls — the non-circular gold) → subset fold →
  * retention delete → re-fold equals the subset, and the pairwise
  * drift gate reads the store directly. Every consumer touches only
  * the state table.
  */
class ProfileStateStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def events = Tables.events(spark, sf)
  private def crawl(i: Int) = events.filter(pmod(col("event_id"), lit(3)) === i)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("three-crawl estate lifecycle: append, fold, drift, expire") {
    ProfileStateStore.write(crawl(0), "pss_estate", "c0", mode = SaveMode.Overwrite)
    ProfileStateStore.write(crawl(1), "pss_estate", "c1")
    ProfileStateStore.write(crawl(2), "pss_estate", "c2")

    // the non-circular gold: fold of 3 persisted states == the
    // single-pass approximate profile over the whole table
    val estate = rows(ProfileStateStore.profile(spark, "pss_estate"))
    val gold = rows(ProfileQueries.profileApprox(spark, sf))
    assert(estate == gold,
      s"estate fold != single pass:\nonly-estate=${estate -- gold}\nonly-gold=${gold -- estate}")

    // subset fold: two crawls' states vs ONE state built over their
    // concatenated rows (different code path: 2-way merge vs single pass)
    val subset = rows(ProfileStateStore.profile(spark, "pss_estate", Seq("c0", "c1")))
    val subsetGold = rows(IncrementalProfile.profileOfStates(
      IncrementalProfile.stateOf(events.filter(pmod(col("event_id"), lit(3)) < 2))))
    assert(subset == subsetGold, "subset fold != one-pass state over the same rows")

    // pairwise drift straight off the store
    val viaStore = rows(ProfileStateStore.drift(spark, "pss_estate", "c0", "c1"))
    val direct = rows(IncrementalProfile.driftOf(
      IncrementalProfile.stateOf(crawl(0)), IncrementalProfile.stateOf(crawl(1))))
    assert(viaStore == direct, "store-read drift != directly-computed drift")

    // retention: expire c2, the survivors re-fold exactly
    ProfileStateStore.removeSnapshot(spark, "pss_estate", "c2")
    val after = rows(ProfileStateStore.profile(spark, "pss_estate"))
    assert(after == subset, "post-expiry fold != surviving-snapshot fold")
    assert(ProfileStateStore.read(spark, "pss_estate")
      .select("snapshot").distinct().collect().map(_.getString(0)).toSet == Set("c0", "c1"))
  }

  test("retention crash windows recover: catalog rename and file-only promotion") {
    // build a 3-crawl estate
    ProfileStateStore.write(crawl(0), "pss_crash", "c0", mode = SaveMode.Overwrite)
    ProfileStateStore.write(crawl(1), "pss_crash", "c1")
    ProfileStateStore.write(crawl(2), "pss_crash", "c2")
    val want = rows(ProfileStateStore.read(spark, "pss_crash")
      .filter(col("snapshot") =!= "c2"))

    // window 1: crash BETWEEN the main-table drop and the rename —
    // the survivors exist only under the side table. A retry must
    // promote the side, never clear it.
    ProfileStateStore.read(spark, "pss_crash").filter(col("snapshot") =!= "c2")
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("pss_crash__retain")
    TableUtil.dropTableAndLocation(spark, "pss_crash")
    ProfileStateStore.removeSnapshot(spark, "pss_crash", "c2")
    assert(rows(ProfileStateStore.read(spark, "pss_crash")) == want,
      "retry after a drop-window crash must recover the survivors")

    // window 2: same crash seen from a FRESH JVM — the in-memory
    // catalog has neither name, only the side table's FILES survive.
    val sideDir = graft.core.DatasetStore.warehousePath(spark)
      .resolve("pss_crash__retain")
    ProfileStateStore.read(spark, "pss_crash").filter(col("snapshot") =!= "c2")
      .write.mode(SaveMode.Overwrite).parquet(sideDir.toString)
    spark.sql("DROP TABLE IF EXISTS pss_crash__retain") // catalog forgot, files remain
    TableUtil.dropTableAndLocation(spark, "pss_crash")
    ProfileStateStore.removeSnapshot(spark, "pss_crash", "c2")
    assert(rows(ProfileStateStore.read(spark, "pss_crash")) == want,
      "a fresh JVM must recover the survivors from the side table's files")
    spark.sql("DROP TABLE IF EXISTS pss_crash")
  }

  test("fresh-JVM recovery prefers intact main files over the side") {
    ProfileStateStore.write(crawl(0), "pss_fresh", "c0", mode = SaveMode.Overwrite)
    ProfileStateStore.write(crawl(1), "pss_fresh", "c1")
    ProfileStateStore.write(crawl(2), "pss_fresh", "c2")
    val fullDf = ProfileStateStore.read(spark, "pss_fresh")
    val want = rows(ProfileStateStore.read(spark, "pss_fresh")
      .filter(col("snapshot") =!= "c2"))
    val wh = graft.core.DatasetStore.warehousePath(spark)

    // HEALTHY estate seen from a fresh JVM: the main table's warehouse
    // FILES are intact but the in-memory catalog has no entry
    // (simulated by writing the files without saveAsTable). Recovery
    // must re-register the main in place — previously this misreported
    // "profile state lost" (no side) or threw LOCATION_ALREADY_EXISTS.
    fullDf.write.mode(SaveMode.Overwrite).parquet(wh.resolve("pss_fresh2").toString)
    ProfileStateStore.removeSnapshot(spark, "pss_fresh2", "c2")
    assert(rows(ProfileStateStore.read(spark, "pss_fresh2")) == want,
      "a fresh JVM on a healthy estate must re-register the main files")

    // crash window "side written, main NOT yet dropped", fresh JVM:
    // both file sets exist, catalog has neither. The main files are the
    // complete estate and must win; the side is a stale earlier attempt
    // (here deliberately WRONG — missing c1 too — so trusting it would
    // corrupt the estate).
    fullDf.write.mode(SaveMode.Overwrite).parquet(wh.resolve("pss_fresh3").toString)
    fullDf.filter(col("snapshot") === "c0")
      .write.mode(SaveMode.Overwrite).parquet(wh.resolve("pss_fresh3__retain").toString)
    ProfileStateStore.removeSnapshot(spark, "pss_fresh3", "c2")
    assert(rows(ProfileStateStore.read(spark, "pss_fresh3")) == want,
      "intact main files must be authoritative over a stale side")

    Seq("pss_fresh", "pss_fresh2", "pss_fresh3").foreach(t =>
      TableUtil.dropTableAndLocation(spark, t))
  }

  test("the estate profile's plan reads only the state table") {
    ProfileStateStore.write(crawl(0), "pss_plan", "c0", mode = SaveMode.Overwrite)
    ProfileStateStore.write(crawl(1), "pss_plan", "c1")
    val plan = ProfileStateStore.profile(spark, "pss_plan")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"estate profile must not scan the events table:\n$plan")
    assert(plan.contains("pss_plan"), s"plan must read the state table:\n$plan")
  }
}
