package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{TableOps, TextAnalysis}

/** Fixture specs for the round-5 registered operators (q_resample,
  * q_profile_approx, q_blocklist, q_compaction_plan) — the oracle gate
  * proves cross-engine parity on the driver corpus; these pin the
  * semantics the gate corpus may not exercise (gap grids, KMV error
  * bounds, threshold edges, bin splitting).
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Option[Long], String, Long, Double)]): String = {
    // (event_id, user_id, event_type, ts_us, value)
    val dir = java.nio.file.Files.createTempDirectory("r5ev").toString
    rows.map { case (id, uid, tpe, tsUs, v) =>
      (id, new Timestamp(tsUs / 1000), uid, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String, Long)]): String = {
    // (doc_id, source, text, n_chars)
    val dir = java.nio.file.Files.createTempDirectory("r5doc").toString
    rows.toDF("doc_id", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q_resample ------------------------------------------------------

  private val B = TemporalQueries.ResampleUs // 15-min bucket in micros

  test("resample: interior gaps are materialized and carry the last observed mean") {
    val dir = writeEvents(Seq(
      // topic a, bucket 0: mean 15.0 over two events
      (1L, Some(1L), "a", 0L, 10.0),
      (2L, Some(1L), "a", 1000L, 20.0),
      // topic a, bucket 2 (bucket 1 is a gap): mean 40.0
      (3L, Some(1L), "a", 2 * B, 40.0),
      // topic b: a single observed bucket -> single-row grid, no gaps
      (4L, Some(1L), "b", 5 * B, 7.0),
    ))
    val out = TemporalQueries.resample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.size == 4, s"grid must span [first, last] bucket per topic: $out")
    assert(out(("a", 0L)) == ((2L, 15.0, false)))
    assert(out(("a", 1L)) == ((0L, 15.0, true)), "gap bucket must carry bucket 0's mean")
    assert(out(("a", 2L)) == ((1L, 40.0, false)))
    assert(out(("b", 5L)) == ((1L, 7.0, false)))
    // no leading/trailing fabrication: the grid starts at the FIRST
    // observed bucket (so mean_filled is never NULL) and ends at the last
    assert(!out.keySet.exists { case (t, b) => t == "a" && (b < 0 || b > 2) })
  }

  test("resample: consecutive gaps all carry the same last-observed mean") {
    val dir = writeEvents(Seq(
      (1L, Some(1L), "t", 0L, 3.0),
      (2L, Some(1L), "t", 3 * B, 9.0),
    ))
    val rows = TemporalQueries.resample(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(rows(0L) == ((3.0, false)))
    assert(rows(1L) == ((3.0, true)))
    assert(rows(2L) == ((3.0, true)))
    assert(rows(3L) == ((9.0, false)))
  }

  // ---- q_profile_approx ------------------------------------------------

  test("profile_approx: below-k columns are exact; the rest land inside KMV bounds") {
    val sf = "/root/testdata/sf0.001"
    val exact = ProfileQueries.profile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    val approx = ProfileQueries.profileApprox(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Double]("n_distinct_kmv")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, nd) =>
      val est = approx(c)
      if (nd < SketchQueries.KmvK)
        assert(est == nd.toDouble, s"$c: below-k sketch must be exact ($est vs $nd)")
      else {
        // k=64 -> relative std error ~ 1/sqrt(k-2) = 12.7%; 4 sigma bound
        val rel = math.abs(est - nd) / nd
        assert(rel < 0.51, s"$c: KMV estimate $est vs exact $nd (rel err $rel)")
      }
    }
  }

  test("profile_approx: non-distinct metrics match the exact profile") {
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) = r.getAs[String]("col_name")
    val exact = ProfileQueries.profile(spark, sf).collect()
      .map(r => key(r) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
        Option(r.getAs[java.lang.Double]("min_num")), Option(r.getAs[java.lang.Double]("max_num")),
        r.getAs[Boolean]("is_complete"))).toMap
    val approx = ProfileQueries.profileApprox(spark, sf).collect()
      .map(r => key(r) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
        Option(r.getAs[java.lang.Double]("min_num")), Option(r.getAs[java.lang.Double]("max_num")),
        r.getAs[Boolean]("is_complete"))).toMap
    assert(approx == exact)
  }

  // ---- q_blocklist -----------------------------------------------------

  test("blocklist: flags docs at or above the hit-ratio threshold only") {
    val dir = writeDocs(Seq(
      (1L, "web", "error drop error again", 23L), // 3/4 hits
      (2L, "web", "perfectly clean text here", 25L), // 0 hits
      // 1 hit in 20 tokens = 0.05 < 0.08 threshold
      (3L, "web", ("x " * 19).trim + " error", 40L),
    ))
    val out = TextAnalysis.blocklist(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val r = out.head
    assert(r.getAs[Int]("n_tokens") == 4 && r.getAs[Int]("n_hits") == 3)
    assert(r.getAs[Double]("hit_ratio") == 0.75)
  }

  // ---- q_compaction_plan -------------------------------------------------

  test("compaction plan: prefix-sum bins split per source at the target size") {
    // source s1: 3 docs of 1500 chars -> cum starts 0,1500,3000: all in
    // bin 0 (start < 4000); 4th doc starts at 4500 -> bin 1
    val dir = writeDocs(Seq(
      (1L, "s1", "t", 1500L), (2L, "s1", "t", 1500L), (3L, "s1", "t", 1500L),
      (4L, "s1", "t", 1500L),
      (5L, "s2", "t", 100L), // independent per-source binning
    ))
    val out = TableOps.compactionPlan(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(out.size == 3, s"expected s1 bins 0,1 + s2 bin 0: $out")
    assert(out(("s1", 0L)) == ((3L, 4500L, 1L, 3L)))
    assert(out(("s1", 1L)) == ((1L, 1500L, 4L, 4L)))
    assert(out(("s2", 0L)) == ((1L, 100L, 5L, 5L)))
  }
}
