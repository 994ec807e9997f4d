package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.SketchQueries
import graft.streaming.CmsState.Obs

/** CmsState semantics: the streamed grid after N triggers must equal
  * the batch CMS grid over the concatenated input (cell-wise addition
  * is the sketch merge), the JVM cell hash must equal the Column cell
  * hash `q_cms_topk` is oracle-gated on, and every point estimate must
  * dominate the true count (CMS one-sided error).
  */
class CmsStateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("JVM cell hash equals the batch Column cell hash on the corpus key range") {
    val keys = (0L to 200L).toDF("key")
    (0 until SketchQueries.CmsDepth).foreach { r =>
      val spark_ = keys.select(col("key"),
        SketchQueries.cmsCell(lit(r), col("key")).as("c")).collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      (0L to 200L).foreach { k =>
        assert(spark_(k) == SketchQueries.cmsCellJvm(r, k).toLong,
          s"cell mismatch at r=$r key=$k")
      }
    }
  }

  private def corpusObs = graft.queries.Tables.events(spark, sf)
    .filter(col("user_id").isNotNull)
    .select(col("event_type").as("topic"), col("user_id").as("key"), col("event_id"))
    .orderBy(col("event_id"))
    .as[(String, Long, Long)].collect()

  /** Batch reference: per-topic grid via the Column machinery the
    * oracle-gated q_cms_topk uses, then min-over-depth per key.
    */
  private def batchEstimates(ev: Array[(String, Long, Long)]): Map[(String, Long), Long] = {
    val obs = ev.map(r => (r._1, r._2)).toSeq.toDF("topic", "key")
    val rows = (0 until SketchQueries.CmsDepth).map(lit(_))
    val grid = obs
      .select(col("topic"), explode(array(rows.map(r =>
        struct(r.as("r"), SketchQueries.cmsCell(r, col("key")).as("c"))): _*)).as("rc"))
      .groupBy(col("topic"), col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cell"))
    obs.distinct()
      .select(col("topic"), col("key"), explode(array(rows.map(r =>
        struct(r.as("r"), SketchQueries.cmsCell(r, col("key")).as("c"))): _*)).as("rc"))
      .select(col("topic"), col("key"), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(grid, Seq("topic", "r", "c"))
      .groupBy(col("topic"), col("key"))
      .agg(min(col("cell")).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("one-trigger streamed estimates == batch CMS point estimates") {
    // equality is only well-defined when the emission reflects the
    // final grid: a key's last emission comes from the last trigger
    // that OBSERVED it, so later triggers' collisions would legally
    // raise the batch estimate above a stale streamed one — one
    // trigger removes the staleness, multi-trigger mergeability is the
    // next test's (deterministic) property
    val ev = corpusObs
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = CmsState(mem.toDS()).writeStream
      .format("memory").queryName("cms1").outputMode("update").start()
    try {
      mem.addData(ev.map(r => Obs(r._1, r._2)).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms1").collect()
        .map(r => (r.getAs[String]("topic"), r.getAs[Long]("key")) ->
          r.getAs[Long]("estimate")).toMap
      val batch = batchEstimates(ev)
      assert(streamed.nonEmpty && streamed.size == batch.size,
        s"coverage mismatch: ${streamed.size} vs ${batch.size}")
      streamed.foreach { case (tk, est) =>
        assert(est == batch(tk), s"estimate drift at $tk: $est vs ${batch(tk)}")
      }
    } finally q.stop()
  }

  test("multi-trigger merge: estimates dominate exact counts, topic totals accumulate") {
    val ev = corpusObs
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = CmsState(mem.toDS()).writeStream
      .format("memory").queryName("cms3").outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { chunk =>
        mem.addData(chunk.map(r => Obs(r._1, r._2)).toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val emissions = spark.table("cms3").collect()
        .map(r => ((r.getAs[String]("topic"), r.getAs[Long]("key")),
          r.getAs[Long]("n_seen"), r.getAs[Long]("estimate")))
      val lastEst = emissions.groupBy(_._1)
        .map { case (tk, vs) => tk -> vs.maxBy(_._2)._3 }
      // a key's total count is fully accrued by its last-observing
      // trigger, so its last estimate must dominate its exact count —
      // deterministic, unlike cross-trigger equality
      val exact = ev.map(r => (r._1, r._2)).groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (tk, n) =>
        assert(lastEst(tk) >= n, s"CMS underestimated $tk: ${lastEst(tk)} < $n")
      }
      // per-topic n_seen is monotone and ends at the topic's row count
      val totals = ev.groupBy(_._1).view.mapValues(_.length.toLong)
      totals.foreach { case (topic, total) =>
        val seen = emissions.filter(_._1._1 == topic).map(_._2).max
        assert(seen == total, s"$topic n_seen $seen != $total")
      }
    } finally q.stop()
  }
}
