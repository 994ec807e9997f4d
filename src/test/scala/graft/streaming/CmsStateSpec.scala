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

  test("streamed estimates == batch CMS point estimates; estimate >= exact always") {
    val ev = graft.queries.Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("event_type").as("topic"), col("user_id").as("key"), col("event_id"))
      .orderBy(col("event_id"))
      .as[(String, Long, Long)].collect()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Obs]
    val q = CmsState(mem.toDS()).writeStream
      .format("memory").queryName("cms").outputMode("update").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { chunk =>
        mem.addData(chunk.map(r => Obs(r._1, r._2)).toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // latest emission per (topic, key) = the final refreshed estimate
      val streamed = spark.table("cms").collect()
        .map(r => (r.getAs[String]("topic"), r.getAs[Long]("key")) ->
          (r.getAs[Long]("n_seen"), r.getAs[Long]("estimate")))
        .groupBy(_._1).map { case (tk, vs) => tk -> vs.map(_._2).maxBy(_._1)._2 }

      // batch reference: per-topic grid via the Column machinery, then
      // the min-over-depth point estimate per key
      val obs = ev.map(r => (r._1, r._2)).toSeq.toDF("topic", "key")
      val rows = (0 until SketchQueries.CmsDepth).map(lit(_))
      val grid = obs
        .select(col("topic"), explode(array(rows.map(r =>
          struct(r.as("r"), SketchQueries.cmsCell(r, col("key")).as("c"))): _*)).as("rc"))
        .groupBy(col("topic"), col("rc.r").as("r"), col("rc.c").as("c"))
        .agg(count(lit(1)).as("cell"))
      val batchEst = obs.distinct()
        .select(col("topic"), col("key"), explode(array(rows.map(r =>
          struct(r.as("r"), SketchQueries.cmsCell(r, col("key")).as("c"))): _*)).as("rc"))
        .select(col("topic"), col("key"), col("rc.r").as("r"), col("rc.c").as("c"))
        .join(grid, Seq("topic", "r", "c"))
        .groupBy(col("topic"), col("key"))
        .agg(min(col("cell")).as("est"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

      assert(streamed.nonEmpty && streamed.size == batchEst.size,
        s"coverage mismatch: ${streamed.size} vs ${batchEst.size}")
      streamed.foreach { case (tk, est) =>
        assert(est == batchEst(tk), s"estimate drift at $tk: $est vs ${batchEst(tk)}")
      }
      // one-sided error: estimate dominates the exact count
      val exact = ev.map(r => (r._1, r._2)).groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (tk, n) =>
        assert(streamed(tk) >= n, s"CMS underestimated $tk: ${streamed(tk)} < $n")
      }
    } finally q.stop()
  }
}
