package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.CrawlAdmissionState.{CrawlVerdict, RunningVerdict}

/** The live crawl-admission fold: the final running emission equals
  * the batch fold over the concatenated input, a planted mid-crawl
  * dup burst flips the running verdict the trigger it lands (the
  * early-abort signal), and `min_arrivals` holds the decision until
  * the sample is meaningful.
  */
class CrawlAdmissionStateSpec extends SparkSpec {
  import spark.implicits._

  private def drive(chunks: Seq[Seq[CrawlVerdict]], minArrivals: Long,
      name: String): Seq[Seq[RunningVerdict]] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CrawlVerdict]
    val q = CrawlAdmissionState(mem.toDS(), minArrivals).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try chunks.map { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
      spark.table(name).as[RunningVerdict].collect().toSeq
        .groupBy(_.n_arriving).maxBy(_._1)._2
    } finally q.stop()
  }

  test("final running emission == batch fold over the concatenated input") {
    val verdicts = Seq.fill(16)("admit") ++
      Seq("text_near_dup", "image_dup", "text_too_short", "semantic_dup")
    val emissions = drive(
      verdicts.map(CrawlVerdict("c", _)).grouped(7).toSeq, minArrivals = 1L, "cas_final")
    val fin = emissions.last.head
    val batch = IngestGate.crawlAdmissionOf(verdicts.toDF("verdict")).collect().head
    assert(fin.n_arriving == batch.getAs[Long]("n_arriving"))
    assert(fin.n_admit == batch.getAs[Long]("n_admit"))
    assert(fin.n_dup == batch.getAs[Long]("n_dup"))
    assert(fin.n_garbage == batch.getAs[Long]("n_garbage"))
    assert(fin.dup_rate == batch.getAs[Double]("dup_rate"))
    assert(fin.garbage_rate == batch.getAs[Double]("garbage_rate"))
    assert(fin.admit_crawl == batch.getAs[Boolean]("admit_crawl"))
  }

  test("a mid-crawl dup burst flips the running verdict that trigger") {
    val calm = Seq.fill(10)(CrawlVerdict("c", "admit"))
    val burst = Seq.fill(6)(CrawlVerdict("c", "semantic_dup")) // 6/16 = 0.375
    val Seq(after1, after2) = drive(Seq(calm, burst), minArrivals = 8L, "cas_burst")
    assert(after1.head.decided && after1.head.admit_crawl,
      "calm prefix must admit once past min_arrivals")
    assert(after2.head.decided && !after2.head.admit_crawl,
      "the burst trigger must flip the running verdict — the abort signal")
  }

  test("min_arrivals withholds the decision on a tiny sample") {
    val Seq(early, late) = drive(
      Seq(Seq.fill(3)(CrawlVerdict("c", "text_too_short")),
        Seq.fill(97)(CrawlVerdict("c", "admit"))),
      minArrivals = 100L, "cas_min")
    assert(!early.head.decided, "3 documents are noise, not a verdict")
    assert(late.head.decided && late.head.admit_crawl,
      "at 100 arrivals the crawl decides (3% garbage admits)")
  }
}
