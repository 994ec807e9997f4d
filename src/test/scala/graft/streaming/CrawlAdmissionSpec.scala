package graft.streaming

import graft.SparkSpec

/** The crawl-level go/no-go fold: verdict classification (dup vs
  * extractor garbage), threshold edges, and the boundary inclusivity.
  */
class CrawlAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private def fold(verdicts: Seq[String]) =
    IngestGate.crawlAdmissionOf(verdicts.toDF("verdict")).collect().head

  test("a calm crawl admits; rates classify dup vs garbage") {
    val r = fold(Seq.fill(8)("admit") ++ Seq("image_dup", "text_too_short"))
    assert(r.getAs[Long]("n_arriving") == 10L)
    assert(r.getAs[Long]("n_admit") == 8L)
    assert(r.getAs[Long]("n_dup") == 1L && r.getAs[Long]("n_image_dup") == 1L)
    assert(r.getAs[Long]("n_garbage") == 1L)
    assert(r.getAs[Double]("dup_rate") == 0.1 && r.getAs[Double]("garbage_rate") == 0.1)
    assert(r.getAs[Boolean]("admit_crawl"))
  }

  test("a dup-heavy crawl is refused; the boundary is inclusive") {
    val over = fold(Seq.fill(7)("admit") ++
      Seq("text_near_dup", "semantic_dup", "image_dup")) // 0.3 > 0.25
    assert(!over.getAs[Boolean]("admit_crawl"))
    val onBoundary = fold(Seq.fill(6)("admit") ++
      Seq("text_exact_dup", "semantic_dup")) // exactly 0.25
    assert(onBoundary.getAs[Boolean]("admit_crawl"),
      "dup_rate == CrawlDupRateMax must still admit")
  }

  test("extractor garbage refuses a crawl; text dups are NOT garbage") {
    val r = fold(Seq.fill(7)("admit") ++
      Seq("text_too_short", "text_too_repetitive", "text_blocklisted")) // 0.3 > 0.2
    assert(r.getAs[Long]("n_garbage") == 3L && r.getAs[Long]("n_dup") == 0L)
    assert(!r.getAs[Boolean]("admit_crawl"))
    val dupsOnly = fold(Seq.fill(8)("admit") ++
      Seq("text_exact_dup", "text_near_dup"))
    assert(dupsOnly.getAs[Long]("n_garbage") == 0L,
      "text_exact_dup / text_near_dup count as dup, never as garbage")
  }
}
