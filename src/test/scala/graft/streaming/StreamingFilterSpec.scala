package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.Filters

/** The Gopher rule battery is a narrow projection, so the SAME
  * transform must run on a streaming DataFrame with identical verdicts
  * — the property that lets live ingest reject documents with the
  * batch curation rules (no second rule implementation to drift).
  */
class StreamingFilterSpec extends SparkSpec {
  import spark.implicits._

  // one passing document (long, alphabetic, stopword-bearing prose) and
  // three planted failures: too short, symbol-heavy, bullet-heavy
  private val prose = ("the quick brown fox jumps and runs to a tall tree " * 12 +
    (1 to 60).map(i => s"word$i").mkString(" ")).trim
  private val short = "tiny doc"
  private val symbols = (1 to 60).map(i => s"##$i...").mkString(" ")
  private val bullets = (1 to 60).map(i => s"- item$i").mkString("\n")
  private val docs: Seq[(Long, String)] =
    Seq(1L -> prose, 2L -> short, 3L -> symbols, 4L -> bullets)

  test("streamed verdicts equal batch verdicts row for row") {
    val batch = Filters.gopherVerdicts(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(batch(1L).contains(true), "prose fixture must pass at least one rule")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Filters.gopherVerdicts(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher").outputMode("append").start()
    try {
      docs.grouped(2).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("gopher").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
      assert(streamed == batch, "stream and batch verdicts diverged")
    } finally q.stop()
  }

  test("streamed code verdicts equal batch verdicts row for row") {
    val codeDocs: Seq[(Long, String)] = Seq(
      1L -> "def main(x) { return x; } if (x == 1) { x = 2; }",
      2L -> "the quick brown fox jumps over the lazy dog again",
    )
    val batch = graft.pipeline.TextSignals.codeVerdicts(codeDocs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = graft.pipeline.TextSignals.codeVerdicts(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("codedet").outputMode("append").start()
    try {
      mem.addData(codeDocs.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("codedet").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
      assert(streamed == batch, "stream and batch code verdicts diverged")
      assert(streamed(1L).contains(true) && batch(2L).last == false)
    } finally q.stop()
  }

  test("streamed classifier scores equal batch scores under the same frozen weights") {
    // hand-frozen model (no fit): deterministic weights over the 64
    // hashed buckets plus a bias — the streaming wrapper must score the
    // in-flight docs with bit-identical margins and decisions
    import graft.pipeline.QualityClassifier
    val m = QualityClassifier.Fitted(-0.125,
      (0 until QualityClassifier.Buckets).map(i => (i % 9 - 4) * 0.03125))
    val scoreDocs: Seq[(Long, String, String)] = Seq(
      (1L, prose, "src0"), (2L, short, "src7"), (3L, symbols, "src2"))
    val batch = QualityClassifier
      .classifyDocs(scoreDocs.toDF("doc_id", "text", "source"), m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(batch.values.map(_(2)).toSet.size > 1, "fixture margins must differ")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = QualityClassifier
      .classifyDocs(mem.toDF().toDF("doc_id", "text", "source"), m)
      .writeStream.format("memory").queryName("qscore").outputMode("append").start()
    try {
      scoreDocs.grouped(2).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("qscore").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
      assert(streamed == batch, "stream and batch classifier scores diverged")
    } finally q.stop()
  }

  test("streamed repetition verdicts equal the batch grouped-aggregation form") {
    // the narrow fold (sorted-run max-tf) must agree with the
    // registered explode+groupBy form on every column, and the same
    // narrow transform must stream with identical rows — completing
    // Gopher-rule parity at ingest (both halves of the battery)
    import graft.pipeline.TextAnalysis
    val repDocs: Seq[(Long, String, String)] = Seq(
      (1L, (1 to 60).map(i => s"word$i").mkString(" "), "s"),
      (2L, "spam spam spam spam ham", "s"),
      (3L, "alpha beta alpha beta alpha beta alpha beta", "s"),
      (4L, "one", "s"))
    val dir = java.nio.file.Files.createTempDirectory("reptwin").toString
    repDocs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val grouped = TextAnalysis.repetition(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    val narrow = TextAnalysis.repetitionVerdicts(repDocs.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(narrow == grouped, "narrow fold diverged from the grouped-aggregation form")
    assert(narrow(2L).last == 0, "spam doc must fail the max-tf rule")
    assert(narrow(1L).last == 1, "prose doc must pass both repetition rules")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = TextAnalysis.repetitionVerdicts(mem.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("reptwin").outputMode("append").start()
    try {
      repDocs.grouped(2).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("reptwin").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
      assert(streamed == grouped, "stream and batch repetition verdicts diverged")
    } finally q.stop()
  }

  test("planted failures break the expected rules") {
    val rows = Filters.gopherVerdicts(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"), "prose passes the whole battery")
    assert(!rows(2L).getAs[Boolean]("f_words"), "short doc fails the word band")
    assert(!rows(3L).getAs[Boolean]("f_symbol"), "symbol soup fails the symbol ratio")
    assert(!rows(4L).getAs[Boolean]("f_bullet"), "bullet wall fails the bullet ratio")
    assert(Seq(2L, 3L, 4L).forall(id => !rows(id).getAs[Boolean]("keep")))
  }
}
