package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.LshState.{BandRow, CandidatePair}

/** LshState semantics: the streamed candidate set after N triggers must
  * equal the batch q_dedup_minhash pairs over the concatenated input —
  * bucket membership is order-independent and pairs emit exactly when
  * the later copy arrives.
  */
class LshStateSpec extends SparkSpec {
  import spark.implicits._

  // near-dup clusters: (1,2) identical, (3,4) one-word edit of a
  // 40-word doc, (5,6,7) an identical triple, (8) unrelated
  private val base = (0 until 40).map(i => s"w$i").mkString(" ")
  private val edited = ((0 until 40).map(i => if (i == 20) "zz" else s"w$i")).mkString(" ")
  private val other = (0 until 40).map(i => s"v$i").mkString(" ")
  private val clean = (0 until 40).map(i => s"c$i").mkString(" ")
  private val docs: Seq[(Long, String)] = Seq(
    1L -> base, 2L -> base, 3L -> base, 4L -> edited,
    5L -> other, 6L -> other, 7L -> other, 8L -> clean)

  private def batchPairs: Set[(Long, Long, Double)] = {
    val dir = java.nio.file.Files.createTempDirectory("lsh-batch").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.pipeline.Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("est_jaccard"))).toSet
    spark.catalog.clearCache()
    out
  }

  test("streamed candidates over three triggers == batch q_dedup_minhash pairs") {
    val expected = batchPairs
    assert(expected.map(p => (p._1, p._2)).intersect(Set((1L, 2L), (5L, 6L))).size == 2,
      "fixture must contain known duplicate pairs")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = LshState(LshState.bandStream(mem.toDF().toDF("doc_id", "text")))
    val q = stream.writeStream.format("memory").queryName("lsh")
      .outputMode("update").start()
    try {
      docs.grouped(3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("lsh").as[CandidatePair].collect()
        .map(p => (p.doc_a, p.doc_b, p.est_jaccard)).toSet
      assert(streamed == expected,
        s"streamed ${streamed.toSeq.sorted} != batch ${expected.toSeq.sorted}")
    } finally q.stop()
  }

  test("stream-static contamination guard flags the same docs as the batch fuzzy pass") {
    // fixture discipline of ContaminationOpsSpec: salt-search a text into
    // the 1-in-25 eval gate, derive a one-word-edit near-dup outside it
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isEval(t: String): Boolean =
      java.lang.Long.parseLong(
        md5hex("eval|" + md5hex(t.trim.toLowerCase.replaceAll(" +", " "))).take(8), 16) % 25 == 0
    val words = (1 until 60).map(i => s"w$i")
    val evalText = Iterator.from(0).map(k => (s"s$k" +: words).mkString(" ")).find(isEval).get
    val nearDup = {
      val toks = evalText.split(" ")
      Iterator.from(0).map { k => val a = toks.clone(); a(30) = s"z$k"; a.mkString(" ") }
        .find(t => !isEval(t)).get
    }
    val cleanDoc = Iterator.from(0)
      .map(k => (s"c$k" +: (1 until 60).map(i => s"c$i")).mkString(" "))
      .find(t => !isEval(t)).get

    val dir = java.nio.file.Files.createTempDirectory("guard").toString
    Seq((0L, evalText, "src0"), (1L, nearDup, "src0"), (2L, cleanDoc, "src9"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batchFlagged = graft.pipeline.Sampling.decontaminateFuzzy(spark, dir).collect()
      .filter(_.getAs[Int]("contaminated") == 1).map(_.getAs[Long]("doc_id")).toSet
    spark.catalog.clearCache()
    assert(batchFlagged == Set(1L), "batch fixture must flag exactly the near-dup")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val evalDocs = Seq((0L, evalText)).toDF("doc_id", "text")
    val q = LshState.contaminationStream(mem.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("guard").outputMode("append").start()
    try {
      mem.addData((1L, nearDup)); q.processAllAvailable()
      mem.addData((2L, cleanDoc)); q.processAllAvailable()
      val flagged = spark.table("guard").select("doc_id").distinct()
        .as[Long].collect().toSet
      assert(flagged == batchFlagged,
        s"streamed guard flags $flagged, batch flags $batchFlagged")
      val est = spark.table("guard").select("est_jaccard").as[Double].collect()
      assert(est.forall(_ >= LshState.Threshold))
    } finally q.stop()
  }

  test("update emits a pair only when the later copy arrives, dedupes re-deliveries, caps state") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val sig1 = Seq.tabulate(16)(_.toLong)
    val sig2 = sig1.updated(0, 99L) // 15/16 matching
    val sigFar = Seq.fill(16)(7L)   // 0-1/16 matching
    // harness: drive update() directly through a TestGroupState
    import org.apache.spark.api.java.{Optional => JOptional}
    def run(st: Option[LshState.Bucket], rows: Seq[BandRow], cap: Int = 4) = {
      val gs = org.apache.spark.sql.streaming.TestGroupState.create[LshState.Bucket](
        st.map(JOptional.of[LshState.Bucket]).getOrElse(JOptional.empty[LshState.Bucket]()),
        GroupStateTimeout.NoTimeout, 0L, JOptional.empty[Long](), false)
      val out = LshState.update(LshState.Threshold, cap)((0, "bh"), rows.iterator, gs).toVector
      (out, gs.get)
    }

    // first arrival: no pair, member held
    val (o1, s1) = run(None, Seq(BandRow(0, "bh", 10L, sig1)))
    assert(o1.isEmpty && s1.members.map(_.docId) == Seq(10L))
    // near-dup arrival: one pair, oriented doc_a < doc_b
    val (o2, s2) = run(Some(s1), Seq(BandRow(0, "bh", 4L, sig2)))
    assert(o2 == Vector(CandidatePair(4L, 10L, 15 / 16.0)))
    assert(s2.members.map(_.docId) == Seq(10L, 4L))
    // far signature in the same bucket: held but no pair
    val (o3, s3) = run(Some(s2), Seq(BandRow(0, "bh", 20L, sigFar)))
    assert(o3.isEmpty && s3.members.size == 3)
    // re-delivery of a known doc: no emission, no duplicate member
    val (o4, s4) = run(Some(s3), Seq(BandRow(0, "bh", 10L, sig1)))
    assert(o4.isEmpty && s4.members.size == 3 && s4.dropped == 0L)
    // cap: the 5th distinct doc is counted dropped, not held
    val (_, s5) = run(Some(s4), Seq(
      BandRow(0, "bh", 30L, sigFar), BandRow(0, "bh", 31L, sigFar)))
    assert(s5.members.size == 4 && s5.dropped == 1L)
  }
}
