package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.PhashState.NearDupPair

/** PhashState semantics: the streamed near-dup pair set after N
  * triggers must equal the batch q_phash_pairs output over the
  * concatenated input — bucket membership is order-independent and a
  * pair emits exactly when its later copy arrives.
  */
class PhashStateSpec extends SparkSpec {
  import spark.implicits._

  // an identical triple (byte-identical payloads: hamming 0), an
  // identical pair, and two unrelated payloads
  private val imgA = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
  private val imgB = (1 to 80).map(i => ('b' + (i % 11)).toChar).mkString(" ")
  private val other = (1 to 80).map(i => if (i % 3 == 0) "zz" else "q").mkString(" ")
  private val clean = (1 to 80).map(i => s"${i % 7}").mkString("")
  private val docs: Seq[(Long, String)] = Seq(
    1L -> imgA, 2L -> imgA, 3L -> imgA,
    4L -> imgB, 5L -> imgB,
    6L -> other, 7L -> clean)

  private def batchPairs: Set[(Long, Long, Int)] = {
    val dir = java.nio.file.Files.createTempDirectory("phash-batch").toString
    docs.map { case (id, t) => (id, t, "s") }.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.pipeline.Multimodal.phashPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Int]("hamming"))).toSet
    spark.catalog.clearCache()
    out
  }

  test("streamed near-dup pairs over three triggers == batch q_phash_pairs") {
    val expected = batchPairs
    assert(expected.map(p => (p._1, p._2)).intersect(
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))).size == 4,
      s"fixture must contain the planted identical clusters: $expected")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = PhashState(PhashState.bandStream(mem.toDF().toDF("doc_id", "text")))
    val q = stream.writeStream.format("memory").queryName("phash")
      .outputMode("update").start()
    try {
      docs.grouped(3).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("phash").as[NearDupPair].collect()
        .map(p => (p.asset_a, p.asset_b, p.hamming)).toSet
      assert(streamed == expected,
        s"streamed ${streamed.toSeq.sorted} != batch ${expected.toSeq.sorted}")
    } finally q.stop()
  }

  test("a saturating identical burst never consumes the bucket: cap counts DISTINCT codes") {
    // drive update() directly with a planted hot bucket (the LshState
    // test seam pattern): cap 2 DISTINCT codes; four byte-identical
    // codes arrive (a burst past the cap under the old member
    // semantics), then a distinct near-miss code — which the batch cap
    // (2 distinct ≤ 2) keeps, so the stream must too
    val burst = (1L to 4L).map(i => PhashState.BandRow(0, 7L, i, 0x5555L))
    val state = new TestGroupState[PhashState.Bucket]
    val out1 = PhashState.update(2, 2)((0, 7L), burst.iterator, state).toVector
    assert(out1.map(p => (p.asset_a, p.asset_b)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)),
      s"the whole intra-burst pair set must emit: $out1")
    assert(state.got.exists(b =>
        b.groups.map(g => (g.phash, g.members.size)) == Seq((0x5555L, 4)) &&
          b.dropped == 0L),
      s"one group of four members, nothing dropped: ${state.got}")
    val out2 = PhashState.update(2, 2)(
      (0, 7L), Iterator(PhashState.BandRow(0, 7L, 9L, 0x5554L)), state).toVector
    assert(out2.map(p => (p.asset_a, p.asset_b, p.hamming)).toSet ==
      (1L to 4L).map(i => (i, 9L, 1)).toSet,
      s"the later distinct code must match every burst member (batch verdicts): $out2")
  }

  test("distinct-code cap and per-group member cap both bind counted, never silent") {
    // cap 2 distinct codes: a third distinct code is not held (counted)
    // but still pairs against the held groups before dropping
    val state = new TestGroupState[PhashState.Bucket]
    val rows = Seq(
      PhashState.BandRow(0, 7L, 1L, 0x5555L),
      PhashState.BandRow(0, 7L, 2L, 0x5554L),
      PhashState.BandRow(0, 7L, 3L, 0x5557L))
    val out = PhashState.update(2, 2)((0, 7L), rows.iterator, state).toVector
    assert(out.map(p => (p.asset_a, p.asset_b)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"the capped-out code still pairs on arrival: $out")
    assert(state.got.exists(b => b.groups.size == 2 && b.dropped == 1L),
      s"the third DISTINCT code must count as dropped: ${state.got}")
    // member cap 2: a 4-member identical group holds 2 ids, counts 2 —
    // later arrivals pair only against held ids (the narrowed boundary
    // the batch authority re-adjudicates)
    val st2 = new TestGroupState[PhashState.Bucket]
    val burst = (1L to 4L).map(i => PhashState.BandRow(0, 7L, i, 0x5555L))
    val out2 = PhashState.update(2, 2, memberCap = 2)((0, 7L), burst.iterator, st2).toVector
    assert(out2.map(p => (p.asset_a, p.asset_b)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)),
      s"past the member cap, pairs verify against held ids only: $out2")
    assert(st2.got.exists(b =>
        b.groups.map(g => (g.members.size, g.droppedMembers)) == Seq((2, 2L))),
      s"member overflow must count per group: ${st2.got}")
  }

  /** Minimal GroupState stub for driving update() synchronously. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    var got: Option[S] = None
    override def exists: Boolean = got.isDefined
    override def get: S = got.get
    override def getOption: Option[S] = got
    override def update(s: S): Unit = got = Some(s)
    override def remove(): Unit = got = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, a: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, a: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
