package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.{AudioIndex, EmbedIndex, PhashIndex, SignatureIndex}

/** The composed admission gate as ONE stream: verdicts at ingest equal
  * the batch run of the same plan on the same documents (any trigger
  * split), and each planted document lands on exactly the gate the
  * composition's precedence assigns — text rules first, then
  * image_dup, then audio_dup, then semantic_dup, else admit.
  *
  * Fixture notes: corpus docs 2 and 4 share a phash code (same
  * character-class structure), so the image index holds ONE
  * representative (2) with multiplicity 2. Doc 907's text is doc 2's
  * with every NON-SAMPLED, non-space character mutated (digits shifted
  * into letters, letters uppercased): byte-length and all 32 sampled
  * pixels are preserved — identical phash — while the token set is
  * fully disjoint, so the text gate says keep and only the image gate
  * can catch it. Doc 908 is token-novel and phash-far but carries a
  * corpus vector's exact embedding direction — only the semantic gate
  * catches it.
  */
class AdmissionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val doc2Text = (1 to 40).map(i => s"w$i").mkString(" ")
  private val doc4Text = (1 to 40).map(i => s"x$i").mkString(" ")

  /** Same phash as doc2Text by construction, disjoint tokens. */
  private val imageDupText = {
    val L = doc2Text.length
    val sampled = (0 until 32).map(j => (j * (L - 1)) / 32).toSet
    doc2Text.zipWithIndex.map { case (c, i) =>
      if (sampled(i) || c == ' ') c
      else if (c.isDigit) (c + 17).toChar
      else c.toUpper
    }.mkString
  }

  /** A 65-char "track" whose window-w audio peak sits at q(w): 8
    * windows of 8 chars — 'z' at the peak, spaces at in-window
    * positions 2 and 6 (17 short tokens, past the funnel's minimum),
    * filler cycling by window. The `remaster` variant keeps every
    * peak ('!' and 'y' both sort below 'z') but drops BELOW-MEAN '!'
    * filler onto the phash-sampled positions of windows 0-3, flipping
    * ~12 aHash bits — the image gate must NOT catch what only the
    * audio gate should.
    */
  private def audioTrack(q: Seq[Int], remaster: Boolean): String = {
    require(q.length == 8 && q.forall(p => p != 2 && p != 6 && p >= 0 && p <= 7))
    val sb = new StringBuilder
    for (w <- 0 until 8; i <- 0 until 8) {
      sb += (if (i == q(w)) 'z'
        else if (i == 2 || i == 6) ' '
        else if (remaster && (8 * w + i) % 2 == 0) (if (w < 4) '!' else 'y')
        else ('a' + (w % 3)).toChar)
    }
    (sb += 'a').result()
  }

  private val doc6Text = audioTrack(Seq(0, 1, 3, 4, 5, 7, 0, 1), remaster = false)
  /** Same peaks as doc 6 in windows 0-5 (landmarks 0-4 agree → 5/7,
    * past the strict majority), disjoint tokens, far phash.
    */
  private val audioDupText = audioTrack(Seq(0, 1, 3, 4, 5, 7, 4, 5), remaster = true)

  private def oneHot(d: Int, scale: Float = 1.0f): Seq[Float] =
    (0 until 64).map(i => if (i == d) scale else 0.0f)

  private val centers = (0 until 5).map(f =>
    (0 until 64).map(d => if (d == f) 1.0 else 0.0).toArray).toIndexedSeq

  private def corpusDf = Seq(
    (2L, doc2Text, "s"), (4L, doc4Text, "s"), (6L, doc6Text, "s"),
  ).toDF("doc_id", "text", "source")

  private def corpusEmbDf = Seq(
    (2L, oneHot(0)), (4L, oneHot(1)),
  ).toDF("vec_id", "embedding")

  // one arriving doc per gate, novel embeddings (dim 7: equidistant
  // from every center, cosine 0 against every corpus vector) except
  // the planted semantic dup
  private val incoming = Seq(
    (901L, "tiny doc too short", oneHot(7)),
    (902L, Seq.fill(40)("rep").mkString(" "), oneHot(7)),
    (903L, ((1 to 20).map(i => s"ok$i") ++ Seq.fill(4)("error")).mkString(" "), oneHot(7)),
    (904L, doc2Text, oneHot(7)),
    (905L, ((1 to 39).map(i => s"w$i") :+ "edited").mkString(" "), oneHot(7)),
    (906L, (1 to 40).map(i => s"novel$i").mkString(" "), oneHot(7)),
    (907L, imageDupText, oneHot(7)),
    (908L, (1 to 40).map(i => s"sem$i").mkString(" "), oneHot(0, 3.0f)),
    (909L, audioDupText, oneHot(7)),
  )

  test("stream == batch across trigger splits; each planted doc hits its gate") {
    SignatureIndex.write(corpusDf, "adm_sig")
    PhashIndex.write(corpusDf, "adm_ph")
    AudioIndex.write(corpusDf, "adm_au")
    EmbedIndex.write(corpusEmbDf, "adm_em", centers)
    try {
      def shape(rows: Array[IngestGate.Admission]) = rows.map(a =>
        (a.doc_id, a.verdict, a.text_dup_of, a.image_dup_of, a.best_hamming,
          a.audio_dup_of, a.best_agree, a.embed_dup_of, a.best_cos)).toSet

      val batch = shape(IngestGate.admissionStream(
        incoming.toDF("doc_id", "text", "embedding"),
        corpusDf, "adm_sig", "adm_ph", "adm_au", "adm_em", centers).collect())

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, Seq[Float])]
      val gate = IngestGate.admissionStream(
        mem.toDF().toDF("doc_id", "text", "embedding"),
        corpusDf, "adm_sig", "adm_ph", "adm_au", "adm_em", centers)
      val q = gate.toDF().writeStream.format("memory").queryName("adm_stream_v")
        .outputMode("update").start()
      try {
        // arbitrary trigger split: 3 + 4 + 1
        mem.addData(incoming.take(3))
        q.processAllAvailable()
        mem.addData(incoming.slice(3, 7))
        mem.addData(incoming.drop(7))
        q.processAllAvailable()
        val streamed = spark.table("adm_stream_v").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
            r.getAs[java.lang.Long]("text_dup_of"), r.getAs[java.lang.Long]("image_dup_of"),
            r.getAs[java.lang.Integer]("best_hamming"),
            r.getAs[java.lang.Long]("audio_dup_of"), r.getAs[java.lang.Long]("best_agree"),
            r.getAs[java.lang.Long]("embed_dup_of"),
            r.getAs[java.lang.Double]("best_cos"))).toSet
        assert(streamed == batch,
          s"stream and batch admission verdicts diverged:\nonly-stream=${streamed -- batch}\n" +
            s"only-batch=${batch -- streamed}")
      } finally q.stop()

      // gate attribution, composition precedence
      assert(batch.size == incoming.size, "exactly one verdict row per arriving doc")
      val by = batch.map(v => v._1 -> v).toMap
      assert(by(901L)._2 == "text_too_short")
      assert(by(902L)._2 == "text_too_repetitive")
      assert(by(903L)._2 == "text_blocklisted")
      assert(by(904L)._2 == "text_exact_dup" && by(904L)._3 == (2L: java.lang.Long))
      assert(by(905L)._2 == "text_near_dup" && by(905L)._3 == (2L: java.lang.Long))
      assert(by(906L) == ((906L, "admit", null, null, null, null, null, null, null)),
        s"the novel doc must admit clean: ${by(906L)}")
      assert(by(907L)._2 == "image_dup" && by(907L)._4 == (2L: java.lang.Long) &&
        by(907L)._5 == (0: java.lang.Integer),
        s"the pixel-identical re-encode must gate as image_dup of rep 2: ${by(907L)}")
      assert(by(908L)._2 == "semantic_dup" && by(908L)._8 == (2L: java.lang.Long) &&
        by(908L)._9 == (1.0: java.lang.Double),
        s"the paraphrase must gate as semantic_dup of vec 2: ${by(908L)}")
      assert(by(909L)._2 == "audio_dup" && by(909L)._6 == (6L: java.lang.Long) &&
        by(909L)._7 == (5L: java.lang.Long),
        s"the peak-preserving re-master must gate as audio_dup of rep 6 at 5/7: ${by(909L)}")
    } finally Seq("adm_sig", "adm_ph", "adm_au", "adm_em")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}
