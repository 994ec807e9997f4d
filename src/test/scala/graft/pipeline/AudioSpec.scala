package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The audio landmark family on crafted 65-char "tracks" (length 65
  * makes sample j exactly character j+1, so window peaks are planted
  * by construction): hand-computed landmark values, the ≥5/7
  * agreement verdict across planted corruptions, and the locality
  * property the constellation design exists for — one damaged window
  * kills at most two landmarks.
  */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  /** A track whose window-w peak sits at position q(w): 8 chars of
    * 'a' with a 'z' at the peak, per window, plus one pad char.
    */
  private def track(q: Seq[Int]): String = {
    require(q.length == 8)
    q.map(p => "a" * p + "z" + "a" * (7 - p)).mkString + "a"
  }

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("landmarks are the packed adjacent-window peak pairs") {
    val lms = Audio.landmarksOf(docs(1L -> track(0 to 7)))
      .select(col("lms")).collect().head.getSeq[Long](0)
    // peak(w) = w, so landmark w = w*64 + w*8 + (w+1)
    assert(lms == (0 to 6).map(w => (w * 64 + w * 8 + w + 1).toLong),
      s"got $lms")
  }

  test("agreement verdict: identical 7, edge corruption 6, boundary 4, scattered kill") {
    val a = track(0 to 7)
    val oneWin = track(Seq(0, 1, 2, 3, 4, 5, 6, 0)) // window 7 moved: landmark 6
    val threeAdj = track(Seq(7, 6, 5, 3, 4, 5, 6, 7)) // windows 0-2: landmarks 0-2
    val scattered = track(Seq(7, 1, 6, 3, 5, 5, 6, 7)) // windows 0,2,4: landmarks 0-4
    val pairs = Audio.audioDupPairsOf(
        docs(1L -> a, 2L -> a, 3L -> oneWin, 4L -> threeAdj, 5L -> scattered))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 7L, "identical tracks agree on all 7")
    assert(pairs((1L, 3L)) == 6L,
      "a damaged EDGE window kills exactly one adjacent-pair landmark")
    assert(pairs((2L, 3L)) == 6L)
    assert(pairs((1L, 4L)) == 4L,
      "three adjacent damaged windows kill 3 landmarks: the majority boundary holds")
    assert(!pairs.contains((1L, 5L)),
      "three scattered damaged windows kill 5 landmarks: below the majority line")
    assert(!pairs.contains((4L, 5L)), s"4 vs 5 agree only on landmarks 5, 6: $pairs")
  }

  test("planted recall gate: the probe's near-dup is found by both legs") {
    val a = track(0 to 7)
    val near = track(Seq(0, 1, 2, 3, 4, 5, 6, 0)) // agree 6 with a
    val far = track(Seq(7, 6, 5, 4, 3, 2, 1, 0))
    val r = Audio.audioRecallOf(
        docs(20L -> a, 21L -> near, 22L -> far, 23L -> track(Seq(1, 0, 3, 2, 5, 4, 7, 6))))
      .collect().head
    assert(r.getAs[Long]("n_truth") == 1L, s"truth must hold exactly (20, 21): $r")
    assert(r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("band stats count a planted saturated landmark as capped") {
    // 260 distinct fingerprints share landmark slot 3 (windows 3 and 4
    // fixed) while windows 0-2 sweep — bucket (3, lm3) exceeds the cap
    val fps = (0 until 260).map { i =>
      val q = Seq(i % 8, (i / 8) % 8, (i / 64) % 8 + (i / 512), 3, 4, 5, 6, 7)
      val lms = (0 to 6).map(w => (w * 64 + q(w) * 8 + q(w + 1)).toLong)
      (i.toLong, lms.zipWithIndex.map { case (lm, w) => lm << (9 * w) }.sum)
    }.toDF("asset_id", "fp")
    val stats = Audio.audioBandStatsOfFps(fps).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(stats(3).getAs[Long]("capped_buckets") == 1L,
      s"slot 3's saturated bucket must count as capped: ${stats(3)}")
    assert(stats(3).getAs[Long]("max_bucket") == 260L)
    assert(stats(0).getAs[Long]("capped_buckets") == 0L,
      "the sweeping slots stay under the cap")
    assert(stats.values.forall(_.getAs[Long]("n_postings") == 260L),
      "every slot holds one posting per distinct fingerprint")
  }

  test("agreement sweep: monotone pricing; the majority row equals the pair query") {
    val sf = "/root/testdata/sf0.001"
    val sweep = Audio.audioAgreeSweep(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert((1 to 6).forall(k => sweep(k)._2 >= sweep(k + 1)._2),
      s"cumulative pair volume must fall as the threshold rises: $sweep")
    val atMajority = Audio.audioDupPairs(spark, sf).count()
    assert(sweep(Audio.MinLandmarkAgree)._2 == atMajority,
      s"the sweep's majority row (${sweep(Audio.MinLandmarkAgree)}) must price " +
        s"exactly what q_audio_dup_pairs emits ($atMajority) — counted by " +
        "multiplicity products here, by row expansion there")
  }

  test("an interior damaged window kills exactly two landmarks") {
    val a = track(0 to 7)
    val mid = track(Seq(0, 1, 2, 0, 4, 5, 6, 7)) // window 3 moved: landmarks 2 and 3
    val pairs = Audio.audioDupPairsOf(docs(1L -> a, 2L -> mid))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 5L, s"got $pairs")
  }
}
