package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 operators: the 4-modality batch keep list
  * (`q_keep_list_estate`) and its one-row card. The oracle gates the
  * exact relation; these tests pin the SEMANTIC boundaries — gate
  * precedence, estate membership of dup targets, and batch/card
  * consistency — on the fixture corpus.
  */
class Round12OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("estate keep list: precedence, estate-membership, text verdicts preserved") {
    val base = Curate.keepList(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[String]("reason"), Option(r.get(3)))))
      .toMap
    val est = Curate.keepListEstate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[String]("reason"), Option(r.get(3)))))
      .toMap
    spark.catalog.clearCache()
    val modalityReasons = Set("image_dup", "audio_dup", "semantic_dup")
    assert(est.keySet == base.keySet, "the estate list must cover the corpus verbatim")
    // keep == (reason == "keep") everywhere
    assert(est.values.forall { case (k, r, _) => k == (r == "keep") })
    est.foreach { case (id, (_, reason, dupOf)) =>
      if (modalityReasons(reason)) {
        // a modality gate only ever overrides a doc the TEXT stack kept,
        // and only for the arriving (odd-id) crawl
        assert(base(id)._2 == "keep",
          s"doc $id flipped to $reason but the text stack said ${base(id)._2}")
        assert(id % 2 == 1, s"estate (even) doc $id cannot fail an estate gate")
        // its dup target is an estate (even-id) member
        assert(dupOf.exists(_.asInstanceOf[Long] % 2 == 0),
          s"doc $id: $reason dup_of must name an estate member, got $dupOf")
      } else {
        // every non-modality disposition is the text stack's, verbatim
        assert((est(id)._2, est(id)._3) == ((base(id)._2, base(id)._3)),
          s"doc $id: text verdict drifted: ${est(id)} vs ${base(id)}")
      }
    }
    // the gates must actually bind on the fixture (the corpus plants
    // cross-parity image/audio/semantic dups)
    assert(est.values.exists(v => modalityReasons(v._2)),
      "fixture corpus must exercise at least one modality gate")
  }

  test("estate keep list: gate precedence image > audio > semantic") {
    val img = graft.sources.PhashIndex.phashIngestGate(spark, sf)
      .select(col("asset_id")).distinct().collect().map(_.getLong(0)).toSet
    val aud = graft.sources.AudioIndex.audioIngestGate(spark, sf)
      .select(col("asset_id")).distinct().collect().map(_.getLong(0)).toSet
    val est = Curate.keepListEstate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    spark.catalog.clearCache()
    est.foreach { case (id, reason) =>
      if (reason == "audio_dup")
        assert(!img.contains(id), s"doc $id is an image match and must say image_dup")
      if (reason == "semantic_dup")
        assert(!img.contains(id) && !aud.contains(id),
          s"doc $id matches an earlier gate and must not say semantic_dup")
    }
  }

  test("audio incremental: a bridge merges the arriving rep into history's cluster") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("aui12").toString
    val shared = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
    val uniq = (tag: String) => (1 to 80).map(j => s"${tag}_${j}_zq").mkString(" ")
    // history (even): 2 and 4 are identical tracks (star edge 2 -> 4),
    // arriving (odd): 3 is the same track — a BRIDGE into A through
    // the landmark join. 5 and 6 differ only per-token-tag, so their
    // peak fingerprints agree on all 7 landmarks (texts that are
    // "unique" as shingles are near-dups as audio — the modality gap
    // the estate exists for): a second, solo-history bridge whose A
    // rep had NO A-internal pair (the quotientMerge `extra` path)
    Seq((2L, shared), (4L, shared), (6L, uniq("u6")), (3L, shared), (5L, uniq("u5")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Audio.audioIncremental(spark, dir).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Long]("cluster_root"), r.getAs[Long]("cluster_size"))))
      .toMap
    spark.catalog.clearCache()
    assert(got == Map(2L -> ((2L, 3L)), 3L -> ((2L, 3L)), 4L -> ((2L, 3L)),
        5L -> ((5L, 2L)), 6L -> ((5L, 2L))),
      s"bridge must merge rep 3 into {2,4}; solo-A bridge must form {5,6}: $got")
  }

  test("estate card rolls up exactly the estate keep list") {
    val kl = Curate.keepListEstate(spark, sf).collect()
    val card = DatasetCard.datasetCardEstate(spark, sf).collect().head
    spark.catalog.clearCache()
    def n(reason: String) = kl.count(_.getAs[String]("reason") == reason).toLong
    assert(card.getAs[Long]("n_keep") == kl.count(_.getAs[Boolean]("keep")).toLong)
    for (r <- Seq("near_dup", "image_dup", "audio_dup", "semantic_dup"))
      assert(card.getAs[Long](s"n_$r") == n(r), s"card n_$r must match the list")
    val splits = kl.flatMap(r => Option(r.getAs[String]("split"))).groupBy(identity)
    for (s <- Seq("train", "val", "test"))
      assert(card.getAs[Long](s"n_$s") == splits.get(s).map(_.length).getOrElse(0).toLong)
  }
}
