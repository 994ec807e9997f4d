package graft.pipeline

import graft.SparkSpec

/** Round-9: every REGISTERED shingle-pair query rides the bounded
  * posting-list scaffold under [[Dedup.PairGuardFreqCap]] — the last
  * uncapped hot-key self-joins (q_dedup_ngram / q_containment and the
  * fuzzy/recall legs) are retired to spec-only truth. These pin (a)
  * guard-cap transparency: on the real gate corpus the guarded result
  * EQUALS the uncapped truth (the cap is non-binding below
  * document-frequency 64), and (b) the bound itself: a planted
  * boilerplate corpus whose hot shingles exceed the guard produces
  * C(n,2) pairs uncapped and zero guarded, while rare-content pairs
  * survive identically.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet

  test("q_dedup_ngram under the guard cap equals the uncapped truth on the gate corpus") {
    val guarded = pairSet(Dedup.ngramJaccard(spark, sf))
    val truth = pairSet(
      Dedup.uncappedPairScaffoldSpecOnly(spark, sf)(_ < _)(Dedup.jaccardFinish))
    spark.catalog.clearCache()
    assert(guarded == truth,
      s"guard cap altered gate-corpus Jaccard pairs: only-guarded=${guarded -- truth}, " +
        s"only-truth=${truth -- guarded}")
    assert(guarded.nonEmpty, "gate corpus must produce near-dup pairs")
  }

  test("q_containment under the guard cap equals the uncapped truth on the gate corpus") {
    def contSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared"), r.getAs[Long]("n_sh_a"),
        r.getAs[Double]("containment"))).toSet
    val guarded = contSet(Dedup.containment(spark, sf))
    val truth = contSet(
      Dedup.uncappedPairScaffoldSpecOnly(spark, sf)(_ =!= _) { (pairs, sizes) =>
        import org.apache.spark.sql.functions._
        pairs
          .join(sizes.as("s1"), col("doc_a") === col("s1.doc_id"))
          .withColumn("containment",
            round(col("shared").cast("double") / col("n_sh"), 6))
          .filter(col("containment") >= Dedup.ContainmentMin)
          .select(col("doc_a"), col("doc_b"), col("shared"),
            col("n_sh").as("n_sh_a"), col("containment"))
      })
    spark.catalog.clearCache()
    assert(guarded == truth,
      s"guard cap altered gate-corpus containment pairs: only-guarded=${guarded -- truth}, " +
        s"only-truth=${truth -- guarded}")
    assert(guarded.nonEmpty, "gate corpus must produce containment pairs")
  }

  test("the guard cap prices out >cap boilerplate while rare pairs survive") {
    // 70 identical boilerplate docs (every shingle at document-frequency
    // 70 > PairGuardFreqCap) plus one identical rare pair: uncapped the
    // boilerplate block alone is C(70,2) = 2415 pairs — the quadratic
    // blowup the guard exists to kill; guarded, the block vanishes and
    // ONLY the rare pair reports.
    require(Dedup.PairGuardFreqCap == 64L, "test plants 70 > cap copies")
    val dir = java.nio.file.Files.createTempDirectory("guard9").toString
    val boiler = (1 to 6).map(i => s"b$i").mkString(" ")
    val rare = (1 to 6).map(i => s"r$i").mkString(" ")
    val rows = (1L to 70L).map(i => (i, boiler, "s")) ++
      Seq((1001L, rare, "s"), (1002L, rare, "s"))
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val guarded = pairSet(Dedup.ngramJaccard(spark, dir))
    val truth = pairSet(
      Dedup.uncappedPairScaffoldSpecOnly(spark, dir)(_ < _)(Dedup.jaccardFinish))
    spark.catalog.clearCache()
    assert(truth.size == 2415 + 1,
      s"uncapped truth should carry the C(70,2) boilerplate block, got ${truth.size}")
    assert(guarded == Set((1001L, 1002L, 2L, 1.0)),
      s"guarded form must keep exactly the rare pair, got $guarded")
  }
}
