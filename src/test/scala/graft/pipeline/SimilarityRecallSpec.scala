package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Pins the LSH operator's recall against the brute-force ground truth
  * on the sf0.001 embeddings — sign-LSH recall is a function of
  * similarity (P(bit agrees) = 1 - angle/pi), so the floor is asserted
  * for the near-dup regime the operator exists for, and overall recall
  * is asserted not to regress below its measured level.
  */
class SimilarityRecallSpec extends SparkSpec {

  test("LSH candidate recall vs brute force (cos >= 0.3 ground truth)") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Similarity.dot(col("embedding"), col("embedding")).as("nsq"))
    val truth = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        Similarity.dot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nsq") * col("b.nsq")))
      .filter(col("cos") >= 0.3)
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"), col("cos"))
      .collect()
    val found = Similarity.annLsh(spark, sf)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val overall = truth.count(r => found((r.getLong(0), r.getLong(1)))).toDouble / truth.length
    val strong = truth.filter(_.getDouble(2) >= 0.42)
    val strongRecall =
      if (strong.isEmpty) 1.0
      else strong.count(r => found((r.getLong(0), r.getLong(1)))).toDouble / strong.length

    assert(overall >= 0.6, f"overall LSH recall regressed: $overall%.3f")
    assert(strongRecall >= 0.8, f"near-dup-regime LSH recall regressed: $strongRecall%.3f")
  }
}

/** IVF recall: the probed-cells candidate search must recover most of
  * the exact brute-force top-5 — probing ¼ of the auto-sized cells trades bounded work
  * for recall, and this pins where that trade lands on real data.
  */
class IvfRecallSpec extends SparkSpec {

  test("IVF top-5 recall vs brute-force top-5") {
    val sf = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame, q: String, v: String) =
      df.select(col(q), col(v)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.annTopk(spark, sf), "q_id", "vec_id")
    val ivf = pairs(Similarity.annIvf(spark, sf), "q_id", "vec_id")
    assert(ivf.nonEmpty, "IVF returned no neighbors")
    val recall = (truth & ivf).size.toDouble / truth.size
    assert(recall >= 0.6, f"IVF recall regressed: $recall%.3f")
    // every query keeps a full top-k (probed cells are never empty at k=5)
    val perQuery = Similarity.annIvf(spark, sf).groupBy(col("q_id")).count().collect()
    assert(perQuery.forall(_.getLong(1) == Similarity.IvfTopK.toLong))
  }

  test("recall is monotone in nprobe and the production width matches its override") {
    // probe sets are NESTED (top-p of the same sorted cell ranking), so
    // widening the probe budget can only add candidates — mean recall
    // must be non-decreasing in nprobe. This is the contract the
    // ScaleProbe recall_sweep instrument reads at 10x; pinning it here
    // keeps the parameterized path honest at gate scale too.
    val sf = "/root/testdata/sf0.001"
    def meanRecall(p: Option[Int]): Double =
      Similarity.annRecallProbe(spark, sf, p)
        .agg(avg(col("recall"))).head().getDouble(0)
    val byWidth = Seq(1, 2, 4, 8).map(p => meanRecall(Some(p)))
    byWidth.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo <= hi + 1e-9, s"recall must be monotone in nprobe: $byWidth")
    }
    // the default path IS the production width — same number both ways
    val prod = meanRecall(None)
    val cells = Similarity.ivfCellsOf(
      Tables.embeddings(spark, sf).count())
    val explicit = meanRecall(Some(Similarity.ivfProbeOf(cells)))
    assert(prod == explicit,
      s"production-width recall must equal its explicit override: $prod vs $explicit")
  }
}
