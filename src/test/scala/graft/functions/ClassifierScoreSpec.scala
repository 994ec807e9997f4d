package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[HashedFeatureScore]] must be bit-identical to the interpreted HOF
  * fold it replaced (`bias + aggregate(fs, 0, (acc, f) -> acc +
  * w[h32(f)%B+1]) / n`) — the q_quality_classifier /
  * q_quality_calibration oracles ride on that equality.
  */
class ClassifierScoreSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64
  private val weights: IndexedSeq[Double] =
    (0 until B).map(i => math.sin(i.toDouble) * 0.37 - 0.11).toIndexedSeq
  private val bias = 0.031

  private def hofScore = {
    val wlit = typedLit(weights)
    lit(bias) +
      aggregate(col("fs"), lit(0.0),
        (acc, f) => acc + element_at(wlit,
          ((conv(substring(md5(f), 1, 8), 16, 10).cast("long") % B) + 1).cast("int"))) /
        size(col("fs")).cast("double")
  }

  test("codegen score is bit-identical to the HOF fold, incl. bigrams and unicode") {
    val docs = Seq(
      Seq("the", "cat", "the cat", "sat", "cat sat"),
      Seq("naïve", "café", "naïve café", "日本語", "mixed 日本語"),
      Seq("x"),
      Seq("a", "b", "c", "d", "e", "f", "g", "h", "a b", "b c"),
    ).toDF("fs")
    val rows = docs.select(
      TextScoreFunctions.hashedFeatureScore(col("fs"), B, weights, bias).as("fast"),
      hofScore.as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"score drift: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("token form == HOF fold over the materialized unigram+bigram list") {
    val docs = Seq(
      Seq("the", "cat", "sat", "on", "the", "mat"),
      Seq("naïve", "café", "日本語"),
      Seq("single"),
    ).toDF("tk")
    // the classifier's featureList, replicated: toks ++ adjacent bigrams
    val bigrams = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val rows = docs
      .withColumn("fs", concat(col("tk"), bigrams))
      .select(
        TextScoreFunctions.hashedTokenScore(col("tk"), B, weights, bias).as("fast"),
        hofScore.as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"token-form drift: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("hashedBucketSum == HOF fold with the lookup array as a bound column") {
    val docs = Seq(
      (Seq("alpha", "beta", "beta gamma", "日本語"), (0 until B).map(i => i * 0.125 - 3.0)),
      (Seq("x"), (0 until B).map(i => -i * 0.5)),
    ).toDF("tk", "ratio")
    val hof = expr(s"""
      aggregate(tk, CAST(0.0 AS DOUBLE), (acc, t) ->
        acc + element_at(ratio,
          CAST((CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % $B) + 1 AS INT)))""")
    val rows = docs.select(
      TextScoreFunctions.hashedBucketSum(col("tk"), col("ratio"), B).as("fast"),
      hof.as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bucket-sum drift: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("empty feature array yields NaN (ANSI HOF form raises instead); null element nulls the score") {
    val empty = Seq(Seq.empty[String]).toDF("fs")
    val r = empty.select(
      TextScoreFunctions.hashedFeatureScore(col("fs"), B, weights, bias).as("fast"))
      .collect().head
    assert(r.getDouble(0).isNaN)
    // the replaced Column form cannot even evaluate this input under
    // ANSI (Divide raises) — the divergence is unreachable from the
    // classifier because split() always yields >= 1 token
    intercept[Exception] { empty.select(hofScore.as("ref")).collect() }
    val withNull = Seq(Tuple1(Seq("ok", null))).toDF("fs")
    val n = withNull.select(
      TextScoreFunctions.hashedFeatureScore(col("fs"), B, weights, bias).as("fast"))
      .collect().head
    assert(n.isNullAt(0), "null element must null the score like the HOF fold")
  }
}
