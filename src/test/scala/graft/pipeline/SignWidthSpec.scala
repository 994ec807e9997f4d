package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the width-grows-with-the-corpus policy of the sign-LSH lane
  * (round 15): the integer width ladder, its SQL mirror's boundaries,
  * the stride-anchored band refinement (width r+1 candidates are a
  * subset of width r candidates), and the hot-bucket stop-loss.
  */
class SignWidthSpec extends SparkSpec {
  import spark.implicits._

  test("width ladder: smallest r with expected bucket <= target, clamped to [4, 16]") {
    assert(Similarity.signBandWidthOf(0) == 4)
    assert(Similarity.signBandWidthOf(500) == 4)
    assert(Similarity.signBandWidthOf(2000) == 4)   // sf0.1 keeps today's geometry
    assert(Similarity.signBandWidthOf(2048) == 4)   // boundary: 128 << 4
    assert(Similarity.signBandWidthOf(2049) == 5)
    assert(Similarity.signBandWidthOf(20000) == 8)
    assert(Similarity.signBandWidthOf(131072) == 10)
    assert(Similarity.signBandWidthOf(131073) == 11)
    assert(Similarity.signBandWidthOf(200000) == 11) // the measured r14 knee corpus
    assert(Similarity.signBandWidthOf(2000000) == 14)
    assert(Similarity.signBandWidthOf(Long.MaxValue / 2) == 16)
    // the policy's invariant: expected organic bucket at the chosen
    // width is at or under the target (until the width ceiling binds)
    for (n <- Seq(100L, 3000L, 50000L, 200000L, 1000000L)) {
      val r = Similarity.signBandWidthOf(n)
      assert(n <= (Similarity.SignBucketTarget << r),
        s"bucket target violated at n=$n r=$r")
    }
  }

  test("SQL ladder mirrors the Scala ladder's boundaries exactly") {
    val sql = Similarity.signWidthCteSql
    for (r <- Similarity.SignBandWidthFloor until Similarity.SignBandWidthCeil)
      assert(sql.contains(s"WHEN c <= ${Similarity.SignBucketTarget << r} THEN $r"),
        s"ladder step $r missing from SQL mirror")
    assert(sql.contains(s"ELSE ${Similarity.SignBandWidthCeil}"))
    assert(sql.contains("count(*) AS c FROM embeddings"))
  }

  test("bands refine in place: value at width r equals value at width r+1 masked to r bits") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.signCodeHi(col("embedding")).as("code_hi"),
        Similarity.signCode(col("embedding")).as("code_lo"))
    for (r <- Seq(4, 8, 11, 15)) {
      val lo = Similarity.signBandRows(df, Seq("vec_id"), r)
        .select(col("vec_id"), col("band"), col("bv")).collect()
        .map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
      val hi = Similarity.signBandRows(df, Seq("vec_id"), r + 1)
        .select(col("vec_id"), col("band"), col("bv")).collect()
        .map(x => (x.getLong(0), x.getInt(1)) -> x.getLong(2)).toMap
      lo.foreach { case (k, v) =>
        assert((hi(k) & ((1L << r) - 1)) == v,
          s"band value at width ${r + 1} does not refine width $r at $k")
      }
    }
  }

  test("pair-volume guard: a pathological bucket histogram aborts with the named error") {
    // a planted bucket of 1000 (under the 4096 stop-loss cap, so it is
    // NOT dropped) against a budget of 100k pairs: C(1000,2) ~ 500k
    // must abort BEFORE any pair forms, naming lane/volume/budget
    val rows = (0 until 1000).map(i => (i.toLong, 0, 7L)) :+ (1000L, 1, 3L)
    val banded = rows.toDF("vec_id", "band", "bv")
    val e = intercept[graft.core.PairVolumeExceeded] {
      Similarity.signKeptBands(banded, "spec_lane", budget = 100000L)
    }
    assert(e.lane == "spec_lane")
    assert(e.pairs == 1000L * 999 / 2 && e.budget == 100000L, s"${e.pairs}/${e.budget}")
    // the same histogram under a roomy budget passes and keeps all rows
    assert(Similarity.signKeptBands(banded, "spec_lane", budget = 1000000L).count() == 1001)
  }

  test("hot-bucket stop-loss: a degenerate all-identical clique drops, normal pairs survive") {
    val dir = java.nio.file.Files.createTempDirectory("signcap").toString
    val clique = (Similarity.SignBucketCap + 1).toInt
    val base = Array.fill(64)(0.5f)
    val rows =
      // a pathological clique: identical vectors -> identical codes ->
      // every (band, bv) bucket they occupy exceeds the cap
      (0 until clique).map(i => (i.toLong, base.toSeq)) ++
        // two similar NORMAL vectors in their own thin buckets: flip the
        // sign pattern so their codes differ from the clique's
        Seq((clique.toLong, (0 until 64).map(i => if (i < 32) 1.0f else -1.0f)),
          (clique + 1.toLong, (0 until 64).map(i => if (i < 32) 0.9f else -1.1f)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.annLsh(spark, dir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((clique.toLong, clique + 1L)),
      s"thin-bucket pair must survive the stop-loss: ${out.take(5).toSeq}")
    assert(!out.exists(p => p._1 < clique && p._2 < clique),
      "pathological clique pairs must drop with their hot buckets")
  }
}
