package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash signature: identical docs -> identical signatures") {
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs).collect().map(_.getSeq[Long](1))
    assert(sigs(0) == sigs(1))
  }

  test("minhash estimate tracks true jaccard direction") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def matches(a: Long, b: Long) = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
    assert(matches(1L, 2L) > matches(1L, 3L))
  }

  test("simhash: identical docs hamming 0; disjoint docs differ") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashes(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
  }

  test("banded simhash pairing finds exactly the all-pairs set (pigeonhole completeness)") {
    // 7 bands over 32 bits guarantee a band collision for Hamming <= 6;
    // the banded equi join (the registered scale path) must therefore
    // reproduce the O(n^2) reference join exactly on real data
    val sf = "/root/testdata/sf0.001"
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = keyset(Dedup.simhashPairs(spark, sf))
    val allPairs = keyset(Dedup.simhashPairsAllPairs(spark, sf))
    assert(banded == allPairs, "banded candidate set diverged from all-pairs")
    assert(banded.nonEmpty, "cross-check is vacuous: no near-dup pairs at this SF")
  }

  test("connected components: minimal roots, closed clusters, every pair co-clustered") {
    val sf = "/root/testdata/sf0.001"
    val comp = Dedup.components(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(comp.nonEmpty)
    comp.foreach { case (id, (root, size)) =>
      assert(root <= id, s"root $root above member $id")
      assert(comp(root)._1 == root, "cluster root must be its own root")
      assert(size >= 2, "every clustered doc has at least one neighbor")
    }
    val pairs = Dedup.ngramJaccard(spark, sf).select("doc_a", "doc_b").collect()
    pairs.foreach { r =>
      assert(comp(r.getLong(0))._1 == comp(r.getLong(1))._1,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
  }

  test("shingles: short docs fall back to the whole text") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val sh = df.select(Dedup.shingles(split(col("text"), " "))).head.getSeq[String](0)
    assert(sh == Seq("a b"))
  }

  test("normalized dedup collapses case and whitespace variants") {
    // the gate corpus has no such variants, so the replace-ALL semantics
    // ('g' flag on the DuckDB side) are made load-bearing here
    val norm = regexp_replace(lower(trim(col("text"))), " +", " ")
    val df = Seq(
      (1L, "Hello   World  again"),
      (2L, "  hello world AGAIN".replace("AGAIN", "again")),
      (3L, "different doc"),
    ).toDF("doc_id", "text")
    val groups = df.groupBy(md5(norm).as("h"))
      .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native dot product equals the interpreted fold bit-for-bit") {
    val vecs = Seq(
      (Array(0.1f, -0.2f, 0.3f, 0.47f), Array(0.9f, 0.11f, -0.5f, 0.033f)),
      (Array(1e-8f, 2e8f, -3.5f, 0.0f), Array(7.7f, -1e-9f, 2.25f, 5.0f)),
    ).toDF("a", "b")
    val out = vecs.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("fold"),
    ).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("sign code is deterministic and within 32 bits") {
    val v = (0 until 64).map(i => (i % 7 - 3).toFloat).toArray
    val df = Seq(Tuple1(v), Tuple1(v)).toDF("embedding")
    val codes = df.select(Similarity.signCode(col("embedding"))).collect().map(_.getLong(0))
    assert(codes(0) == codes(1))
    assert(codes(0) >= 0 && codes(0) < (1L << Similarity.CodeBits))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fake codec is deterministic and length-faithful") {
    val a = Multimodal.MediaAsset(1L, "image", "hello".getBytes("UTF-8"), 10, 10, 0L)
    val f1 = Multimodal.FakeCodec.decode(a)
    val f2 = Multimodal.FakeCodec.decode(a)
    assert(f1 == f2)
    assert(f1.n_bytes == 5L)
    assert(f1.head_byte == 'h'.toInt)
  }

  test("video frame count ~25fps; frame sampling strides") {
    val v = Multimodal.MediaAsset(2L, "video", Array[Byte](1, 2), 0, 0, 1000L)
    val f = Multimodal.FakeCodec.decode(v)
    assert(f.frame_count == 25)
    assert(Multimodal.FakeCodec.sampleFrames(f.frame_count, 10) == Seq(0, 10, 20))
  }

  test("extractFeatures runs as a partition-iterator stage end-to-end") {
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", "abc".getBytes, 1, 1, 0L),
      Multimodal.MediaAsset(2L, "video", "defg".getBytes, 1, 1, 200L),
    ).toDS()
    val feats = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats.map(_.n_bytes).toSeq == Seq(3L, 4L))
    assert(feats(1).frame_count == 5)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stopword hits drive language prediction with fixed tie-break") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "el perro y la casa de que", "es"),
      (3L, "zzz qqq www", "??"),
    ).toDF("doc_id", "text", "lang")
    val t = TextAnalysis.tokens(col("text"))
    val scored = docs.select(
      col("doc_id"),
      size(filter(t, x => x.isin(TextAnalysis.EnStop: _*))).as("n_en"),
      size(filter(t, x => x.isin(TextAnalysis.EsStop: _*))).as("n_es"),
    ).collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(scored(1L)._1 > scored(1L)._2)
    assert(scored(2L)._2 > scored(2L)._1)
    assert(scored(3L) == ((0, 0)))
  }
}
