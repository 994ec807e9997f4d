package graft.pipeline

import graft.SparkSpec

/** Planted-fixture semantics for the round-7 text signals (the driver
  * oracle proves cross-engine parity on the corpus; these pin the
  * DECISIONS on documents built to trip each rule).
  */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(docs: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sigdocs").toString
    docs.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q_code_detect -------------------------------------------------

  test("codeDetect: symbol-dense, keyword-dense, and identifier-dense docs flag; prose does not") {
    val dir = writeDocs(Seq(
      (1L, "def main(x) { return x; } if (x == 1) { x = 2; }", "en", "s"),
      (2L, "import os for while class def return var else if", "en", "s"),
      (3L, "the quick snake_case_name camelCaseName other_ident runs by", "en", "s"),
      (4L, "the quick brown fox jumps over the lazy dog again", "en", "s"),
    ))
    val got = TextSignals.codeDetect(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("is_code"), "symbol density must flag")
    assert(got(1L).getAs[Long]("n_sym") >= 10L)
    assert(got(2L).getAs[Boolean]("is_code"), "keyword presence must flag")
    assert(got(2L).getAs[Long]("kw_hits") >= 3L)
    assert(got(3L).getAs[Boolean]("is_code"), "identifier tokens must flag")
    assert(got(3L).getAs[Long]("n_ident") == 3L)
    assert(!got(4L).getAs[Boolean]("is_code"), "plain prose must pass")
  }

  // ---- q_readability -------------------------------------------------

  test("readability: hand-computed Flesch on a two-sentence doc; sentence floor guards punctuation-free text") {
    val dir = writeDocs(Seq(
      (1L, "the cat sat. the dog ran!", "en", "s"),
      (2L, "word salad with no terminal punctuation at all", "en", "s"),
    ))
    val got = TextSignals.readability(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L)
    // "the cat sat. the dog ran!": 6 word tokens (split keeps
    // punctuation attached), vowel runs: e,a,a,e,o,a = 6, sentences 2
    assert(r1.getAs[Long]("n_words") == 6L)
    assert(r1.getAs[Long]("n_syllables") == 6L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    val flesch = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(math.abs(r1.getAs[Double]("flesch") - flesch) < 1e-6)
    assert(r1.getAs[String]("band") == "very_easy")
    assert(got(2L).getAs[Long]("n_sentences") == 1L, "floor at one sentence")
  }

  // ---- q_lang_mix ----------------------------------------------------

  test("langMix: a doc flipping en->es mid-text flags mixed; a pure doc does not") {
    // window = 25 tokens: first 25 english-markered, next 25 spanish-markered
    val en = Seq.fill(5)("the cat of and to").mkString(" ")    // 25 toks, en markers
    val es = Seq.fill(5)("el la de que y").mkString(" ")        // 25 toks, es markers
    val dir = writeDocs(Seq(
      (1L, s"$en $es", "en", "s"),
      (2L, s"$en $en", "en", "s"),
    ))
    val got = TextSignals.langMix(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val mixed = got(1L)
    assert(mixed.getAs[Long]("n_windows") == 2L)
    assert(mixed.getAs[Long]("n_mixed") == 1L, "exactly the spanish window disagrees")
    assert(mixed.getAs[Boolean]("is_mixed"))
    val pure = got(2L)
    assert(pure.getAs[Long]("n_mixed") == 0L)
    assert(!pure.getAs[Boolean]("is_mixed"))
  }

  test("langMix: single-window docs never flag (no self-disagreement)") {
    val dir = writeDocs(Seq((1L, "el la de que y", "es", "s")))
    val r = TextSignals.langMix(spark, dir).collect().head
    assert(r.getAs[Long]("n_windows") == 1L)
    assert(!r.getAs[Boolean]("is_mixed"))
  }

  // ---- q_dup_cluster_sizes -------------------------------------------

  test("dupQuality: planted dup trio is counted dup in its decile, singles are not; ppm exact") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val singles = (10L to 15L).map(i =>
      (i, s"unique document number $i with its own distinct words entirely here", "en", "s"))
    val dir = writeDocs(Seq(
      (1L, dup, "en", "s"), (2L, dup, "en", "s"), (3L, dup, "en", "s")) ++ singles)
    val rows = Dedup.dupQuality(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"), r.getAs[Long]("dup_ppm")))
    assert(rows.map(_._1).sum == 9L, s"deciles must partition the corpus: ${rows.toSeq}")
    assert(rows.map(_._2).sum == 3L, s"exactly the planted trio is dup: ${rows.toSeq}")
    rows.foreach { case (n, d, ppm) =>
      assert(ppm == 1000000L * d / n, s"ppm must be the exact integer share: ${rows.toSeq}")
    }
  }

  test("dupClusterSizes: histogram over planted clusters of size 3 and 2, ppm exact") {
    // near-dup requires high shingle Jaccard: identical texts guarantee it
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val dup2 = "one two three four five six seven eight nine ten " * 3
    val dir = writeDocs(Seq(
      (1L, dup, "en", "s"), (2L, dup, "en", "s"), (3L, dup, "en", "s"),
      (4L, dup2, "en", "s"), (5L, dup2, "en", "s"),
      (6L, "totally unrelated text with its own words entirely here now", "en", "s"),
    ))
    val got = Dedup.dupClusterSizes(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("docs_ppm"))).toSet
    assert(got == Set(
      (3L, 1L, 3L, 500000L),  // 3 of 6 docs
      (2L, 1L, 2L, 333333L),  // 2 of 6 docs
    ), s"unexpected histogram $got")
  }
}
