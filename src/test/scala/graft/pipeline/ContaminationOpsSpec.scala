package graft.pipeline

import graft.SparkSpec

/** Round-8 operators: fuzzy (MinHash) decontamination, the reverse
  * eval-overlap report, and DSIR importance resampling. The driver
  * oracle proves cross-engine parity; these pin the semantics on
  * hand-built fixtures where the expected values are computable by
  * hand (gram counts, the acceptance rule, the eval-gate hash).
  */
class ContaminationOpsSpec extends SparkSpec {
  import spark.implicits._

  // -- the eval-holdout gate, reimplemented independently of the engine
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def normMd5(t: String): String =
    md5hex(t.trim.toLowerCase.replaceAll(" +", " "))
  private def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
  private def isEval(t: String): Boolean = h32("eval|" + normMd5(t)) % 25 == 0

  // Fixture: one eval doc (salt-searched into the 1-in-25 gate), one
  // near-duplicate of it on the training side (ONE word changed at
  // 0-based index 30 of 60), one unrelated clean training doc.
  private val baseWords = (1 until 60).map(i => s"w$i")
  private val evalText =
    Iterator.from(0).map(k => (s"s$k" +: baseWords).mkString(" ")).find(isEval).get
  private val nearDupText = {
    val toks = evalText.split(" ")
    Iterator.from(0).map { k =>
      val a = toks.clone(); a(30) = s"z$k"; a.mkString(" ")
    }.find(t => !isEval(t)).get
  }
  private val cleanText =
    Iterator.from(0).map(k => (s"c$k" +: (1 until 60).map(i => s"c$i")).mkString(" "))
      .find(t => !isEval(t)).get

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("contam").toString
    Seq((0L, evalText, "src0"), (1L, nearDupText, "src0"), (2L, cleanText, "src9"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("fixture is what the operators assume") {
    assert(isEval(evalText) && !isEval(nearDupText) && !isEval(cleanText))
    assert(evalText.split(" ").length == 60)
    assert(evalText.split(" ").zip(nearDupText.split(" ")).count { case (a, b) => a != b } == 1)
  }

  test("decontaminate_fuzzy flags the near-duplicate of an eval doc and clears the clean doc") {
    val rows = Sampling.decontaminateFuzzy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // output covers exactly the training side
    assert(rows.keySet == Set(1L, 2L))
    val near = rows(1L)
    assert(near.getAs[Int]("contaminated") == 1)
    assert(near.getAs[Long]("n_eval_matches") == 1L)
    // 45 of 53 shingles survive the single-word edit -> true J = 45/61
    // ~ 0.74; the 16-perm estimate must clear the 0.5 gate
    assert(near.getAs[Double]("max_est_jaccard") >= 0.5)
    val clean = rows(2L)
    assert(clean.getAs[Int]("contaminated") == 0)
    assert(clean.getAs[Long]("n_eval_matches") == 0L)
    assert(clean.getAs[Double]("max_est_jaccard") == 0.0)
    spark.catalog.clearCache()
  }

  test("eval_overlap_report counts exactly the grams the edit preserved") {
    val rows = Sampling.evalOverlapReport(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("eval_doc")).toSeq == Seq(0L))
    val r = rows.head
    // 60 distinct tokens -> 53 distinct 8-gram shingles; the changed
    // word at index 30 sits in the 8 windows starting at 23..30, so
    // 45 grams survive on the near-dup and only it hits them
    assert(r.getAs[Long]("n_grams") == 53L)
    assert(r.getAs[Long]("n_grams_hit") == 45L)
    assert(r.getAs[Long]("n_train_docs") == 1L)
    assert(r.getAs[Double]("compromised_frac") ==
      BigDecimal(45.0 / 53.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("importance_resample applies the documented deterministic acceptance rule") {
    val out = Importance.importanceResample(spark, dir).collect()
    assert(out.length == 3)
    val wmax = out.map(_.getAs[Double]("dsir_weight")).max
    out.foreach { r =>
      val u = r.getAs[Double]("u")
      // u is the documented md5-derived uniform, exactly
      assert(u == h32("rs|" + r.getAs[Long]("doc_id")).toDouble / 4294967296.0)
      assert(u >= 0.0 && u < 1.0)
      assert(r.getAs[Boolean]("kept") == (u * wmax < r.getAs[Double]("dsir_weight")))
    }
    // the argmax-weight doc is kept with probability 1 (u < 1 always)
    assert(out.filter(_.getAs[Double]("dsir_weight") == wmax)
      .forall(_.getAs[Boolean]("kept")))
  }
}
