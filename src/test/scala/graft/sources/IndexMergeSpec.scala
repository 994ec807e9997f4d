package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Index COMPACTION: merging snapshot indexes must be bit-identical to
  * writing the estate index from the union of the snapshots' inputs —
  * for all three persisted families — and the merged table must remain
  * a first-class bucketed index (its consumers plan exchange-free
  * joins, the SignatureIndexSpec contract).
  */
class IndexMergeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def dropAll(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

  test("signature merge == whole-corpus write; merged index joins exchange-free") {
    val docs = (1L to 40L).map { i =>
      val text = if (i % 4 == 0) (1 to 60).map(j => s"w${(i + j) % 9}").mkString(" ")
      else (1 to 60).map(j => s"t${(i * 7 + j) % 23}").mkString(" ")
      (i, text, "s")
    }.toDF("doc_id", "text", "source")
    SignatureIndex.write(docs.filter(col("doc_id") % 2 === 0), "ims_sig_a")
    SignatureIndex.write(docs.filter(col("doc_id") % 2 === 1), "ims_sig_b")
    SignatureIndex.write(docs, "ims_sig_full")
    SignatureIndex.merge(spark, Seq("ims_sig_a", "ims_sig_b"), "ims_sig_merged")
    try {
      assert(rows(spark.table("ims_sig_merged")) == rows(spark.table("ims_sig_full")),
        "merged signature index must equal the whole-corpus write row for row")
      // the merged table is still a bucketed index: a cross-snapshot
      // sweep against another bucketed table plans no band exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val sweep = SignatureIndex.crossSnapshotMatches(spark, "ims_sig_merged", "ims_sig_b")
        val plan = sweep.queryExecution.executedPlan
        val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        val bandExchanges = expanded.flatMap(_.collect {
          case e: ShuffleExchangeExec if e.child.output.exists(_.name == "bh") => e
        })
        assert(bandExchanges.isEmpty,
          s"sweeping against the merged index must stay exchange-free:\n$plan")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally dropAll("ims_sig_a", "ims_sig_b", "ims_sig_full", "ims_sig_merged")
  }

  test("signature removal == whole-corpus write of the survivors; anti join exchange-free") {
    val docs = (1L to 30L).map { i =>
      (i, (1 to 60).map(j => s"t${(i * 5 + j) % 19}").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    SignatureIndex.write(docs.filter(col("doc_id") % 2 === 0), "ims_ret_a")
    SignatureIndex.write(docs.filter(col("doc_id") % 2 === 1), "ims_ret_b")
    SignatureIndex.merge(spark, Seq("ims_ret_a", "ims_ret_b"), "ims_ret_est")
    try {
      // plan shape first: the anti join between the two bucketed tables
      // must carry no exchange on either side (under the same
      // subset-co-partition setting removeSnapshot scopes internally)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      try {
        val anti = spark.table("ims_ret_est")
          .join(spark.table("ims_ret_b").select(col("band"), col("bh"), col("doc_id")),
            Seq("band", "bh", "doc_id"), "left_anti")
        val plan = anti.queryExecution.executedPlan
        val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        val ex = expanded.flatMap(_.collect { case e: ShuffleExchangeExec => e })
        assert(ex.isEmpty, s"retention anti join must plan no exchange:\n$plan")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      }
      SignatureIndex.removeSnapshot(spark, "ims_ret_est", "ims_ret_b", "ims_ret_out")
      assert(rows(spark.table("ims_ret_out")) == rows(spark.table("ims_ret_a")),
        "estate minus snapshot B must equal snapshot A's index row for row")
    } finally dropAll("ims_ret_a", "ims_ret_b", "ims_ret_est", "ims_ret_out")
  }

  test("embed removal re-ranks survivors exactly (no re-assignment, closed rank gaps)") {
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 50L).map { i =>
      val base = if (i % 3 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (i, base.map(_ + rnd.nextFloat() * 0.3f))
    }.toDF("vec_id", "embedding")
    val centers: IndexedSeq[Array[Double]] =
      IndexedSeq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    EmbedIndex.write(vecs.filter(col("vec_id") % 2 === 0), "ims_ret_ea", centers)
    EmbedIndex.write(vecs.filter(col("vec_id") % 2 === 1), "ims_ret_eb", centers)
    EmbedIndex.merge(spark, Seq("ims_ret_ea", "ims_ret_eb"), "ims_ret_eest")
    EmbedIndex.removeSnapshot(spark, "ims_ret_eest", "ims_ret_eb", "ims_ret_eout")
    try {
      assert(rows(spark.table("ims_ret_eout")) == rows(spark.table("ims_ret_ea")),
        "estate minus snapshot B must equal snapshot A's index (ranks re-closed)")
      // plan shape: the anti join AND the gap-closing re-rank window
      // both ride the stored cell bucketing — zero exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      try {
        import org.apache.spark.sql.expressions.Window
        val kept = spark.table("ims_ret_eest")
          .join(spark.table("ims_ret_eb").select(col("cell"), col("vec_id")),
            Seq("cell", "vec_id"), "left_anti")
        val w = Window.partitionBy(col("cell")).orderBy(col("d2").asc, col("vec_id").asc)
        val ranked = kept.withColumn("rk2", org.apache.spark.sql.functions.row_number().over(w))
        val plan = ranked.queryExecution.executedPlan
        val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        val ex = expanded.flatMap(_.collect { case e: ShuffleExchangeExec => e })
        assert(ex.isEmpty, s"embed retention must plan no exchange:\n$plan")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      }
    } finally dropAll("ims_ret_ea", "ims_ret_eb", "ims_ret_eest", "ims_ret_eout")
  }

  test("sweep bucket cap: pairs reachable only through a saturated band pattern are dropped") {
    import graft.pipeline.Multimodal
    // 20 DISTINCT codes per side sharing band-0 value 5 and band-2
    // value 0 (two saturated patterns); each B code is its A twin with
    // bit 16 flipped (Hamming 1, inside the radius), and the flip
    // pushes B's band-1 value outside A's band-1 set — so every pair
    // is reachable ONLY through the two hot buckets. A binding cap
    // must drop them all; the production cap (1024) keeps them all.
    val codesA = (1 to 20).map(k => (2L * k, 5L + (k.toLong << 11)))
      .toDF("asset_id", "phash")
    val codesB = (1 to 20).map(k => (2L * k + 1, (5L + (k.toLong << 11)) ^ (1L << 16)))
      .toDF("asset_id", "phash")
    PhashIndex.writeCodes(codesA, "ims_cap_a")
    PhashIndex.writeCodes(codesB, "ims_cap_b")
    try {
      val capped = PhashIndex
        .crossSnapshotPairsCapped(spark, "ims_cap_a", "ims_cap_b", cap = 8).count()
      assert(capped == 0L,
        s"a cap of 8 must drop the 20-rep hot buckets entirely, got $capped pairs")
      // Hamming(A_j, B_k) = popcount(j ^ k) + 1, so the full pair set
      // is every (j, k) with popcount(j ^ k) <= 1 (the k = j twins plus
      // power-of-two neighbors)
      val expected = (for { k <- 1 to 20; j <- 1 to 20
        if java.lang.Integer.bitCount(j ^ k) <= 1 } yield 1).size.toLong
      val uncapped = PhashIndex
        .crossSnapshotPairsCapped(spark, "ims_cap_a", "ims_cap_b",
          cap = Multimodal.PhashBucketCap).count()
      assert(uncapped == expected,
        s"the production cap is non-binding at 20 reps: expected $expected pairs, got $uncapped")
    } finally dropAll("ims_cap_a", "ims_cap_b")
  }

  test("phash merge re-collapses cross-snapshot code groups to the global representative") {
    val sameText = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
    val otherText = (1 to 80).map(i => if (i % 3 == 0) "zz" else "a").mkString(" ")
    // the shared payload appears in BOTH snapshots: snapshot A's
    // representative is 2, B's is 11 — the merged estate must
    // re-collapse to rep 2 with multiplicity 3 + 2 = 5
    val snapA = Seq((2L, sameText), (4L, sameText), (6L, sameText), (8L, otherText))
      .toDF("doc_id", "text")
    val snapB = Seq((11L, sameText), (13L, sameText), (15L, otherText))
      .toDF("doc_id", "text")
    PhashIndex.write(snapA, "ims_ph_a")
    PhashIndex.write(snapB, "ims_ph_b")
    PhashIndex.write(snapA.unionByName(snapB), "ims_ph_full")
    PhashIndex.merge(spark, Seq("ims_ph_a", "ims_ph_b"), "ims_ph_merged")
    try {
      assert(rows(spark.table("ims_ph_merged")) == rows(spark.table("ims_ph_full")),
        "merged phash index must equal the whole-corpus write row for row")
      val shared = spark.table("ims_ph_merged")
        .filter(col("band") === 0 && col("rep") === 2L)
        .select(col("n_members")).collect().map(_.getLong(0))
      assert(shared.toSeq == Seq(5L),
        s"cross-snapshot group must re-collapse to rep 2 with multiplicity 5: ${shared.toSeq}")
    } finally dropAll("ims_ph_a", "ims_ph_b", "ims_ph_full", "ims_ph_merged")
  }

  test("merge tolerates an empty snapshot lane (catalog schema, not file inference)") {
    import graft.pipeline.Multimodal
    val docs = Seq((2L, (1 to 60).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    // lane B matches nothing: its index table has a location with zero
    // parquet files — the raw read must come from the catalog schema
    PhashIndex.write(docs, "ims_empty_a")
    PhashIndex.write(docs.filter(col("doc_id") < 0), "ims_empty_b")
    PhashIndex.merge(spark, Seq("ims_empty_a", "ims_empty_b"), "ims_empty_m")
    try {
      assert(rows(spark.table("ims_empty_m")) == rows(spark.table("ims_empty_a")),
        "merging with an empty lane must equal the non-empty lane")
    } finally dropAll("ims_empty_a", "ims_empty_b", "ims_empty_m")
  }

  test("embed merge re-ranks interleaved cells exactly; no re-assignment needed") {
    val dim = 4
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (i, base.map(_ + rnd.nextFloat() * 0.3f))
    }.toDF("vec_id", "embedding")
    val centers: IndexedSeq[Array[Double]] =
      IndexedSeq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    assert(centers.head.length == dim)
    EmbedIndex.write(vecs.filter(col("vec_id") % 2 === 0), "ims_em_a", centers)
    EmbedIndex.write(vecs.filter(col("vec_id") % 2 === 1), "ims_em_b", centers)
    EmbedIndex.write(vecs, "ims_em_full", centers)
    EmbedIndex.merge(spark, Seq("ims_em_a", "ims_em_b"), "ims_em_merged")
    try {
      assert(rows(spark.table("ims_em_merged")) == rows(spark.table("ims_em_full")),
        "merged embed index must equal the whole-corpus write row for row " +
          "(rank order is a global property of the frozen assignment)")
      // ranks are a dense 1..n per cell after the merge
      val badRanks = spark.table("ims_em_merged")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"), min(col("rk")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1)
        .count()
      assert(badRanks == 0, "merged per-cell ranks must be dense 1..n")
    } finally dropAll("ims_em_a", "ims_em_b", "ims_em_full", "ims_em_merged")
  }
}
