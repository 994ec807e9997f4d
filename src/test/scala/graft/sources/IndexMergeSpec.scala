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

  test("audio merge re-collapses cross-snapshot fingerprint groups; == whole-corpus write") {
    val sameText = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
    val otherText = (1 to 80).map(i => if (i % 3 == 0) "zz" else "a").mkString(" ")
    // the shared track appears in BOTH snapshots: snapshot A's
    // representative is 2, B's is 11 — the merged estate must
    // re-collapse to the global representative 2
    val snapA = Seq((2L, sameText), (4L, sameText), (8L, otherText))
      .toDF("doc_id", "text")
    val snapB = Seq((11L, sameText), (15L, otherText)).toDF("doc_id", "text")
    AudioIndex.write(snapA, "ims_au_a")
    AudioIndex.write(snapB, "ims_au_b")
    AudioIndex.write(snapA.unionByName(snapB), "ims_au_full")
    AudioIndex.merge(spark, Seq("ims_au_a", "ims_au_b"), "ims_au_merged")
    try {
      assert(rows(spark.table("ims_au_merged")) == rows(spark.table("ims_au_full")),
        "merged audio index must equal the whole-corpus write row for row")
      val sharedReps = spark.table("ims_au_merged")
        .filter(col("slot") === 0).select(col("rep"))
        .collect().map(_.getLong(0)).toSet
      assert(sharedReps.contains(2L) && !sharedReps.contains(11L),
        s"cross-snapshot fingerprint group must re-collapse to rep 2: $sharedReps")
    } finally dropAll("ims_au_a", "ims_au_b", "ims_au_full", "ims_au_merged")
  }

  test("audio removal repairs shared fingerprints to the survivor rep; exchange-free") {
    val tShared1 = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
    val tShared2 = (1 to 80).map(i => ('b' + (i % 13)).toChar).mkString(" ")
    val tAOnly = (1 to 80).map(i => if (i % 3 == 0) "zz" else "a").mkString(" ")
    val tBOnly = (1 to 80).map(i => if (i % 4 == 0) "qq" else "b").mkString(" ")
    // shared1: B's rep (3) IS the estate rep — expiry must repair the
    // posting rows back to A's rep 4 (the lossy-anti-join case).
    // shared2: A's rep (6) already the global min — rows pass through.
    val snapA = Seq((4L, tShared1), (6L, tShared2), (2L, tAOnly)).toDF("doc_id", "text")
    val snapB = Seq((3L, tShared1), (9L, tShared2), (7L, tBOnly)).toDF("doc_id", "text")
    AudioIndex.write(snapA, "ims_aur_a")
    AudioIndex.write(snapB, "ims_aur_b")
    AudioIndex.merge(spark, Seq("ims_aur_a", "ims_aur_b"), "ims_aur_est")
    try {
      // plan shape first: the subtract-and-repair pass with a single
      // survivor must carry no exchange anywhere (all joins and the
      // repair semi join ride the stored (slot, lmv) bucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      try {
        val keys = Seq("slot", "lmv", "fp")
        val tomb = spark.table("ims_aur_b")
          .select(col("slot"), col("lmv"), col("fp"), lit(true).as("tomb"))
        val repair = spark.table("ims_aur_a")
          .select(col("slot"), col("lmv"), col("fp"), col("rep").as("srep"))
          .join(spark.table("ims_aur_b").select(col("slot"), col("lmv"), col("fp")),
            keys, "left_semi")
        val retained = spark.table("ims_aur_est")
          .join(tomb, keys, "left")
          .join(repair, keys, "left")
          .filter(col("tomb").isNull || col("srep").isNotNull)
        val plan = retained.queryExecution.executedPlan
        val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        val ex = expanded.flatMap(_.collect { case e: ShuffleExchangeExec => e })
        assert(ex.isEmpty, s"audio retention must plan no exchange:\n$plan")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      }
      AudioIndex.removeSnapshot(spark, "ims_aur_est", "ims_aur_b", Seq("ims_aur_a"),
        "ims_aur_out")
      assert(rows(spark.table("ims_aur_out")) == rows(spark.table("ims_aur_a")),
        "estate minus snapshot B must equal snapshot A's index (shared reps repaired)")
      val reps = spark.table("ims_aur_out").filter(col("slot") === 0)
        .select(col("rep")).collect().map(_.getLong(0)).toSet
      assert(reps == Set(4L, 6L, 2L),
        s"survivor reps must be exactly A's (3 repaired to 4, 7 dropped): $reps")
      // retiring the LAST snapshot: no survivors, no repair — the
      // result is the empty index, not an exception
      AudioIndex.removeSnapshot(spark, "ims_aur_out", "ims_aur_a", Nil, "ims_aur_empty")
      assert(spark.table("ims_aur_empty").count() == 0L,
        "expiring the estate's only snapshot must leave an empty index")
    } finally dropAll("ims_aur_a", "ims_aur_b", "ims_aur_est", "ims_aur_out",
      "ims_aur_empty")
  }

  test("audio cross-snapshot sweep joins exchange-free; cap drops saturated buckets") {
    import graft.pipeline.Audio
    // identical texts across sides -> identical fingerprints -> the
    // sweep must report agreement 7; the plan must carry no landmark
    // exchange on either bucketed side
    val shared = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
    val uniq = (i: Long) => (1 to 80).map(j => s"u${i}x${(i * 7 + j) % 29}").mkString(" ")
    val snapA = (2L to 20L by 2).map(i => (i, if (i <= 4) shared else uniq(i)))
      .toDF("doc_id", "text")
    val snapB = (1L to 19L by 2).map(i => (i, if (i <= 3) shared else uniq(i)))
      .toDF("doc_id", "text")
    AudioIndex.write(snapA, "ims_aus_a")
    AudioIndex.write(snapB, "ims_aus_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val sweep = AudioIndex.crossSnapshotMatches(spark, "ims_aus_a", "ims_aus_b")
        val plan = sweep.queryExecution.executedPlan
        val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
        val lmExchanges = expanded.flatMap(_.collect {
          case e: ShuffleExchangeExec if e.child.output.exists(_.name == "lmv") => e
        })
        assert(lmExchanges.isEmpty,
          s"cross-snapshot audio sweep must plan no landmark exchange:\n$plan")
        // incidental >=4 agreements between "unique" texts are fine
        // (the planted corpus is tiny) — the planted identical pair
        // must be present with full agreement
        val verdicts = sweep.collect()
          .map(r => r.getAs[Long]("rep") ->
            (r.getAs[Long]("dup_of"), r.getAs[Long]("best_agree"))).toMap
        assert(verdicts.get(1L).contains((2L, 7L)),
          s"B's shared-track rep must dup to A's rep at agreement 7: $verdicts")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // a binding cap drops every pair reachable only through the
      // saturated buckets (identical fps share all 7 buckets, so a cap
      // below the bucket population kills the pair)
      val capped = AudioIndex
        .crossSnapshotPairsCapped(spark, "ims_aus_a", "ims_aus_b", cap = 0L).count()
      assert(capped == 0L, s"cap 0 must drop all buckets, got $capped pairs")
      val uncapped = AudioIndex
        .crossSnapshotPairsCapped(spark, "ims_aus_a", "ims_aus_b",
          cap = Audio.AudioBucketCap.toLong).count()
      assert(uncapped >= 1L, "the production cap is non-binding on the planted corpus")
    } finally dropAll("ims_aus_a", "ims_aus_b")
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
