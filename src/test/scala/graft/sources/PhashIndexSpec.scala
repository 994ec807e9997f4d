package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted phash index: (a) cross-snapshot image verdicts
  * computed index-against-index match the directly-computed
  * (unbucketed) band join row for row, (b) the band join between two
  * identically-bucketed indexes plans ZERO shuffle exchanges, and (c)
  * the stream-static ingest gate flags a re-crawled asset on arrival.
  * Identical-code collapse is part of the layout: each index row is a
  * representative + multiplicity.
  */
class PhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sameText = (1 to 80).map(i => ('a' + (i % 17)).toChar).mkString(" ")
  private val otherText = (1 to 80).map(i => if (i % 3 == 0) "zz" else "a").mkString(" ")
  private val novelText = (1 to 80).map(i => if (i % 2 == 0) "qq" else "r$i").mkString(" ")

  test("cross-snapshot image sweep: multiplicity-carrying verdicts; band join exchange-free") {
    // snapshot A: three identical assets (one code group, rep = 2) and
    // a distinct payload; snapshot B: two re-crawled copies of the
    // identical payload (rep = 101, multiplicity 2) and a novel asset
    val snapA = Seq((2L, sameText, "s"), (4L, sameText, "s"), (6L, sameText, "s"),
      (8L, otherText, "s")).toDF("doc_id", "text", "source")
    val snapB = Seq((101L, sameText, "s"), (103L, sameText, "s"),
      (105L, novelText, "s")).toDF("doc_id", "text", "source")
    PhashIndex.write(snapA, "phash_idx_a")
    PhashIndex.write(snapB, "phash_idx_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = PhashIndex.crossSnapshotMatches(spark, "phash_idx_a", "phash_idx_b")
      val plan = out.queryExecution.executedPlan
      val expanded = plan +: plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      val bandExchanges = expanded.flatMap(_.collect {
        case e: ShuffleExchangeExec if e.child.output.exists(_.name == "bv") => e
      })
      assert(bandExchanges.isEmpty,
        s"the index-to-index band join must be exchange-free, found:\n$plan")
      val got = out.collect().map(r => (r.getAs[Long]("rep"), r.getAs[Long]("n_matches"),
        r.getAs[Long]("dup_of"), r.getAs[Int]("best_hamming"), r.getAs[Long]("n_copies")))
      // only the re-crawled group matches (the novel asset may
      // coincidentally band-collide but never within the radius of a
      // distinct planted payload at Hamming > 2 — assert it resolved)
      val m = got.filter(_._1 == 101L)
      assert(m.length == 1, s"the re-crawl representative must report once: ${got.toSeq}")
      assert(m.head == ((101L, 1L, 2L, 0, 2L)),
        s"re-crawl must resolve to A's representative at Hamming 0 covering 2 copies: ${m.head}")
      // and the index-against-index result equals the direct unbucketed
      // band join over the same snapshots
      import graft.pipeline.Multimodal
      def repsOf(df: org.apache.spark.sql.DataFrame) =
        Multimodal.phashCodesOf(df).groupBy(col("phash"))
          .agg(min(col("asset_id")).as("rep"), count(lit(1)).as("n_members"))
      val directPairs = Multimodal.phashBandRows(
          repsOf(snapB).select(col("rep").as("asset_id"), col("phash"))).as("b")
        .join(Multimodal.phashBandRows(
          repsOf(snapA).select(col("rep").as("asset_id"), col("phash"))).as("a"),
          Seq("band", "bv"))
        .select(col("b.asset_id").as("rep"), col("a.asset_id").as("corpus_rep"),
          bit_count(col("b.phash").bitwiseXOR(col("a.phash"))).cast("int").as("h"))
        .filter(col("h") <= Multimodal.PhashRadius).distinct()
        .groupBy(col("rep")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getAs[Long]("rep"), r.getAs[Long]("n"))).toSet
      assert(directPairs == got.map(g => (g._1, g._2)).toSet,
        s"bucketed and unbucketed computations diverged: $directPairs vs ${got.toSeq}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS phash_idx_a")
      spark.sql("DROP TABLE IF EXISTS phash_idx_b")
    }
  }

  test("streaming ingest gate against the persisted image index flags the re-crawl") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val estate = Seq((2L, sameText, "s"), (8L, otherText, "s"))
      .toDF("doc_id", "text", "source")
    PhashIndex.write(estate, "phash_idx_live")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val gate = PhashIndex.ingestStream(
        mem.toDF().toDF("doc_id", "text"), "phash_idx_live")
      val q = gate.writeStream.format("memory").queryName("phash_gate")
        .outputMode("append").start()
      try {
        mem.addData((201L, sameText))
        mem.addData((202L, novelText))
        q.processAllAvailable()
        val flagged = spark.table("phash_gate").collect()
          .map(r => (r.getAs[Long]("asset_id"), r.getAs[Long]("corpus_rep"),
            r.getAs[Int]("hamming"))).distinct
        assert(flagged.toSet == Set((201L, 2L, 0)),
          s"only the identical re-crawl must flag, against its representative: ${flagged.toSeq}")
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS phash_idx_live")
  }
}
