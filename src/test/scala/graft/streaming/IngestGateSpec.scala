package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.SignatureIndex

/** The streaming keep-list ingest gate: verdicts at ingest equal the
  * batch run of the same gate on the same documents (the DriftState
  * parity contract — any trigger split), and each planted document
  * lands on exactly the rule the batch curate ordering would assign:
  * too_short → too_repetitive → blocklisted → exact_dup → near_dup →
  * keep.
  */
class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"w$i")
  private def corpusDf = Seq(
    (1L, base.mkString(" "), "s"),
    (2L, (1 to 40).map(i => s"x$i").mkString(" "), "s"),
  ).toDF("doc_id", "text", "source")

  // one incoming doc per verdict class
  private val incoming = Seq(
    901L -> "tiny doc too short",                                // too_short
    902L -> Seq.fill(40)("rep").mkString(" "),                   // too_repetitive
    903L -> ((1 to 20).map(i => s"ok$i") ++ Seq.fill(4)("error")).mkString(" "), // blocklisted
    904L -> base.mkString(" "),                                  // exact_dup of corpus doc 1
    905L -> base.updated(39, "edited").mkString(" "),            // near_dup of corpus doc 1
    906L -> (1 to 40).map(i => s"novel$i").mkString(" "),        // keep
  )

  test("stream == batch across trigger splits; each planted doc hits its rule") {
    SignatureIndex.write(corpusDf, "gate_idx")
    try {
      val batch = IngestGate.verdicts(
        incoming.toDF("doc_id", "text"), corpusDf, "gate_idx")
        .collect().map(v => (v.doc_id, v.verdict, v.dup_of, v.est_jaccard)).toSet

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val gate = IngestGate.verdicts(
        mem.toDF().toDF("doc_id", "text"), corpusDf, "gate_idx")
      val q = gate.toDF().writeStream.format("memory").queryName("ingest_gate_v")
        .outputMode("update").start()
      try {
        // arbitrary trigger split: 2 + 3 + 1
        mem.addData(incoming.take(2))
        q.processAllAvailable()
        mem.addData(incoming.slice(2, 5))
        mem.addData(incoming.drop(5))
        q.processAllAvailable()
        val streamed = spark.table("ingest_gate_v").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
            r.getAs[java.lang.Long]("dup_of"), r.getAs[java.lang.Double]("est_jaccard")))
          .toSet
        assert(streamed == batch,
          s"stream and batch gate verdicts diverged:\nonly-stream=${streamed -- batch}\n" +
            s"only-batch=${batch -- streamed}")
      } finally q.stop()

      // rule attribution, first-failure-wins
      val byDoc = batch.map(v => v._1 -> ((v._2, v._3, v._4))).toMap
      assert(byDoc(901L)._1 == "too_short")
      assert(byDoc(902L)._1 == "too_repetitive")
      assert(byDoc(903L)._1 == "blocklisted")
      assert(byDoc(904L) == (("exact_dup", 1L: java.lang.Long, 1.0: java.lang.Double)))
      assert(byDoc(905L)._1 == "near_dup" && byDoc(905L)._2 == (1L: java.lang.Long) &&
        byDoc(905L)._3 >= 0.5, s"edited re-crawl must gate as near_dup of doc 1: ${byDoc(905L)}")
      assert(byDoc(906L) == (("keep", null, null)))
      assert(batch.size == incoming.size, "exactly one verdict row per incoming doc")
    } finally spark.sql("DROP TABLE IF EXISTS gate_idx")
  }
}
