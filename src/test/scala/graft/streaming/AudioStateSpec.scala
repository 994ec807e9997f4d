package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.AudioState.{AudioPair, LandmarkRow}

/** AudioState semantics: the streamed pair set over any trigger split
  * equals the batch `q_audio_dup_pairs` pair set on the same corpus
  * (caps non-binding), and a pair emits exactly when the LATER copy
  * arrives — the ingest-time property the twin exists for.
  */
class AudioStateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed pairs over three triggers == batch q_audio_dup_pairs") {
    val rows = AudioState.landmarkRows(
        graft.queries.Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .collect().sortBy(_.assetId).toIndexedSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[LandmarkRow]
    val q = AudioState(mem.toDS()).writeStream
      .format("memory").queryName("audio_pairs").outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("audio_pairs").as[AudioPair].collect()
        .map(p => (p.a, p.b, p.n_agree)).toSet
      val batch = graft.pipeline.Audio.audioDupPairs(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"streamed != batch:\nonly-stream=${streamed -- batch}\nonly-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("a pair emits the trigger the later copy arrives; identical burst never saturates") {
    // planted: the base track's 7 landmarks; a near-miss fp differing
    // in window 4's peak (landmarks 3 and 4 move -> agreement 5)
    def packed(q: Seq[Int]): Long = (0 until 7)
      .map(w => (w * 64L + q(w) * 8L + q(w + 1)) << (9 * w)).sum
    val fp = packed(0 to 7)
    val near = packed(Seq(0, 1, 2, 3, 0, 5, 6, 7))
    def rowsOf(id: Long, f: Long) = (0 until 7).map(w =>
      LandmarkRow(w, (f >> (9 * w)) % 512, id, f))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[LandmarkRow]
    val q = AudioState(mem.toDS(), cap = 2).writeStream
      .format("memory").queryName("audio_live").outputMode("append").start()
    try {
      mem.addData(rowsOf(1L, fp): _*)
      q.processAllAvailable()
      assert(spark.table("audio_live").count() == 0, "no pair before the later copy")
      mem.addData(rowsOf(2L, fp): _*)
      q.processAllAvailable()
      val got = spark.table("audio_live").as[AudioPair].collect().toSet
      assert(got == Set(AudioPair(1L, 2L, 7L)),
        s"the pair must emit once per shared bucket, DISTINCT to one: $got")
      // a third and fourth identical track: ONE distinct fingerprint,
      // so the cap-2 buckets are NOT saturated (the batch cap counts
      // distinct fps) — the whole intra-burst pair set emits
      mem.addData(rowsOf(3L, fp): _*)
      mem.addData(rowsOf(4L, fp): _*)
      q.processAllAvailable()
      val after = spark.table("audio_live").as[AudioPair].collect().toSet
      val intra = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield AudioPair(a, b, 7L)).toSet
      assert(after == intra, s"got $after")
      // a distinct near-miss fp arrives AFTER the burst: the second
      // group slot is free (batch: 2 distinct fps <= cap), so it must
      // match EVERY burst member — the verdict the old member-counting
      // cap silently lost
      mem.addData(rowsOf(9L, near): _*)
      q.processAllAvailable()
      val fin = spark.table("audio_live").as[AudioPair].collect().toSet
      assert(fin == intra ++ (1L to 4L).map(i => AudioPair(i, 9L, 5L)),
        s"got $fin")
    } finally q.stop()
  }
}
