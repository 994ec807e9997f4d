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

  test("a pair emits the trigger the later copy arrives; bucket cap counts overflow") {
    // planted: x and y agree on all 7 landmarks (identical fp)
    val fp = (0 until 7).map(w => (w * 64L + w * 8L + w + 1L) << (9 * w)).sum
    def rowsOf(id: Long) = (0 until 7).map(w =>
      LandmarkRow(w, (fp >> (9 * w)) % 512, id, fp))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[LandmarkRow]
    val q = AudioState(mem.toDS(), cap = 2).writeStream
      .format("memory").queryName("audio_live").outputMode("append").start()
    try {
      mem.addData(rowsOf(1L): _*)
      q.processAllAvailable()
      assert(spark.table("audio_live").count() == 0, "no pair before the later copy")
      mem.addData(rowsOf(2L): _*)
      q.processAllAvailable()
      val got = spark.table("audio_live").as[AudioPair].collect().toSet
      assert(got == Set(AudioPair(1L, 2L, 7L)),
        s"the pair must emit once per shared bucket, DISTINCT to one: $got")
      // a third identical track overflows the cap-2 buckets but still
      // pairs with both held members before being dropped
      mem.addData(rowsOf(3L): _*)
      q.processAllAvailable()
      val after = spark.table("audio_live").as[AudioPair].collect().toSet
      assert(after == Set(AudioPair(1L, 2L, 7L), AudioPair(1L, 3L, 7L), AudioPair(2L, 3L, 7L)),
        s"got $after")
    } finally q.stop()
  }
}
