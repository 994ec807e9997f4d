package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The media feature lane on MULTILINGUAL text: the payload is the
  * document's UTF-8 bytes, so every feature (n_bytes, rolling
  * checksum, head_byte, mean_luma) is a byte-sequence fold — and the
  * DuckDB oracle (`Multimodal.multimodalFeaturesSql`) expands each
  * codepoint to its 1-4 UTF-8 bytes to fold the identical sequence.
  * Expected values below are hand-computed byte folds (independently
  * derived, not via the code under test); the same five fixtures were
  * validated against DuckDB directly when the oracle dropped its
  * ASCII-only form. A regression to codepoint or UTF-16 folding on
  * either side breaks these rows.
  */
class MultimodalFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("features fold UTF-8 bytes on 1/2/3/4-byte characters") {
    val dir = java.nio.file.Files.createTempDirectory("mmfeat").toString
    val texts = Seq(
      (0L, "hello"), // pure ASCII: 1-byte chars
      (1L, "héllo wörld"), // 2-byte é/ö
      (2L, "日本語テキスト"), // 3-byte CJK, doc_id % 3 == 2 → video
      (3L, "emoji 🎉 mix é 中"), // 4-byte 🎉 + 2-byte + 3-byte
      (4L, ""), // empty payload
    )
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("xx").as("lang"),
        lit("s").as("source"), length(col("text")).cast("int").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Multimodal.multimodalFeatures(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getDouble(6))).toSet

    // (asset_id, media_type, n_bytes, checksum, head_byte, frame_count,
    //  mean_luma): checksum = fold (acc*131 + byte) % 1e9+7 over UTF-8
    // bytes; luma = mean byte value; frame_count = (n_chars*25)//40 for
    // video. 'hello' = 5 bytes; 'héllo wörld' = 13 (two 2-byte chars);
    // the CJK string = 21 (7 × 3); the emoji mix = 21 (10 ASCII + 4 +
    // 2 + 3 + spaces).
    val want = Set(
      (0L, "image", 5L, 856916412L, 104, 1, 106.4),
      (1L, "audio", 13L, 107210249L, 104, 1, 126.538462),
      (2L, "video", 21L, 533430084L, 230, 4, 177.238095),
      (3L, "image", 21L, 352686341L, 101, 1, 124.809524),
      (4L, "audio", 0L, 0L, -1, 1, 0.0),
    )
    assert(got == want,
      s"byte-fold mismatch:\nonly-got=${got -- want}\nonly-want=${want -- got}")
  }
}
