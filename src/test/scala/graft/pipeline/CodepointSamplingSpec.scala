package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codepoint-stable sampling contract of the audio and image
  * stand-in decoders (round 13 — replaces the ASCII-only byte-valued
  * `ascii()` / codepoint-valued `unicode()` pair): each sample is the
  * Unicode CODEPOINT of the character at the sample position,
  * decoded on the engine side from the character's UTF-8 bytes
  * ([[Dedup.sampleCodepointExprSql]]). Both engines substr by
  * codepoint and DuckDB's `unicode()` is the codepoint, so engine and
  * oracle agree on ANY text. These specs prove the engine side
  * against HAND-COMPUTED values on multilingual documents — 1-, 2-,
  * 3-, and 4-byte UTF-8 (the astral case is a surrogate PAIR in the
  * JVM, so codepoint indexing must not split it) — including a pair
  * of characters sharing their first UTF-8 byte, where the old
  * byte-valued `ascii()` collided.
  */
class CodepointSamplingSpec extends SparkSpec {
  import spark.implicits._

  /** Codepoint-indexed single codepoint value (1-based). */
  private def cpAt(t: String, pos1: Int): Long = {
    val cps = t.codePoints().toArray
    cps(pos1 - 1).toLong
  }

  private def cpLen(t: String): Int = t.codePoints().toArray.length

  private def samples(t: String, n: Int): Seq[Long] =
    (0 until n).map(j => cpAt(t, 1 + (j * (cpLen(t) - 1)) / n))

  // multilingual track: CJK, accented latin, cyrillic, an astral-plane
  // emoji (4-byte UTF-8, surrogate pair in the JVM), arabic — long
  // enough that all 64 sample positions land inside
  private val multilingual =
    "中文の資料 — héllo wörld, привет мир, 🌍 données d'entraînement, " +
      "نماذج لغوية كبيرة تتطلب بيانات متعددة اللغات من كل مكان. " +
      "大規模言語モデルは多言語データを必要とします。"

  test("audio landmarks on a multilingual track equal the hand computation") {
    val t = multilingual
    val smp = samples(t, 64)
    val pk = (0 until 8).map { w =>
      val win = smp.slice(w * 8, w * 8 + 8)
      win.indexOf(win.max)
    }
    val expected = (0 to 6).map(w => (w * 64 + pk(w) * 8 + pk(w + 1)).toLong)
    val got = Audio.landmarksOf(Seq((1L, t)).toDF("doc_id", "text"))
      .select(col("lms")).collect().head.getSeq[Long](0)
    assert(got == expected, s"got $got, expected $expected")
  }

  test("phash code on a multilingual document equals the hand computation") {
    val t = multilingual
    val pix = samples(t, 32)
    val psum = pix.sum
    val expected = (0 until 32)
      .map(j => if (pix(j) * 32 > psum) 1L << j else 0L).sum
    val got = Multimodal.phashCodesOf(Seq((1L, t)).toDF("doc_id", "text"))
      .select(col("phash")).collect().head.getLong(0)
    assert(got == expected, s"got $got, expected $expected")
  }

  test("the engine decodes 1/2/3/4-byte UTF-8 to the exact codepoint") {
    // one constant track per width: every sample is that codepoint, so
    // the landmark vector pins the decoded VALUE only through peaks —
    // instead pin the value directly through a planted peak: a track
    // of 'a' with the probe character at sample slot 35 (window 4,
    // position 3) peaks there iff codepoint(probe) > codepoint('a')
    for (probe <- Seq("z", "é", "中", new String(Character.toChars(0x1F30D)))) {
      val t = "a" * 35 + probe + "a" * 29 // 65 codepoints: slot j = codepoint j
      assert(cpLen(t) == 65)
      val lms = Audio.landmarksOf(Seq((1L, t)).toDF("doc_id", "text"))
        .select(col("lms")).collect().head.getSeq[Long](0)
      // window 4's peak at position 3; windows 3 and 4's landmarks move
      val pk = (0 until 8).map(w => if (w == 4) 3 else 0)
      val expected = (0 to 6).map(w => (w * 64 + pk(w) * 8 + pk(w + 1)).toLong)
      assert(lms == expected, s"probe '$probe': got $lms, expected $expected")
    }
  }

  test("characters sharing a first UTF-8 byte sample differently (the ascii() collision)") {
    // 'é' (U+00E9: C3 A9) and 'è' (U+00E8: C3 A8) share first byte
    // 0xC3 — byte-valued ascii() sampled them identically; codepoints
    // differ (233 vs 232)
    val a = "é" * 65
    val b = "è" * 65
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val smp = Audio.landmarksOf(df)
      .select(col("asset_id"), col("lms")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // length-65 tracks sample codepoint j at sample slot j; plant the
    // deviation at slot 35 = window 4, position 3. codepoint('é') >
    // codepoint('è'), so the deviation is a PIT on the 'é' background
    // (peak layout unchanged — lms equal the constant track's) but a
    // PEAK on the 'è' background (pk(4) moves 0 → 3, landmarks 3 and 4
    // change) — a divergence byte sampling (0xC3 == 0xC3) can't see
    val aDev = "é" * 35 + "è" + "é" * 29
    val bDev = "è" * 35 + "é" + "è" * 29
    val fps = Audio.landmarksOf(Seq((3L, aDev), (4L, bDev)).toDF("doc_id", "text"))
      .select(col("asset_id"), col("lms")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(smp(1L) == smp(2L), "constant tracks share the trivial peak layout")
    assert(fps(3L) == smp(1L), "a pit deviation leaves the peak layout alone")
    assert(fps(4L) != smp(2L),
      s"a peak deviation must move landmarks 3 and 4: $fps vs ${smp(2L)}")
  }
}
