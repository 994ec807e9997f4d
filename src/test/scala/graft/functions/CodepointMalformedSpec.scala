package graft.functions

import graft.SparkSpec

/** Malformed-UTF-8 contract of `graft_codepoint` vs the RETIRED
  * round-13 SQL chain (kept here verbatim as the executable
  * reference). Parquet does not validate string bytes, so the sampler
  * can meet invalid sequences; inputs are injected via
  * `CAST(unhex(...) AS STRING)`, which wraps raw bytes WITHOUT
  * validation.
  *
  * Two regimes:
  *  - every malformed shape whose old behavior was WELL-DEFINED
  *    (invalid continuation, overlong, surrogate range, beyond
  *    U+10FFFF, legacy 5-byte lead, lone continuation) must match the
  *    old chain bit for bit;
  *  - a multi-byte lead TRUNCATED at the end of the string is the one
  *    documented divergence: there the old chain's `substr` byte-walk
  *    overstepped `numBytes` and read ADJACENT MEMORY (observably a
  *    0x00 with heap-backed test literals — the old value below
  *    decodes `EFBFBD00`, replacement char + a byte that is not part
  *    of the string). The native expression clamps instead; this spec
  *    pins both that the clamped value is the replacement-char decode
  *    AND that the old chain really produced the out-of-bounds shape
  *    (so if a Spark upgrade fixes substring's overstep, this spec
  *    says the divergence is gone and the doc can be retired).
  */
class CodepointMalformedSpec extends SparkSpec {

  /** The retired round-13 chain, verbatim (Dedup.sampleCodepointExprSql
    * before the native expression), parameterized on a column name.
    */
  private def oldChainSql(textCol: String, pos: String): String = {
    def b(i: Int) = s"CAST(conv(substring(hx, ${2 * i + 1}, 2), 16, 10) AS BIGINT)"
    s"""aggregate(array(hex(encode(substr($textCol, $pos, 1), 'utf-8'))),
         CAST(0 AS BIGINT),
         (zcp, hx) -> zcp + CASE length(hx)
           WHEN 2 THEN ${b(0)}
           WHEN 4 THEN (${b(0)} % 32) * 64 + ${b(1)} % 64
           WHEN 6 THEN (${b(0)} % 16) * 4096 + (${b(1)} % 64) * 64 + ${b(2)} % 64
           ELSE (${b(0)} % 8) * 262144 + (${b(1)} % 64) * 4096
                + (${b(2)} % 64) * 64 + ${b(3)} % 64
         END)"""
  }

  private def bothAt(hx: String, pos: Int): (Option[Long], Option[Long]) = {
    val r = spark.sql(
      s"""SELECT graft_codepoint(CAST(unhex('$hx') AS STRING), $pos) AS neo,
                 ${oldChainSql(s"CAST(unhex('$hx') AS STRING)", pos.toString)} AS old""").head()
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))
  }

  test("well-defined malformed shapes match the retired chain bit for bit") {
    GraftFunctions.register(spark)
    // (hex stream, positions to compare) — nothing here truncates a
    // lead at the end of the buffer
    val streams = Seq(
      "C341" -> Seq(1),        // 2-byte lead + invalid continuation 'A'
      "C08041" -> Seq(1),      // overlong NUL (then 'A' to pad the tail)
      "E0808041" -> Seq(1),    // overlong 3-byte
      "EDA08041" -> Seq(1),    // surrogate D800
      "F490808041" -> Seq(1),  // beyond U+10FFFF
      "FA80808041" -> Seq(1, 2, 3), // legacy 5-byte lead: walks as 1-byte chars
      "8041" -> Seq(1),        // lone continuation byte
      "41C3A9" -> Seq(1, 2),   // valid control: 'A' then 'é'
      "F09F8C8D41" -> Seq(1, 2) // valid control: 🌍 then 'A'
    )
    for ((hx, ps) <- streams; p <- ps) {
      val (neo, old) = bothAt(hx, p)
      assert(neo == old, s"stream $hx pos $p: graft_codepoint=$neo old-chain=$old")
    }
  }

  test("a truncated lead at end-of-string decodes clamped (the documented divergence)") {
    GraftFunctions.register(spark)
    for (hx <- Seq("C3", "E4B8", "F09F8C")) {
      val (neo, old) = bothAt(hx, 1)
      // clamped decode: the available bytes round-trip to U+FFFD
      assert(neo == Some(0xFFFDL), s"stream $hx: clamped decode must be U+FFFD, got $neo")
      // and the old chain really did read past the buffer: its hex
      // carries one byte MORE than the string holds (EFBFBD + the
      // adjacent 0x00 for these heap-backed literals), landing in the
      // 4-byte ELSE arm instead of the 3-byte replacement-char arm.
      // If this assertion ever fails with old == Some(0xFFFD), Spark
      // fixed substring's overstep — retire the divergence note.
      assert(old != neo && old.isDefined,
        s"stream $hx: expected the old chain's out-of-bounds shape, got $old")
    }
  }
}
