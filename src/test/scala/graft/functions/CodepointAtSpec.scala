package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct contract of the native [[CodepointAt]] expression
  * (`graft_codepoint`), the round-14 replacement for the
  * encode/hex/conv sampling chain. The lane-level multilingual parity
  * lives in CodepointSamplingSpec (hand-computed landmarks/phash); this
  * spec pins the expression's own edges: 1/2/3/4-byte decode on both
  * the interpreted path (literal args → constant folding) and the
  * codegen path (column args), codepoint-counted positions across a
  * surrogate pair, int and bigint position types, and NULL on
  * out-of-range / NULL inputs — each matching what the old chain
  * produced on valid input (malformed-byte parity and its one
  * documented divergence live in CodepointMalformedSpec).
  */
class CodepointAtSpec extends SparkSpec {
  import spark.implicits._

  private def ensureRegistered(): Unit = GraftFunctions.register(spark)

  test("decodes 1/2/3/4-byte UTF-8 on the interpreted (literal) path") {
    ensureRegistered()
    val r = spark.sql(
      """SELECT graft_codepoint('z', 1) AS a,
                graft_codepoint('é', 1) AS b,
                graft_codepoint('中', 1) AS c,
                graft_codepoint('🌍', 1) AS d""").head()
    assert(r.getLong(0) == 'z'.toLong)
    assert(r.getLong(1) == 0xE9L)
    assert(r.getLong(2) == 0x4E2DL)
    assert(r.getLong(3) == 0x1F30DL)
  }

  test("codegen path over a column matches String.codePointAt, astral positions included") {
    ensureRegistered()
    // 🌍 is ONE position despite being a surrogate pair in the JVM:
    // position 2 must be '中', not the low surrogate
    val t = "a🌍中é"
    val cps = t.codePoints().toArray
    val df = (1 to cps.length).map(p => (t, p)).toDF("text", "p")
    val got = df.selectExpr("graft_codepoint(text, p) AS cp")
      .collect().map(_.getLong(0)).toSeq
    assert(got == cps.map(_.toLong).toSeq)
  }

  test("int and bigint positions both resolve") {
    ensureRegistered()
    val viaInt = spark.sql("SELECT graft_codepoint('abc', CAST(2 AS INT))").head().getLong(0)
    val viaLong = spark.sql("SELECT graft_codepoint('abc', CAST(2 AS BIGINT))").head().getLong(0)
    assert(viaInt == 'b'.toLong && viaLong == 'b'.toLong)
  }

  test("NULL on out-of-range position, empty text, and NULL inputs (the old chain's NULLs)") {
    ensureRegistered()
    val r = spark.sql(
      """SELECT graft_codepoint('ab', 0) AS a,
                graft_codepoint('ab', 3) AS b,
                graft_codepoint('', 1) AS c,
                graft_codepoint(CAST(NULL AS STRING), 1) AS d,
                graft_codepoint('ab', CAST(NULL AS BIGINT)) AS e""").head()
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"column $i should be NULL"))
    // and on the codegen path too
    val viaCol = Seq(("ab", 3L)).toDF("text", "p")
      .selectExpr("graft_codepoint(text, p) AS cp").head()
    assert(viaCol.isNullAt(0))
  }
}
