package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property pin for [[CodepointAt]]: on ARBITRARY valid Unicode text —
  * drawn across ASCII, Latin-1, BMP, and astral planes, surrogate
  * pairs included — `graft_codepoint(text, p)` equals the JVM's own
  * `String.codePointAt` walk at every codepoint position, and NULL
  * exactly outside [1, codepoint-count]. The fixed-seed generator
  * keeps runs deterministic (PropertySpec's discipline); the
  * hand-computed fixtures live in CodepointAtSpec / the lane-level
  * CodepointSamplingSpec, and malformed bytes in
  * CodepointMalformedSpec — this spec covers the combinatorial middle
  * those fixtures sample.
  */
class CodepointAtPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // codepoints from every UTF-8 width class, excluding surrogates
  // (unpaired surrogates are not valid scalar values; the malformed
  // spec owns that regime)
  private val cpGen: Gen[Int] = Gen.frequency(
    4 -> Gen.chooseNum(0x20, 0x7E),       // 1-byte
    3 -> Gen.chooseNum(0x80, 0x7FF),      // 2-byte
    2 -> Gen.chooseNum(0x800, 0xD7FF),    // 3-byte below the surrogates
    1 -> Gen.chooseNum(0xE000, 0xFFFF),   // 3-byte above the surrogates
    2 -> Gen.chooseNum(0x10000, 0x10FFFF) // 4-byte (surrogate pair in the JVM)
  )

  private val textGen: Gen[String] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => new String(cps.toArray.flatMap(Character.toChars), 0,
        cps.map(Character.charCount).sum))

  test("graft_codepoint equals String.codePointAt at every position, NULL outside") {
    GraftFunctions.register(spark)
    val texts = samples(textGen, 40)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("id", "text")
    df.createOrReplaceTempView("cp_prop")
    val got = spark.sql(
      """SELECT id, p, graft_codepoint(text, p) AS cp
         FROM cp_prop LATERAL VIEW explode(sequence(0, 45)) AS p""")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val cps = t.codePoints().toArray
      // in-range positions: the JVM walk
      cps.indices.foreach { k =>
        val expect = Some(cps(k).toLong)
        assert(got((i.toLong, k + 1)) == expect,
          s"text #$i pos ${k + 1}: got ${got((i.toLong, k + 1))}, expected $expect")
      }
      // out-of-range: NULL at 0 and past the last codepoint
      assert(got((i.toLong, 0)).isEmpty, s"text #$i pos 0 must be NULL")
      ((cps.length + 1) to 45).foreach { p =>
        assert(got((i.toLong, p)).isEmpty, s"text #$i pos $p must be NULL (len ${cps.length})")
      }
    }
  }
}
