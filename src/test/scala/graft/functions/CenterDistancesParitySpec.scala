package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the [[CenterDistances]] codegen ADC table: it must be
  * bit-equivalent to the literal form it replaced in q_ann_ivfpq —
  * per center k, `greatest(snsq − 2·dot(slice, lit(c_k)) + cc_k, 0.0)`
  * with the slice's truncation semantics and the ascending-index norm
  * fold — because the summed, rounded ADC value is oracle-hash-gated.
  */
class CenterDistancesParitySpec extends SparkSpec {
  import spark.implicits._

  private val centers = Seq(
    Array(1.0, 0.0, -2.0, 0.5),
    Array(0.0, 1.0, 0.25, -1.0),
    Array(3.0, 4.0, 0.0, 0.0),
  )

  /** The literal reference formulation, verbatim from the old code. */
  private def literalTable(offset: Int, length: Int) = {
    val x = col("embedding").cast("array<double>")
    val sub = slice(x, offset + 1, length)
    val snsq = VectorFunctions.dotProduct(sub, sub)
    array(centers.map { c =>
      val cc = c.map(v => v * v).sum
      greatest(
        snsq - lit(2.0) * VectorFunctions.dotProduct(sub, typedLit(c.toSeq)) + lit(cc),
        lit(0.0))
    }: _*)
  }

  private def check(df: org.apache.spark.sql.DataFrame, offset: Int, length: Int): Unit = {
    val rows = df.select(
        VectorFunctions.centerDistances(col("embedding"), offset, length, centers).as("t"),
        literalTable(offset, length).as("ref"))
      .collect()
    rows.foreach { r =>
      val t = r.getSeq[Double](0)
      val ref = r.getSeq[Double](1)
      assert(t.length == ref.length)
      t.zip(ref).zipWithIndex.foreach { case ((a, b), k) =>
        assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
          || (a.isNaN && b.isNaN),
          s"entry $k not bit-identical: $a vs $b")
      }
    }
  }

  test("full-width table matches the literal form bit for bit (float input)") {
    check(Seq(
      Tuple1(Seq(0.9f, 0.1f, -0.5f, 2.0f)),
      Tuple1(Seq(1.0f, 0.0f, -2.0f, 0.5f)), // exact center hit: entry 0 clamps to 0.0
      Tuple1(Seq(-3.5f, 1.25f, 0.0f, 7.0f)),
    ).toDF("embedding"), 0, 4)
  }

  test("windowed table slices like the sub-quantizer path") {
    check(Seq(
      Tuple1(Seq(9.0, 9.0, 0.0, 1.0, 0.25, -1.0)),
      Tuple1(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)),
    ).toDF("embedding"), 2, 4)
  }

  test("short arrays truncate exactly like slice + min-length dot") {
    // window [2, 6) over a 4-element array: only 2 elements available
    check(Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0))).toDF("embedding"), 2, 4)
    // window entirely past the end: snsq = dot = 0, table = clamped norms
    check(Seq(Tuple1(Seq(1.0, 2.0))).toDF("embedding"), 4, 4)
  }

  test("NaN input elements propagate exactly like the literal arithmetic") {
    check(Seq(Tuple1(Seq(Double.NaN, 1.0, 0.5, -0.5))).toDF("embedding"), 0, 4)
  }
}
