package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[graft.functions.SignCodeHalf]] expression
  * bit-for-bit against the 32-term `when`-chain Column form it
  * replaced (kept HERE as the reference implementation — in production
  * that form was a silent JIT cliff when composed into one projection
  * with the other half + NearestCenter: the spliced whole-stage method
  * crossed HotSpot's 8,000-bytecode compile limit and ran interpreted
  * at ~1000x, with no janino error and no plan-visible symptom).
  */
class SignCodeParitySpec extends SparkSpec {
  import spark.implicits._

  /** The replaced Column form, verbatim. */
  private def referenceHalf(v: Column, hiHalf: Boolean): Column =
    (0 until 32).map { j =>
      val b = j % 16
      val s2 = if (j < 16) -1.0 else 1.0
      val s3 = if (hiHalf) (if (j < 16) -1.0 else 1.0) else (if (j < 16) 1.0 else -1.0)
      val s4 = if (hiHalf) 1.0 else -1.0
      val contrast =
        element_at(v, b + 1).cast("double") +
          lit(s2) * element_at(v, b + 17).cast("double") +
          lit(s3) * element_at(v, b + 33).cast("double") +
          lit(s4) * element_at(v, b + 49).cast("double")
      when(contrast > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("native halves match the reference Column form on random and structured vectors") {
    val rnd = new scala.util.Random(1234)
    val vecs: Seq[Seq[Float]] =
      // random dense
      (0 until 200).map(_ => IndexedSeq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)) ++
        // exact zeros (contrast == 0 must NOT set the bit, both forms)
        Seq(IndexedSeq.fill(64)(0.0f)) ++
        // one-hot and all-equal structure
        (0 until 64 by 7).map(i => IndexedSeq.tabulate(64)(k => if (k == i) 1.0f else 0.0f)) ++
        Seq(IndexedSeq.fill(64)(0.5f), IndexedSeq.fill(64)(-0.5f)) ++
        // NaN / Inf shapes: Spark's GreaterThan and DuckDB order NaN
        // above every number (`NaN > 0` is TRUE), and Inf - Inf inside
        // a contrast makes one — the native loop must agree
        Seq(
          IndexedSeq.tabulate(64)(k => if (k == 3) Float.NaN else 0.1f),
          IndexedSeq.tabulate(64)(k =>
            if (k == 5) Float.PositiveInfinity
            else if (k == 21) Float.PositiveInfinity else -0.2f),
          IndexedSeq.tabulate(64)(k =>
            if (k % 16 == 7) Float.NegativeInfinity else 0.3f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val rows = df.select(
      Similarity.signCode(col("v")).as("lo"),
      Similarity.signCodeHi(col("v")).as("hi"),
      referenceHalf(col("v"), hiHalf = false).as("rlo"),
      referenceHalf(col("v"), hiHalf = true).as("rhi")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), s"lo half diverged: $r")
      assert(r.getLong(1) == r.getLong(3), s"hi half diverged: $r")
    }
  }

  test("short arrays: elements past the end contribute bit 0, exactly like element_at NULL") {
    // 40-dim vector: bits needing v[j+48] (all of them) read NULL in
    // the reference form -> contrast NULL -> bit 0 -> code 0
    val df = Seq(Tuple1(IndexedSeq.fill(40)(1.0f))).toDF("v")
    val r = df.select(Similarity.signCode(col("v")).as("lo"),
      Similarity.signCodeHi(col("v")).as("hi")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }
}
