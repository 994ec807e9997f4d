package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the [[NearestCenter]] codegen argmin: it must be
  * bit-equivalent to the unrolled literal form it replaced
  * (`array_min` over `struct(greatest(snsq − 2·dot + cc, 0), k)`),
  * including the smallest-index tie-break and the pre-argmin clamp —
  * every IVF-family oracle hash rides on that equivalence.
  */
class NearestCenterSpec extends SparkSpec {
  import spark.implicits._

  private val centers = Seq(
    Array(1.0, 0.0),
    Array(0.0, 1.0),
    Array(0.0, 1.0), // duplicate: tie must resolve to index 1, not 2
    Array(3.0, 4.0),
  )

  test("argmin matches the unrolled struct array_min, ties to the smallest index") {
    val df = Seq(
      (1L, Seq(0.9f, 0.1f)),   // nearest (1,0) -> 0
      (2L, Seq(0.0f, 1.0f)),   // exact tie between centers 1 and 2 -> 1
      (3L, Seq(3.0f, 3.9f)),   // nearest (3,4) -> 3
    ).toDF("id", "embedding")
    val nc = VectorFunctions.nearestCenter(col("embedding"), 0, 2, centers)
    // the unrolled reference formulation, verbatim from the old code
    val x = col("embedding").cast("array<double>")
    val nsq = VectorFunctions.dotProduct(x, x)
    val unrolled = array_min(array(centers.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v * v).sum
      val d2 = nsq - lit(2.0) * VectorFunctions.dotProduct(x, typedLit(c.toSeq)) + lit(cc)
      struct(greatest(d2, lit(0.0)).as("d2"), lit(i).as("code"))
    }: _*))
    val rows = df.select(col("id"), nc.as("nc"), unrolled.as("ref"))
      .select(col("id"), col("nc.code"), col("nc.d2"),
        col("ref.code").as("rcode"), col("ref.d2").as("rd2"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(3), s"code mismatch for id ${r.getLong(0)}: $r")
      assert(r.getDouble(2) == r.getDouble(4),
        s"d2 not bit-identical for id ${r.getLong(0)}: $r")
    }
    val byId = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId == Map(1L -> 0, 2L -> 1, 3L -> 3))
  }

  test("windowed argmin (offset/length) slices like the sub-quantizer path; d2 clamps at 0") {
    // 4-dim vector, window [2, 4): exact center hit -> d2 must clamp to exactly 0.0
    val df = Seq((1L, Seq(9.0f, 9.0f, 0.0f, 1.0f))).toDF("id", "embedding")
    val r = df.select(
      VectorFunctions.nearestCenter(col("embedding"), 2, 2, centers).as("nc"))
      .select(col("nc.code"), col("nc.d2")).collect().head
    assert(r.getInt(0) == 1)
    assert(r.getDouble(1) == 0.0)
  }

  test("double-array input takes the getDouble path and agrees with the float path values") {
    val df = Seq((1L, Seq(0.25, 0.75))).toDF("id", "embedding")
    val r = df.select(
      VectorFunctions.nearestCenter(col("embedding"), 0, 2, centers).as("nc"))
      .select(col("nc.code")).collect().head
    assert(r.getInt(0) == 1)
  }

  test("short arrays fold over the available prefix, like the slice+dot form they replaced") {
    // 1-element vector against 2-dim centers: dot/norm use only dim 0,
    // exactly what slice-then-DotProduct (min-length fold) computed
    val df = Seq((1L, Seq(1.0f))).toDF("id", "embedding")
    val r = df.select(
      VectorFunctions.nearestCenter(col("embedding"), 0, 2, centers).as("nc"))
      .select(col("nc.code"), col("nc.d2")).collect().head
    // d2 against (1,0): 1 - 2*1 + 1 = 0 -> exact winner at index 0
    assert(r.getInt(0) == 0 && r.getDouble(1) == 0.0)
    // window entirely past the end: zero vector -> nearest by norm
    // alone, smallest-index tie-break among the (0,1) duplicates
    val past = df.select(
      VectorFunctions.nearestCenter(col("embedding"), 5, 2, centers).as("nc"))
      .select(col("nc.code"), col("nc.d2")).collect().head
    assert(past.getInt(0) == 0 && past.getDouble(1) == 1.0)
  }

  test("non-finite center coordinates are rejected at construction") {
    // a NaN/Inf frozen center would make a SUBSET of d2 values NaN,
    // where the strict < scan and array_min's NaN-orderable pick
    // diverge — the expression refuses to exist instead
    Seq(Double.NaN, Double.PositiveInfinity).foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        VectorFunctions.nearestCenter(col("embedding"), 0, 2,
          Seq(Array(1.0, 0.0), Array(bad, 1.0)))
      }
      assert(e.getMessage.contains("finite"))
    }
  }

  test("NaN elements resolve to center 0, matching struct array_min ordering") {
    val df = Seq((1L, Seq(Float.NaN, 0.5f))).toDF("id", "embedding")
    val nc = VectorFunctions.nearestCenter(col("embedding"), 0, 2, centers)
    val x = col("embedding").cast("array<double>")
    val nsq = VectorFunctions.dotProduct(x, x)
    val unrolled = array_min(array(centers.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v * v).sum
      val d2 = nsq - lit(2.0) * VectorFunctions.dotProduct(x, typedLit(c.toSeq)) + lit(cc)
      struct(greatest(d2, lit(0.0)).as("d2"), lit(i).as("code"))
    }: _*))
    val r = df.select(nc.getField("code").as("c"), unrolled.getField("code").as("ref"))
      .collect().head
    assert(r.getInt(0) == r.getInt(1) && r.getInt(0) == 0, s"NaN divergence: $r")
  }
}
