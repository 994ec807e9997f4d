package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NearestCenters]] (the IVF probe-side top-p selector) against the
  * literal `slice(array_sort(array(struct(greatest(snsq − 2·dot + cc,
  * 0), cell), …)), 1, p)` Column form it replaced: selection AND order
  * must match on every input the literal form could meet — including
  * equal-distance ties (the struct sort breaks them by ascending
  * cell), NaN elements (all distances NaN → cell order), short arrays
  * (fewer elements than the declared window), and p ≥ the number of
  * centers. Equality here is what lets IvfCellsMax sit above the old
  * 256 literal-unroll ceiling without touching any oracle.
  */
class NearestCentersSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  /** The literal Column form, verbatim from the replaced code. */
  private def literalForm(centers: Seq[Array[Double]], p: Int): Column = {
    val x = col("v").cast("array<double>")
    val nsq = graft.pipeline.Similarity.dot(x, x)
    val cells = array(centers.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v * v).sum
      val d2 = nsq - lit(2.0) * graft.pipeline.Similarity.dot(x, typedLit(c.toSeq)) + lit(cc)
      struct(greatest(d2, lit(0.0)).as("d2"), lit(i).as("cell"))
    }: _*)
    slice(array_sort(cells), 1, p)
  }

  private def cellsOf(c: Column) =
    transform(c, s => s.getField("cell"))

  private def check(rows: Seq[Seq[Float]], centers: Seq[Array[Double]], p: Int,
      clue: String): Unit = {
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = df.select(col("id"),
      cellsOf(VectorFunctions.nearestCenters(col("v"), 0, dim, centers, p)).as("cells"))
    val want = df.select(col("id"), cellsOf(literalForm(centers, p)).as("cells"))
    val g = got.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val w = want.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(g == w, s"$clue: nearest_centers != literal form\ngot=$g\nwant=$w")
  }

  private val centers = Seq(
    Array(0.0, 0.0, 0.0, 0.0),
    Array(1.0, 1.0, 1.0, 1.0),
    Array(1.0, 1.0, 1.0, 1.0), // exact duplicate: every d2 ties with cell 1
    Array(-2.0, 0.5, 3.0, -1.0),
    Array(0.25, 0.25, 0.25, 0.25))

  test("selection and order match the literal form (incl. duplicate-center ties)") {
    val rows = Seq(
      Seq(0.1f, 0.2f, 0.3f, 0.4f),
      Seq(1.0f, 1.0f, 1.0f, 1.0f), // exactly ON the duplicated center
      Seq(-1.5f, 0.4f, 2.5f, -0.9f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f),
      Seq(100f, -50f, 25f, 3f))
    for (p <- Seq(1, 2, 3, 5, 8)) check(rows, centers, p, s"p=$p")
  }

  test("NaN elements poison every distance alike: cell order, like array_sort") {
    val rows = Seq(Seq(Float.NaN, 1f, 2f, 3f), Seq(1f, Float.NaN, Float.NaN, 0f))
    for (p <- Seq(2, 5)) check(rows, centers, p, s"NaN p=$p")
  }

  test("short arrays clamp to the available prefix, like slice+dot") {
    val rows = Seq(Seq(0.5f, 0.5f), Seq(1f, 1f, 1f), Seq.empty[Float])
    for (p <- Seq(2, 5)) check(rows, centers, p, s"short p=$p")
  }

  test("generated loop size is independent of the center count (no janino fallback)") {
    // 600 cells — far past the old 256 literal-unroll ceiling; the
    // expression must still codegen (the reference-object loop) and
    // agree with the interpreted eval
    val big = (0 until 600).map(i =>
      Array(i * 0.37 % 5.0, (i * 7 % 11).toDouble, i % 3.0, (i % 17) * 0.25))
    val rows = Seq(Seq(1.1f, 4.0f, 1.0f, 2.0f), Seq(0.0f, 10.0f, 2.0f, 0.1f))
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val sel = df.select(col("id"),
      cellsOf(VectorFunctions.nearestCenters(col("v"), 0, dim, big, 16)).as("cells"))
    val viaCodegen = sel.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // interpreted reference: evaluate the same expression row-by-row
    // over a RESOLVED literal child (nullSafeEval needs child.dataType)
    rows.zipWithIndex.foreach { case (v, i) =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
        v.toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))
      val expr = NearestCenters(lit, 0, dim,
        big.map(_.toIndexedSeq).toIndexedSeq, 16)
      val out = expr.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val cells = (0 until out.numElements())
        .map(j => out.getStruct(j, 2).getInt(1))
      assert(viaCodegen(i.toLong) == cells,
        s"row $i: codegen ${viaCodegen(i.toLong)} != interpreted $cells")
    }
  }
}
