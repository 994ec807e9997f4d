package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check for [[NearestCenters]] against an independent
  * reference: brute-force (d2, cell) computation + full lexicographic
  * sort + take(p), built from plain Scala (no reuse of the insertion
  * logic under test). Random vectors, random center matrices (with
  * forced duplicate centers so equal-distance ties actually occur),
  * random p — deterministic seeds, so failures reproduce.
  */
class NearestCentersPropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val dim = 6

  private val genCase = for {
    nCenters <- Gen.chooseNum(1, 40)
    base <- Gen.listOfN(nCenters, Gen.listOfN(dim, Gen.chooseNum(-8.0, 8.0)))
    dupFrom <- Gen.chooseNum(0, math.max(0, nCenters - 1))
    vec <- Gen.listOfN(dim, Gen.chooseNum(-8.0f, 8.0f))
    p <- Gen.chooseNum(1, 50)
  } yield {
    // plant an exact duplicate of one center at the end: its d2 ties
    // with the original on EVERY input, exercising the cell tie-break
    val centers = (base :+ base(dupFrom)).map(_.toArray)
    (centers, vec.toArray, p)
  }

  /** Independent reference: full sort by (d2 via Double.compare, cell). */
  private def reference(centers: Seq[Array[Double]], v: Array[Float], p: Int): Seq[Int] = {
    var snsq = 0.0
    v.foreach(x => snsq += x.toDouble * x.toDouble)
    centers.zipWithIndex.map { case (c, k) =>
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v(i).toDouble * c(i); i += 1 }
      var cc = 0.0
      i = 0
      while (i < dim) { cc += c(i) * c(i); i += 1 }
      val d2raw = snsq - 2.0 * dot + cc
      (if (d2raw <= 0.0) 0.0 else d2raw, k)
    }.sortWith { case ((d1, k1), (d2, k2)) =>
      val c = java.lang.Double.compare(d1, d2)
      if (c != 0) c < 0 else k1 < k2
    }.take(p).map(_._2)
  }

  test("random vectors/centers/p: expression == brute-force sort-take, ties included") {
    samples(genCase, 60).foreach { case (centers, v, p) =>
      val expr = NearestCenters(
        Literal.create(v, ArrayType(FloatType)), 0, dim,
        centers.map(_.toIndexedSeq).toIndexedSeq, p)
      val out = expr.eval(InternalRow.empty).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map(j => out.getStruct(j, 2).getInt(1))
      val want = reference(centers.toIndexedSeq, v, p)
      assert(got == want,
        s"centers=${centers.size} p=$p v=${v.mkString(",")}: got=$got want=$want")
    }
  }
}
