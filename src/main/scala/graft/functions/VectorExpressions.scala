package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over ARRAY<FLOAT|DOUBLE>
  * columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — evaluates one interpreted lambda call per element; for 64-dim
  * embeddings at millions of candidate pairs that dominates the whole
  * query. [[DotProduct]] is a single tight JVM loop with codegen, and
  * keeps the exact same left-to-right summation order (so results stay
  * bit-identical to the fold and to the DuckDB oracle's list_reduce).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Nearest-center argmin over a FROZEN center matrix: returns
  * `struct(d2, code)` for the center minimizing the clamped squared
  * distance of `child[offset, offset+length)` — exactly what
  * `array_min(array(struct(greatest(snsq − 2·dot + cc, 0), k), …))`
  * computes, in ONE generated loop instead of K unrolled dot-product
  * blocks.
  *
  * Why an Expression and not the unrolled Column form: a k-means model
  * of K centers unrolls to K inline codegen blocks PER CALL SITE; the
  * IVF-PQ encode (16 cells + 8×16 sub-codes) pushed the fused stage's
  * generated method past janino's 64 KB limit, silently degrading the
  * stage to interpreted execution — and at production K (256) the
  * unrolled form could never compile at all. Here the model rides a
  * reference object (no generated code grows with K), matching how a
  * 1000-executor job would broadcast the model once per executor.
  *
  * Bit-parity contract (oracle-hash-gated): squared norms of centers
  * are pre-folded in ascending index order (the same `c.map(v*v).sum`
  * the literal form used), d2 = snsq − 2.0·dot + cc with the dot's
  * left-to-right order, clamped at 0 BEFORE the argmin, ties resolved
  * to the smallest index (strict `<` on an ascending scan) — identical
  * to the struct array_min ordering.
  */
case class NearestCenter(child: Expression, offset: Int, length: Int,
    centers: IndexedSeq[IndexedSeq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // `centers` is a Seq (not Array) ON PURPOSE: case-class equality over
  // an Array field is reference equality, which would break Catalyst's
  // semanticEquals — two identical argmins in one projection would
  // never deduplicate. The codegen path uses the flattened JVM mirror
  // below.

  // a non-finite frozen center would make SOME d2 NaN while others stay
  // finite, where the strict `<` scan (with its k==0 default) diverges
  // from the struct array_min's NaN-orderable pick — reject it at
  // construction instead of silently mis-assigning. NaN INPUT elements
  // poison every d2 alike (snsq is shared), so the k==0 default stays
  // exactly array_min's all-NaN first-index pick.
  require(centers.forall(_.forall(java.lang.Double.isFinite)),
    "nearest_center requires finite center coordinates")

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("code", IntegerType, nullable = false)))

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_center expects array<float|double>, got $t")
    }

  @transient private lazy val matrix: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  // ascending-index left fold — the exact order the literal form's
  // Scala-side `c.map(v => v * v).sum` used, so cc is bit-identical
  @transient private lazy val norms: Array[Double] =
    matrix.map { c =>
      var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
    // clamp to the elements that exist — the replaced slice+DotProduct
    // form computed over the available prefix of a short array (slice
    // truncates, DotProduct folds min-length); reading past
    // numElements would be silent out-of-bounds on UnsafeArrayData
    val avail = math.max(0, math.min(length, x.numElements() - offset))
    var snsq = 0.0
    var i = 0
    while (i < avail) { val v = at(offset + i); snsq += v * v; i += 1 }
    var bestD2 = Double.PositiveInfinity
    var bestK = -1
    var k = 0
    while (k < matrix.length) {
      val c = matrix(k)
      var dot = 0.0
      var j = 0
      while (j < avail) { dot += at(offset + j) * c(j); j += 1 }
      val d2 = { val v = snsq - 2.0 * dot + norms(k); if (v < 0.0) 0.0 else v }
      // `k == 0`: center 0 is the default, matching the struct
      // array_min it replaced (NaN distances — e.g. a NaN element —
      // compare orderable there and resolve to the first index; a
      // strict `<` alone would leave the sentinel -1)
      if (k == 0 || d2 < bestD2) { bestD2 = d2; bestK = k }
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestD2, bestK)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centers", matrix, "double[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val snsq = ctx.freshName("snsq")
      val avail = ctx.freshName("avail")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val d2 = ctx.freshName("d2")
      val bestD2 = ctx.freshName("bestD2")
      val bestK = ctx.freshName("bestK")
      s"""
         |int $avail = java.lang.Math.max(0,
         |  java.lang.Math.min($length, $a.numElements() - $offset));
         |double $snsq = 0.0;
         |for (int $i = 0; $i < $avail; $i++) {
         |  double v = (double) $a.$get($offset + $i);
         |  $snsq += v * v;
         |}
         |double $bestD2 = Double.POSITIVE_INFINITY;
         |int $bestK = -1;
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $avail; $j++) {
         |    $dot += ((double) $a.$get($offset + $j)) * $cRef[$k][$j];
         |  }
         |  double $d2 = $snsq - 2.0 * $dot + $nRef[$k];
         |  if ($d2 < 0.0) $d2 = 0.0;
         |  if ($k == 0 || $d2 < $bestD2) { $bestD2 = $d2; $bestK = $k; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $bestD2, $bestK });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCenter =
    copy(child = c)
}

/** The SORTED `p` nearest centers: `array<struct<d2, cell>>` ascending
  * by (d2, cell) — exactly what
  * `slice(array_sort(array(struct(greatest(snsq − 2·dot + cc, 0), k), …)), 1, p)`
  * computes, in one generated loop whose size is INDEPENDENT of the
  * center count (model as a reference object, like [[NearestCenter]]).
  *
  * This is the IVF probe-side selector. The unrolled Column form it
  * replaces emitted K inline dot-product blocks per call site, which
  * is what forced `Similarity.IvfCellsMax = 256` — beyond that the
  * generated method would cross janino's 64 KB ceiling and degrade the
  * stage to interpreted execution. With the loop form the cell count
  * can scale as √n unbounded by codegen size; the remaining ceiling is
  * the driver-side k-means fit and the broadcast model bytes.
  *
  * Bit-parity contract with the literal form (the selected CELLS must
  * match, because only `probe.cell` survives downstream): d2 uses the
  * same snsq/dot/cc arithmetic as [[NearestCenter]] (whose equivalence
  * to the `nsq`-column form is already oracle-gated), the clamp
  * normalizes to exactly 0.0, the ordering is `Double.compare` on d2
  * (NaN sorts last and ties with NaN, matching Spark's array_sort
  * double ordering on this value set) with ascending-cell tie-break
  * (insertion keeps earlier cells before equal-d2 later cells, the
  * lexicographic struct order array_sort applies).
  */
case class NearestCenters(child: Expression, offset: Int, length: Int,
    centers: IndexedSeq[IndexedSeq[Double]], p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(p > 0, "nearest_centers requires p > 0")
  require(centers.nonEmpty, "nearest_centers requires a non-empty model")
  require(centers.forall(_.forall(java.lang.Double.isFinite)),
    "nearest_centers requires finite center coordinates")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false))), containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centers expects array<float|double>, got $t")
    }

  @transient private lazy val matrix: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  @transient private lazy val norms: Array[Double] =
    matrix.map { c =>
      var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s
    }

  private def outLen: Int = math.min(p, centers.length)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
    val avail = math.max(0, math.min(length, x.numElements() - offset))
    var snsq = 0.0
    var i = 0
    while (i < avail) { val v = at(offset + i); snsq += v * v; i += 1 }
    val n = outLen
    val dB = new Array[Double](n)
    val cB = new Array[Int](n)
    var filled = 0
    var k = 0
    while (k < matrix.length) {
      val c = matrix(k)
      var dot = 0.0
      var j = 0
      while (j < avail) { dot += at(offset + j) * c(j); j += 1 }
      val v = snsq - 2.0 * dot + norms(k)
      val d2 = if (v <= 0.0) 0.0 else v
      // scanning cells ascending: equal d2 stops the shift, so earlier
      // cells stay before later equal-d2 cells (lexicographic order)
      if (filled < n || java.lang.Double.compare(d2, dB(n - 1)) < 0) {
        var pos = if (filled < n) filled else n - 1
        while (pos > 0 && java.lang.Double.compare(d2, dB(pos - 1)) < 0) {
          dB(pos) = dB(pos - 1); cB(pos) = cB(pos - 1); pos -= 1
        }
        dB(pos) = d2; cB(pos) = k
        if (filled < n) filled += 1
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](filled)(i =>
        org.apache.spark.sql.catalyst.InternalRow(dB(i), cB(i))))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centers", matrix, "double[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    val n = outLen
    nullSafeCodeGen(ctx, ev, a => {
      val snsq = ctx.freshName("snsq")
      val avail = ctx.freshName("avail")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val d2 = ctx.freshName("d2")
      val dB = ctx.freshName("dB")
      val cB = ctx.freshName("cB")
      val filled = ctx.freshName("filled")
      val pos = ctx.freshName("pos")
      val out = ctx.freshName("out")
      s"""
         |int $avail = java.lang.Math.max(0,
         |  java.lang.Math.min($length, $a.numElements() - $offset));
         |double $snsq = 0.0;
         |for (int $i = 0; $i < $avail; $i++) {
         |  double v = (double) $a.$get($offset + $i);
         |  $snsq += v * v;
         |}
         |double[] $dB = new double[$n];
         |int[] $cB = new int[$n];
         |int $filled = 0;
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $avail; $j++) {
         |    $dot += ((double) $a.$get($offset + $j)) * $cRef[$k][$j];
         |  }
         |  double $d2 = $snsq - 2.0 * $dot + $nRef[$k];
         |  if ($d2 <= 0.0) $d2 = 0.0;
         |  if ($filled < $n || java.lang.Double.compare($d2, $dB[$n - 1]) < 0) {
         |    int $pos = ($filled < $n) ? $filled : $n - 1;
         |    while ($pos > 0 && java.lang.Double.compare($d2, $dB[$pos - 1]) < 0) {
         |      $dB[$pos] = $dB[$pos - 1]; $cB[$pos] = $cB[$pos - 1]; $pos--;
         |    }
         |    $dB[$pos] = $d2; $cB[$pos] = $k;
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |Object[] $out = new Object[$filled];
         |for (int $i = 0; $i < $filled; $i++) {
         |  $out[$i] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $dB[$i], $cB[$i] });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCenters =
    copy(child = c)
}

/** ALL K clamped squared distances of `child[offset, offset+length)`
  * against a FROZEN center matrix, as `array<double>` indexed by center
  * — the PQ paper's per-query ADC lookup table in ONE generated loop.
  *
  * The Column form it replaces (round 16) built K literal entries of
  * `greatest(snsq − 2·dot(slice, lit(center)) + cc, 0.0)` PER SUBSPACE
  * — M·K = 128 expression subtrees whose construction and analysis
  * cost ~0.5 s of every q_ann_ivfpq call before a single row moved,
  * and whose fused codegen grows with K (the janino/JIT ceiling class
  * [[NearestCenter]] exists for). Here the model rides a reference
  * object; generated code is independent of K.
  *
  * Bit-parity contract with the literal form (oracle-hash-gated
  * through q_ann_ivfpq's summed, rounded ADC): center norms pre-folded
  * in ascending index order (the `c.map(v·v).sum` the literal form
  * used), snsq and dot in left-to-right element order over the
  * available prefix (slice-truncation semantics), d2 = snsq − 2.0·dot
  * + cc clamped at 0 exactly like [[NearestCenter]] (whose clamp
  * equivalence to `greatest(_, 0.0)` is already gated); NaN inputs
  * propagate NaN entries just as the literal arithmetic did.
  * CenterDistancesParitySpec pins the table against the literal form
  * on random / float / short / NaN inputs.
  */
case class CenterDistances(child: Expression, offset: Int, length: Int,
    centers: IndexedSeq[IndexedSeq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centers.nonEmpty, "center_distances requires a non-empty model")
  require(centers.forall(_.forall(java.lang.Double.isFinite)),
    "center_distances requires finite center coordinates")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"center_distances expects array<float|double>, got $t")
    }

  @transient private lazy val matrix: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  @transient private lazy val norms: Array[Double] =
    matrix.map { c =>
      var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
    val avail = math.max(0, math.min(length, x.numElements() - offset))
    var snsq = 0.0
    var i = 0
    while (i < avail) { val v = at(offset + i); snsq += v * v; i += 1 }
    val out = new Array[Double](matrix.length)
    var k = 0
    while (k < matrix.length) {
      val c = matrix(k)
      var dot = 0.0
      var j = 0
      while (j < avail) { dot += at(offset + j) * c(j); j += 1 }
      val v = snsq - 2.0 * dot + norms(k)
      out(k) = if (v <= 0.0) 0.0 else v
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centers", matrix, "double[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val snsq = ctx.freshName("snsq")
      val avail = ctx.freshName("avail")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val d2 = ctx.freshName("d2")
      val out = ctx.freshName("out")
      s"""
         |int $avail = java.lang.Math.max(0,
         |  java.lang.Math.min($length, $a.numElements() - $offset));
         |double $snsq = 0.0;
         |for (int $i = 0; $i < $avail; $i++) {
         |  double v = (double) $a.$get($offset + $i);
         |  $snsq += v * v;
         |}
         |double[] $out = new double[$cRef.length];
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $avail; $j++) {
         |    $dot += ((double) $a.$get($offset + $j)) * $cRef[$k][$j];
         |  }
         |  double $d2 = $snsq - 2.0 * $dot + $nRef[$k];
         |  if ($d2 <= 0.0) $d2 = 0.0;
         |  $out[$k] = $d2;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): CenterDistances =
    copy(child = c)
}

/** One 32-bit half of the 64-bit structured-sign LSH code (round 15) —
  * the native form of the two 16-term quarter-Hadamard contrast
  * families over (a, b, c, d) = (v[j], v[j+16], v[j+32], v[j+48]):
  *
  *   lo (hiHalf = false): bit j = sign(a - b + c - d),
  *                        bit j+16 = sign(a + b - c - d)
  *   hi (hiHalf = true):  bit j = sign(a - b - c + d),
  *                        bit j+16 = sign(a + b + c + d)
  *
  * This replaces a Column form of 32 chained `when` terms x 4
  * `element_at` casts, whose generated code was benign alone but a
  * JIT-CLIFF BOMB when composed: spliced into one projection with the
  * other sign half + dot + NearestCenter (the semanticDedup shape),
  * the whole-stage method exceeded HotSpot's huge-method compile limit
  * (8,000 bytecode) and ran INTERPRETED with no plan-visible symptom —
  * janino compiled fine (no "ERROR CodeGenerator"), the plan read
  * WholeStageCodegen, and the stage ground at ~76 ms/row instead of
  * ~60 µs (measured: the 200 k-vector checkpoint fell from > 400 s to
  * 3.9 s with codegen disabled — the interpreter was the whole cost).
  * As a 30-line generated loop the projection stays far under the JIT
  * limit. Bit-parity with the Column form is pinned by
  * SignCodeParitySpec (same float→double casts, same left-associated
  * contrast order, same NULL/short-array → bit-0 semantics as
  * `element_at` under the oracle's CASE).
  */
case class SignCodeHalf(child: Expression, hiHalf: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_code expects array<float|double>, got $t")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val isF = elemIsFloat
    def at(i: Int): Double = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
    val n = x.numElements()
    var code = 0L
    var j = 0
    while (j < 16) {
      // element_at past the end (or a NULL element) makes the contrast
      // NULL -> bit 0 in the Column form and the oracle's CASE alike
      if (j + 48 < n && !x.isNullAt(j) && !x.isNullAt(j + 16) &&
          !x.isNullAt(j + 32) && !x.isNullAt(j + 48)) {
        val a0 = at(j); val b0 = at(j + 16); val c0 = at(j + 32); val d0 = at(j + 48)
        val c1 = if (hiHalf) a0 - b0 - c0 + d0 else a0 - b0 + c0 - d0
        val c2 = if (hiHalf) a0 + b0 + c0 + d0 else a0 + b0 - c0 - d0
        // NaN sets the bit: Spark's GreaterThan and DuckDB both order
        // NaN above every number, so `contrast > 0` is TRUE there (a
        // NaN contrast arises from a NaN element or an Inf - Inf);
        // plain Java `>` would silently leave the bit 0 and diverge
        if (c1 > 0.0 || java.lang.Double.isNaN(c1)) code |= (1L << j)
        if (c2 > 0.0 || java.lang.Double.isNaN(c2)) code |= (1L << (j + 16))
      }
      j += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val vc = ctx.freshName("vc")
      val vd = ctx.freshName("vd")
      val c1 = ctx.freshName("c1")
      val c2 = ctx.freshName("c2")
      val c1Expr = if (hiHalf) s"(($va - $vb) - $vc) + $vd" else s"(($va - $vb) + $vc) - $vd"
      val c2Expr = if (hiHalf) s"(($va + $vb) + $vc) + $vd" else s"(($va + $vb) - $vc) - $vd"
      s"""
         |int $n = $a.numElements();
         |long $code = 0L;
         |for (int $j = 0; $j < 16; $j++) {
         |  if ($j + 48 < $n && !$a.isNullAt($j) && !$a.isNullAt($j + 16)
         |      && !$a.isNullAt($j + 32) && !$a.isNullAt($j + 48)) {
         |    double $va = (double) $a.$get($j);
         |    double $vb = (double) $a.$get($j + 16);
         |    double $vc = (double) $a.$get($j + 32);
         |    double $vd = (double) $a.$get($j + 48);
         |    double $c1 = $c1Expr;
         |    double $c2 = $c2Expr;
         |    if ($c1 > 0.0 || Double.isNaN($c1)) $code |= (1L << $j);
         |    if ($c2 > 0.0 || Double.isNaN($c2)) $code |= (1L << ($j + 16));
         |  }
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignCodeHalf =
    copy(child = c)
}

object VectorFunctions {
  private def expr(c: Column) = ColumnBridge.expression(c)
  private def toCol(e: Expression): Column = ColumnBridge.column(e)

  /** Codegen'd sign-code half (see [[SignCodeHalf]]). */
  def signCodeHalf(v: Column, hiHalf: Boolean): Column =
    toCol(SignCodeHalf(expr(v), hiHalf))

  /** Codegen'd dot product; summation order identical to a left fold. */
  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(expr(a), expr(b)))

  /** Codegen'd nearest-center argmin (see [[NearestCenter]]):
    * `struct(d2, code)` of the closest center to the
    * `[offset, offset+length)` window of `v`.
    */
  def nearestCenter(v: Column, offset: Int, length: Int,
      centers: Seq[Array[Double]]): Column =
    toCol(NearestCenter(expr(v), offset, length,
      centers.map(_.toIndexedSeq).toIndexedSeq))

  /** Codegen'd sorted top-p center selection (see [[NearestCenters]]):
    * `array<struct<d2, cell>>` of the `p` nearest centers, ascending
    * (d2, cell) — the IVF probe-side selector.
    */
  def nearestCenters(v: Column, offset: Int, length: Int,
      centers: Seq[Array[Double]], p: Int): Column =
    toCol(NearestCenters(expr(v), offset, length,
      centers.map(_.toIndexedSeq).toIndexedSeq, p))

  /** Codegen'd full distance table (see [[CenterDistances]]):
    * `array<double>` of all K clamped d2 values, indexed by center —
    * the PQ ADC lookup table.
    */
  def centerDistances(v: Column, offset: Int, length: Int,
      centers: Seq[Array[Double]]): Column =
    toCol(CenterDistances(expr(v), offset, length,
      centers.map(_.toIndexedSeq).toIndexedSeq))
}
