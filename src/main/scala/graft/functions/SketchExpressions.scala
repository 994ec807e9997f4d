package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native sketch expressions over ARRAY<LONG> hash columns.
  *
  * The composable forms — 32 `aggregate()` folds for SimHash, 16
  * `array_min(transform())` passes for a MinHash signature — evaluate
  * one interpreted lambda call per element per bit/permutation
  * (~50x the work). These expressions make one tight pass per row and
  * produce identical integer results, so DuckDB oracles are unchanged.
  */

/** 32-bit SimHash of an array of 32-bit hash values (as longs): bit k
  * is set iff the count of elements with bit k set exceeds half.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash32 expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < 32) {
        if (((h >> k) & 1L) == 1L) counts(k) += 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 32) {
      // bitSum = 2*count - n > 0  <=>  count > n/2
      if (2 * counts(k) - n > 0) out |= (1L << k)
      k += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < 32; $k++) {
         |    if ((($h >> $k) & 1L) == 1L) $counts[$k]++;
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < 32; $k++) {
         |  if (2 * $counts[$k] - $n > 0) $out |= (1L << $k);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(child = c)
}

/** MinHash signature: for each (a, b) permutation, min over elements of
  * (a * h + b) % p. Input elements must already be reduced mod p.
  * Returns ARRAY<LONG> of length perms.size.
  */
case class MinHashSignature(child: Expression, permA: Seq[Long], permB: Seq[Long], p: Long)
    extends UnaryExpression {

  require(permA.length == permB.length && permA.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash expects array<bigint>, got $t")
  }

  @transient private lazy val as = permA.toArray
  @transient private lazy val bs = permB.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = as.length
    val out = new Array[Long](m)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < m) {
        val v = (as(j) * h + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("permA", as, "long[]")
    val bArr = ctx.addReferenceObj("permB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |int $m = $aArr.length;
         |long[] $out = new long[$m];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $v = ($aArr[$j] * $h + $bArr[$j]) % ${p}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** N-gram polynomial hashes over a token-hash array: for each window of
  * `n` consecutive elements, the left fold `acc = (acc * b + t) % p`
  * starting at 0. Produces one hash per window (numElements - n + 1);
  * if the array is shorter than `n`, one hash over the whole array.
  * Replaces shingle-string construction + md5 with pure integer math —
  * no intermediate strings, one pass. Operands stay < 2^62 for
  * b, t < p = 2^31-1.
  */
case class NGramPolyHash(child: Expression, n: Int, b: Long, p: Long)
    extends UnaryExpression {

  require(n >= 1 && b > 0 && p > 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_poly_hash expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val windows = if (len < n) 1 else len - n + 1
    val width = if (len < n) len else n
    val out = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      var acc = 0L
      var j = 0
      while (j < width) {
        acc = (acc * b + arr.getLong(i + j)) % p
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val windows = ctx.freshName("windows")
      val width = ctx.freshName("width")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $len = $a.numElements();
         |int $windows = ($len < $n) ? 1 : ($len - $n + 1);
         |int $width = ($len < $n) ? $len : $n;
         |long[] $out = new long[$windows];
         |for (int $i = 0; $i < $windows; $i++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $width; $j++) {
         |    $acc = ($acc * ${b}L + $a.getLong($i + $j)) % ${p}L;
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NGramPolyHash = copy(child = c)
}

object SketchFunctions {
  def simhash32(hashes: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(hashes)))

  def minhashSignature(hashes: Column, perms: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(hashes), perms.map(_._1), perms.map(_._2), p))

  def ngramPolyHash(hashes: Column, n: Int, b: Long, p: Long): Column =
    ColumnBridge.column(NGramPolyHash(ColumnBridge.expression(hashes), n, b, p))
}
