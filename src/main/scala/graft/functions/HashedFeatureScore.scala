package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Frozen-weights hashed-feature scoring (the fasttext-style linear
  * classifier margin): `bias + (Σ_f weights[h32(f) mod buckets]) / n`
  * over an `array<string>` feature column, where h32 is the engine's
  * md5-derived 32-bit hash (first 8 hex digits — `Dedup.h32`).
  *
  * Why an Expression: the Column form
  * (`aggregate(fs, 0.0, (acc, f) -> acc + element_at(w, h32(f)%B+1))`)
  * runs the whole md5→substring→conv chain INTERPRETED per token —
  * higher-order-function lambdas never compile — and at corpus scale
  * the classifier margin is pure per-token hashing. Here the stage
  * stays in whole-stage codegen and the per-row fold runs as compiled
  * JVM code with a thread-local digest.
  *
  * Bit-parity contract (the q_quality_classifier oracle rides on it):
  * JVM md5 over the UTF8String bytes equals Spark's `md5()`; the first
  * 8 hex digits are folded from the first 4 digest bytes exactly as
  * `conv(substring(hex, 1, 8), 16, 10)` parses them; the accumulation
  * is the same ascending left fold; the final shape is
  * `bias + (sum / n)` — one IEEE add of one IEEE division, identical
  * to the Column form it replaces. Sole divergence: an EMPTY feature
  * array yields NaN here where the ANSI-mode Column `Divide` raises —
  * unreachable from the classifier, whose `split` tokenization always
  * yields at least one element (ClassifierScoreSpec pins both facts).
  */
case class HashedFeatureScore(child: org.apache.spark.sql.catalyst.expressions.Expression,
    buckets: Int, weights: IndexedSeq[Double], bias: Double,
    withBigrams: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // withBigrams: the input is the TOKEN array and the feature sequence
  // is unigrams then adjacent "t1 t2" bigrams — the classifier's
  // featureList, built here from bytes without materializing the
  // intermediate string array (the Column featureList ran transform +
  // concat_ws interpreted per row)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_feature_score expects array<string>, got $t")
    }

  @transient private lazy val w: Array[Double] = weights.toArray

  /** The compiled per-row fold; called from both eval and the generated
    * code. Null elements null the whole score, matching the Column
    * fold's null propagation.
    */
  def score(a: ArrayData): Any = {
    val nToks = a.numElements()
    val digest = HashedFeatureScore.digests.get()
    def wOf(bytes: Array[Byte]): Double = {
      digest.reset()
      val d = digest.digest(bytes)
      // first 8 hex digits = first 4 bytes, big-endian unsigned
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      w((v % buckets).toInt)
    }
    var acc = 0.0
    var i = 0
    while (i < nToks) {
      if (a.isNullAt(i)) return null
      acc += wOf(a.getUTF8String(i).getBytes)
      i += 1
    }
    var n = nToks
    if (withBigrams && nToks >= 2) {
      n += nToks - 1
      var k = 0
      while (k < nToks - 1) {
        val b1 = a.getUTF8String(k).getBytes
        val b2 = a.getUTF8String(k + 1).getBytes
        val bytes = new Array[Byte](b1.length + 1 + b2.length)
        System.arraycopy(b1, 0, bytes, 0, b1.length)
        bytes(b1.length) = ' '
        System.arraycopy(b2, 0, bytes, b1.length + 1, b2.length)
        acc += wOf(bytes)
        k += 1
      }
    }
    bias + acc / n
  }

  override def nullSafeEval(a: Any): Any = score(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hfs", this, classOf[HashedFeatureScore].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.score($a);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): HashedFeatureScore =
    copy(child = c)
}

object HashedFeatureScore {
  /** The generated code may be shared across task threads in one JVM —
    * MessageDigest is stateful, so each thread folds with its own.
    */
  private[functions] val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Σ_t lookup[h32(t) mod buckets] over an `array<string>` column with
  * the lookup array arriving as a bound ATTRIBUTE (the DSIR pattern:
  * the smoothed likelihood-ratio array is computed on the single-row
  * broadcast side, so it reaches the per-token fold as a column, not a
  * literal). Same h32 (md5 first-8-hex) and the same ascending left
  * fold as the HOF `aggregate` it replaces — which evaluated the md5
  * chain interpreted per token; the caller divides by the token count
  * and rounds, exactly as before, so the oracle hash is unchanged.
  */
case class HashedBucketSum(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression, buckets: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_bucket_sum expects (array<string>, array<double>), got $l / $r")
    }

  def sumOf(toks: ArrayData, lookup: ArrayData): Any = {
    val n = toks.numElements()
    val nLookup = lookup.numElements()
    val digest = HashedFeatureScore.digests.get()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null token nulls the whole fold, like the HOF's null chain
      if (toks.isNullAt(i)) return null
      digest.reset()
      val d = digest.digest(toks.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      val idx = (v % buckets).toInt
      // the function is SQL-registered (graft_hashed_bucket_sum), so a
      // user-supplied lookup may be shorter than `buckets` or carry
      // nulls — an unchecked getDouble on UnsafeArrayData would read
      // out of bounds. element_at semantics: missing/null bucket nulls
      // the fold.
      if (idx >= nLookup || lookup.isNullAt(idx)) return null
      acc += lookup.getDouble(idx)
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    sumOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hbs", this, classOf[HashedBucketSum].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.sumOf($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): HashedBucketSum =
    copy(left = l, right = r)
}

/** h32(token) mod buckets per element — the per-document BUCKET STREAM
  * an incremental curation state stores so later scoring passes replay
  * the exact [[HashedBucketSum]] fold without re-reading text (1 small
  * int per token instead of the token bytes). Null token → null array,
  * precomputing the fold's null chain.
  */
case class HashedBuckets(child: org.apache.spark.sql.catalyst.expressions.Expression,
    buckets: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_buckets expects array<string>, got $t")
    }

  def bucketsOf(a: ArrayData): Any = {
    val n = a.numElements()
    val digest = HashedFeatureScore.digests.get()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      digest.reset()
      val d = digest.digest(a.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = (v % buckets).toInt
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = bucketsOf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hbk", this, classOf[HashedBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.bucketsOf($a);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed;
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): HashedBuckets =
    copy(child = c)
}

/** Σ lookup[bks[i]] — [[HashedBucketSum]]'s ascending left fold
  * replayed over a STORED bucket stream: same accumulation order, same
  * bounds and null handling, so the result is bit-identical to hashing
  * the tokens again — the contract that lets an incremental curation
  * pass re-weight history under a shifted corpus model without
  * touching text.
  */
case class BucketLookupSum(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_lookup_sum expects (array<int>, array<double>), got $l / $r")
    }

  def sumOf(bks: ArrayData, lookup: ArrayData): Any = {
    val n = bks.numElements()
    val nLookup = lookup.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (bks.isNullAt(i)) return null
      val idx = bks.getInt(i)
      if (idx >= nLookup || lookup.isNullAt(idx)) return null
      acc += lookup.getDouble(idx)
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    sumOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bls", this, classOf[BucketLookupSum].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = $self.sumOf($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): BucketLookupSum =
    copy(left = l, right = r)
}

object TextScoreFunctions {
  /** Codegen'd hashed-feature linear score (see [[HashedFeatureScore]]). */
  def hashedFeatureScore(features: Column, buckets: Int,
      weights: Seq[Double], bias: Double): Column =
    ColumnBridge.column(HashedFeatureScore(
      ColumnBridge.expression(features), buckets, weights.toIndexedSeq, bias))

  /** Token-array form: features = unigrams then adjacent bigrams,
    * hashed from bytes without materializing the feature strings.
    */
  def hashedTokenScore(tokens: Column, buckets: Int,
      weights: Seq[Double], bias: Double): Column =
    ColumnBridge.column(HashedFeatureScore(
      ColumnBridge.expression(tokens), buckets, weights.toIndexedSeq, bias,
      withBigrams = true))

  /** Per-token bucket stream h32(t) mod buckets (see [[HashedBuckets]]). */
  def hashedBuckets(tokens: Column, buckets: Int): Column =
    ColumnBridge.column(HashedBuckets(ColumnBridge.expression(tokens), buckets))

  /** Σ lookup[bks[i]] over a stored bucket stream (see [[BucketLookupSum]]). */
  def bucketLookupSum(bks: Column, lookup: Column): Column =
    ColumnBridge.column(BucketLookupSum(
      ColumnBridge.expression(bks), ColumnBridge.expression(lookup)))

  /** Codegen'd Σ lookup[h32(token) mod buckets] with the lookup array
    * as a bound column (see [[HashedBucketSum]]).
    */
  def hashedBucketSum(tokens: Column, lookup: Column, buckets: Int): Column =
    ColumnBridge.column(HashedBucketSum(
      ColumnBridge.expression(tokens), ColumnBridge.expression(lookup), buckets))
}
