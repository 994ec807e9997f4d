package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string expressions for the sampling lanes.
  *
  * [[CodepointAt]] replaces the round-13 pure-built-in codepoint
  * sampler (`substr` → `encode(_, 'utf-8')` → `hex` → a 4-arm CASE of
  * `conv` folds, the old `Dedup.sampleCodepointExprSql` body): that
  * chain bought multilingual correctness but at ~3× the live-ingest
  * cost (`q_phash_ingest_gate` 0.78 → 2.39 s), because every sampled
  * position allocated a 1-char UTF8String copy, a byte-array encode, a
  * hex string, and four `conv` string-to-long parses. This expression
  * does one bounded byte walk per sample — no intermediate strings —
  * and produces BIT-IDENTICAL values (same UTF-8 arithmetic, same
  * clamped-tail behavior on malformed input, NULL on the same inputs),
  * so the DatasetStore-memoized phash/audio codes and every hash gate
  * stay valid without a derivation-version bump.
  */

/** The Unicode CODEPOINT of the character at 1-based CHARACTER position
  * `pos` of `text` — the native form of DuckDB's
  * `unicode(substr(text, pos, 1))`.
  *
  * Positions count codepoints exactly as Spark's `substr` does (an
  * astral-plane character is ONE position, never a split surrogate
  * pair). Out-of-range `pos` (< 1 or past the last character) yields
  * NULL, matching the old chain (`conv('')` is NULL). A malformed
  * UTF-8 tail decodes from the available bytes with the same
  * modulo arithmetic the CASE arms applied — deterministic garbage in,
  * the IDENTICAL deterministic garbage out.
  *
  * Reference context: sarkac samples nothing (its values arrive as
  * JSON numbers); this is the container's stand-in decoder for the
  * audio/image lanes (see `Audio.landmarksOf`, `Multimodal
  * .phashCodesOf`), which a production deployment replaces with a real
  * PCM/pixel decoder.
  */
case class CodepointAt(text: Expression, pos: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = pos

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (text.dataType, pos.dataType) match {
      case (StringType, IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (t, p) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_codepoint expects (string, int|bigint), got ($t, $p)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def prettyName: String = "graft_codepoint"

  override def nullSafeEval(t: Any, p: Any): Any = {
    val posL = p match { case i: Int => i.toLong; case l: Long => l }
    val v = CodepointAtHelper.eval(t.asInstanceOf[UTF8String], posL)
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => {
      val v = ctx.freshName("cp")
      s"""
         |long $v = graft.functions.CodepointAtHelper.eval($s, $p);
         |if ($v < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CodepointAt =
    copy(text = l, pos = r)
}

/** Shared interpreted/codegen kernel (static forwarder — janino calls
  * it as a plain static method). Returns -1 for out-of-range, which the
  * expression maps to NULL (-1 is unreachable as a real codepoint).
  */
object CodepointAtHelper {
  def eval(s: UTF8String, pos: Long): Long = {
    if (pos < 1L) return -1L
    val n = s.numBytes()
    var i = 0
    var c = 1L
    while (i < n && c < pos) {
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
      c += 1
    }
    if (i >= n || c < pos) return -1L
    val b0 = s.getByte(i) & 0xFF
    val width = UTF8String.numBytesForFirstByte(s.getByte(i))
    val avail = math.min(width, n - i)
    // the exact CASE-by-encoded-length arithmetic of the old SQL chain:
    // lead-byte modulus by width, continuation bytes mod 64
    def cont(k: Int): Long = (s.getByte(i + k) & 0xFF) % 64
    avail match {
      case 1 => b0.toLong
      case 2 => (b0 % 32).toLong * 64L + cont(1)
      case 3 => (b0 % 16).toLong * 4096L + cont(1) * 64L + cont(2)
      case _ => (b0 % 8).toLong * 262144L + cont(1) * 4096L + cont(2) * 64L + cont(3)
    }
  }
}
