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
  * and produces BIT-IDENTICAL values on every well-defined input (all
  * valid UTF-8, and every malformed shape except a truncated tail —
  * see [[CodepointAtHelper]] for why that one case was an
  * out-of-bounds read in the old chain and is deliberately not
  * preserved). Every hash gate stays green; the phash/audio
  * derivation versions are bumped once (`cpsamp3`) so pre-swap stores
  * rebuild rather than relying on parity that malformed corpora
  * cannot guarantee.
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
  *
  * Bit-parity contract with the old chain, INCLUDING malformed UTF-8
  * (parquet does not validate string bytes, so a corpus CAN carry
  * invalid sequences): the old chain's `encode(substr(...), 'utf-8')`
  * round-tripped the character slot's raw bytes through a java
  * String, so an invalid sequence became U+FFFD replacement char(s)
  * BEFORE the arithmetic (e.g. a lone 0xC3 lead byte decoded to
  * 0xFFFD, not 195). Strictly valid sequences (the entirety of real
  * text) take the allocation-free fast path, whose raw decode equals
  * the round-trip by construction; anything invalid — wrong
  * continuation bytes, overlong encoding, surrogate range, beyond
  * U+10FFFF, legacy 5/6-byte lead — falls back to the old chain's
  * exact semantics: round-trip the slot's bytes through String and
  * apply the same CASE-by-encoded-length arithmetic
  * (CodepointMalformedSpec pins parity stream by stream against the
  * retired chain run verbatim).
  *
  * ONE deliberate divergence: a multi-byte lead TRUNCATED at the end
  * of the string. There `UTF8String.substring`'s byte walk oversteps
  * `numBytes` and copies the lead's full claimed width — i.e. the old
  * chain read bytes PAST the string into adjacent buffer memory
  * (reproducibly a 0x00 for heap-backed literals, arbitrary for
  * arena-backed parquet pages). That is an out-of-bounds read, not a
  * semantic to preserve; this expression clamps to the available
  * bytes (a truncated tail decodes like the other malformed shapes,
  * typically to 0xFFFD). Because of exactly this case the phash/audio
  * derivation versions were bumped (`cpsamp` → `cpsamp3`) instead of
  * claiming store-level bit-identity on malformed corpora.
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
    def cont(k: Int): Boolean = (s.getByte(i + k) & 0xC0) == 0x80
    def b(k: Int): Long = (s.getByte(i + k) & 0xFF) % 64
    // strict validity ⇒ raw decode == the round-trip decode
    if (width == 1 && b0 < 0x80) return b0.toLong
    if (avail == width) width match {
      case 2 if b0 >= 0xC2 && b0 <= 0xDF && cont(1) =>
        return (b0 % 32).toLong * 64L + b(1)
      case 3 if cont(1) && cont(2) =>
        val cp = (b0 % 16).toLong * 4096L + b(1) * 64L + b(2)
        // reject overlong (< U+0800) and the surrogate range
        if (cp >= 0x800L && !(cp >= 0xD800L && cp <= 0xDFFFL)) return cp
      case 4 if cont(1) && cont(2) && cont(3) =>
        val cp = (b0 % 8).toLong * 262144L + b(1) * 4096L + b(2) * 64L + b(3)
        if (cp >= 0x10000L && cp <= 0x10FFFFL) return cp
      case _ => ()
    }
    // malformed: the old chain's exact path — String round-trip, then
    // the CASE-by-encoded-byte-length arithmetic (ELSE arm reads the
    // first 4 bytes whatever the length)
    val raw = new Array[Byte](avail)
    var k = 0
    while (k < avail) { raw(k) = s.getByte(i + k); k += 1 }
    val enc = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def e(k: Int): Long = (enc(k) & 0xFF) % 64
    enc.length match {
      case 0 => -1L // conv('') is NULL in the old chain
      case 1 => (enc(0) & 0xFF).toLong
      case 2 => ((enc(0) & 0xFF) % 32).toLong * 64L + e(1)
      case 3 => ((enc(0) & 0xFF) % 16).toLong * 4096L + e(1) * 64L + e(2)
      case _ => ((enc(0) & 0xFF) % 8).toLong * 262144L + e(1) * 4096L + e(2) * 64L + e(3)
    }
  }
}
