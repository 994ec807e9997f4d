package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register array as a native Catalyst AGGREGATE: per
  * group, the length-m array of register max-ranks M_j. This is the
  * canonical mergeable-sketch execution shape — O(m) fixed aggregation
  * state, map-side partials, merge = register-wise max — so the shuffle
  * carries at most m bytes per group per partition, never one row per
  * (group, register).
  *
  * Input is the 60-bit md5-derived hash the whole sketch family uses
  * (15 hex chars → long, see graft.queries.SketchQueries): register
  * j = hv mod m (low bits), remainder w = hv div m, and the rank is
  * `maxRank − bitlen(w)` with `maxRank = 60 − log2(m) + 1` (the
  * all-zero remainder scores maxRank) — EXACTLY the arithmetic of the
  * SQL-composable register relation, so swapping this aggregate into a
  * query changes the plan, never the result, and the DuckDB oracle is
  * unchanged.
  *
  * Empty registers eval to rank 0, which makes the exact-integer
  * harmonic numerator a single array fold: Σ 2^(maxRank − M_j) counts
  * 2^maxRank for every empty register automatically.
  */
case class HllSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (m < 2 || (m & (m - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(s"hll_sketch needs a power-of-two register count, got $m")
    else child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"hll_sketch expects an integer hash, got $t")
    }

  private val registerBits: Int = Integer.numberOfTrailingZeros(m)

  /** Rank of the all-zero remainder of a 60-bit hash. */
  private val maxRank: Int = 60 - registerBits + 1

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def insert(buffer: Array[Byte], hv: Long): Unit = {
    // floorMod/floorDiv keep the function total for out-of-contract
    // NEGATIVE inputs (the registered SQL function accepts any long):
    // a negative hash yields w < 0 -> rank <= 0 -> no register update,
    // instead of a negative array index
    val reg = java.lang.Math.floorMod(hv, m.toLong).toInt
    val w = java.lang.Math.floorDiv(hv, m.toLong)
    val rank =
      if (w == 0L) maxRank
      else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > buffer(reg)) buffer(reg) = rank.toByte
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      insert(buffer, v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      })
    }
    buffer
  }

  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (input(i) > buffer(i)) buffer(i) = input(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buffer(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  // defensive copy: the input bytes may alias a reused row buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketch =
    copy(child = c.head)

  override def prettyName: String = "hll_sketch"
}

object HllAggregates {

  /** One-pass bounded-state HLL register array over an md5-derived
    * 60-bit hash column.
    */
  def hllSketch(hash: Column, m: Int): Column =
    ColumnBridge.column(
      HllSketch(ColumnBridge.expression(hash), m).toAggregateExpression())
}
