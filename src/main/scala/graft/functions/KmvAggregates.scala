package graft.functions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) sketch as a native Catalyst AGGREGATE: keep
  * the k smallest DISTINCT hash values per group. This is the true
  * mergeable-sketch execution shape — O(k) aggregation state, map-side
  * partials, merge = set union + trim — so the shuffle carries at most
  * k longs per group per partition, never one row per distinct value.
  *
  * vs the window formulation (dedup + rank + filter): that shape
  * shuffles EVERY distinct hash before discarding all but k of them —
  * fine when a deduped relation is needed anyway (q_kmv_distinct
  * reports the exact count alongside), pure waste when only the sketch
  * is wanted (q_profile_approx: 2× faster end-to-end after the swap).
  *
  * Output is the ascending array of kept hashes, so callers derive
  * `nk = size`, `kth = last element`, and the estimator stays the
  * shared [[graft.queries.SketchQueries.kmvEstimateOf]] formula. The
  * input hash is md5-derived (deterministic), so results — and the
  * DuckDB oracle — are independent of partitioning and merge order
  * (the k smallest distinct values of a set are order-free).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch needs k >= 1, got $k")
    else child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"kmv_sketch expects an integer hash, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def insert(buffer: JTreeSet[java.lang.Long], v: Long): Unit = {
    if (buffer.size() < k) buffer.add(v)
    else if (v < buffer.last()) {
      buffer.add(v)
      if (buffer.size() > k) buffer.pollLast()
    }
  }

  override def update(buffer: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      insert(buffer, v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      })
    }
    buffer
  }

  override def merge(buffer: JTreeSet[java.lang.Long], input: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = input.iterator()
    while (it.hasNext) insert(buffer, it.next().longValue())
    buffer
  }

  override def eval(buffer: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.size() * 8)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val set = new JTreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) set.add(bb.getLong())
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(child = c.head)

  override def prettyName: String = "kmv_sketch"
}

object KmvAggregates {

  /** One-pass bounded-state KMV sketch: the ascending array of the k
    * smallest distinct values of an integer hash column.
    */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash), k).toAggregateExpression())
}
