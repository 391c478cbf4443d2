package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Size-capped `collect_list` over BIGINT — the one-pass building block for
 * inverted-index pair generation (r17 optimization of
 * [[graft.pipeline.Dedup.ngramJaccardPairs]]).
 *
 * Semantics: collects the group's values like `collect_list`, but stops
 * RETAINING values once the buffer holds `cap + 1` of them, so a group's
 * state is bounded at (cap+1)·8 bytes however large the group is. The
 * result array is sorted ascending when the group size is ≤ cap (a
 * deterministic, partitioning-independent posting list); any group that
 * overflowed returns exactly cap+1 values — an OVERFLOW MARKER whose
 * contents are input-order-dependent, so callers MUST filter
 * `size(...) <= cap` (the df-pruning rule) before using list contents.
 *
 * Why not plain `collect_list` + `size` filter: a boilerplate shingle
 * appearing in 10M documents would materialize an 80 MB aggregation
 * buffer BEFORE the filter could drop it — the exact hot-key hazard the
 * old two-pass (df-aggregate + left_semi probe) shape existed to avoid.
 * This keeps the one-pass plan AND the bounded memory.
 */
case class BoundedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  require(cap >= 1, s"bounded_collect_long: cap must be >= 1, got $cap")

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(
      buf: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size <= cap) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(
      b1: scala.collection.mutable.ArrayBuffer[Long],
      b2: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < b2.length && b1.size <= cap) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any = {
    val arr = buf.toArray
    if (arr.length <= cap) java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    out.putInt(buf.size)
    buf.foreach(out.putLong)
    out.array()
  }

  override def deserialize(storageFormat: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val in = java.nio.ByteBuffer.wrap(storageFormat)
    val n = in.getInt()
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += in.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_long expects a BIGINT column, got ${child.dataType.catalogString}")
  override def prettyName: String = "bounded_collect_long"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}
