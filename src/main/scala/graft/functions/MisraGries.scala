package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitter sketch as a native Catalyst
 * [[TypedImperativeAggregate]] — the (b)-tier extension for an aggregate
 * Spark's built-ins can't express: a ONE-PASS, bounded-memory (k−1
 * counters per partial) candidate set that PROVABLY contains every item
 * whose true frequency exceeds N/k, however the input is partitioned
 * (the classic deterministic frequent-items summary; merge per Agarwal
 * et al. 2013, "Mergeable Summaries" — union-add then subtract the k-th
 * largest count, which preserves the additive error bound).
 *
 * At 100 TB this replaces a full vocabulary shuffle with k-sized partial
 * buffers merged on one reducer: the heavy-hitter CANDIDATES come from
 * one scan, and an exact recount of just the candidates (broadcast-sized)
 * yields the exact answer — see `Curation.heavyHitters` for the two-pass
 * operator built on it.
 *
 * Guarantees (gated in SketchExprSpec): for every item x,
 * est(x) ≤ true(x) ≤ est(x) + N/k, and any x with true(x) > N/k is
 * present in the output. Estimates (not the guarantee) depend on input
 * order, so callers needing deterministic output recount exactly.
 */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"mg_topk: k must be >= 2, got $k")

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[UTF8String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(
      buf: scala.collection.mutable.HashMap[UTF8String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < k - 1 =>
          // clone: the incoming UTF8String may point into a reused row buffer
          buf.update(key.clone(), 1L)
        case None =>
          // decrement-all: each such event retires k counts total (k−1 from
          // the buffer + this arrival), so there are at most N/k events and
          // the amortized update cost stays O(1)
          val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (w, c) => if (c <= 0L) dead += w }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: scala.collection.mutable.HashMap[UTF8String, Long],
      b2: scala.collection.mutable.HashMap[UTF8String, Long]): scala.collection.mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (w, c) => b1.update(w, b1.getOrElse(w, 0L) + c) }
    if (b1.size > k - 1) {
      // subtract the k-th largest count from everything and drop the ≤0s:
      // at most k−1 survivors, error grows by exactly that count — the
      // mergeable-summaries bound (ε₁+ε₂ additive)
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      // subtract the k-th LARGEST: ≤ k−1 entries can exceed it, and the
      // combined mass is ≥ k·cut, so cut ≤ (N₁+N₂)/k — the error bound
      // stays additive across merges (Agarwal et al. 2013, Thm. 4.3 shape)
      val cut = counts(counts.length - k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (w, c) => if (c <= 0L) dead += w }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: scala.collection.mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic output ORDER (est desc, word asc) — the estimates
    // themselves are order-dependent by nature; exact callers recount
    val rows = buf.toArray.sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) => InternalRow(w, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: scala.collection.mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val bytes = w.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): scala.collection.mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      buf.update(UTF8String.fromBytes(bytes), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  // AbstractDataType is private[sql], so input typing is enforced here
  // instead of via ExpectsInputTypes
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a STRING column, got ${child.dataType.catalogString}")
  override def prettyName: String = "mg_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}
