package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items sketch (Misra–Gries / SpaceSaving family) as
  * a [[TypedImperativeAggregate]] — per-GROUP approximate top-k with
  * STATE BOUNDED AT `capacity` COUNTERS regardless of group size. The
  * exact formulation (explode → count → rank) shuffles every distinct
  * item; this sketch's partial states are fixed-size and merge
  * associatively, so the shuffle carries ≤ capacity counters per group —
  * the 100 TB shape for "top domains / tokens / user-agents per shard".
  *
  * Guarantees (standard Misra–Gries): any item with true frequency
  * > n/ (capacity+1) is present in the final state, and each reported
  * count is a lower bound within n/(capacity+1) of the true count.
  * Counts depend on partition/merge order within those bounds (inherent
  * to the sketch). With capacity >= the group's distinct-item count no
  * eviction ever fires and the sketch degenerates to exact counting —
  * deterministic, which is the regime q66 oracle-gates; the eviction
  * regime's guarantee is spec-gated instead (OpsSpec).
  *
  * eval returns the `k` most frequent tracked items as
  * array<struct<item string, cnt long>>, ordered (cnt desc, item asc).
  */
case class FrequentItemsSketch(
    child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if capacity >= k && k > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires capacity >= k > 0 (got capacity=$capacity, k=$k)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_freq"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Classic Misra–Gries step: increment a tracked counter, start
    * tracking while below capacity, otherwise decrement ALL counters
    * (dropping zeros) — the step that buys the frequency guarantee. */
  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String]
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1)
      case None if buf.size < capacity => buf.update(s.clone(), 1L)
      case None =>
        val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toArray
        buf.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable form (Agarwal et al.): sum counters, then if over
    * capacity subtract the (capacity+1)-largest count and drop
    * non-positive — preserves the Misra–Gries error bound. */
  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (s, c) => b1.update(s, b1.getOrElse(s, 0L) + c) }
    if (b1.size > capacity) {
      val counts = b1.values.toArray.sorted(Ordering[Long].reverse)
      val sub = counts(capacity) // (capacity+1)-th largest
      val dead = b1.iterator.filter(_._2 <= sub).map(_._1).toArray
      b1.mapValuesInPlace((_, c) => c - sub)
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toArray
      .sortBy { case (s, c) => (-c, s) } // cnt desc, item asc
      .take(k)
      .map { case (s, c) => InternalRow(s, c) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val bytes = s.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len); in.get(b)
      buf.update(UTF8String.fromBytes(b), in.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
