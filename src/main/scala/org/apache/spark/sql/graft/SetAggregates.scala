package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Minimal open-addressed hash set of longs (power-of-two capacity,
  * linear probing) — the aggregation buffer for
  * [[DistinctLongUnionCount]]. 0 is stored via a sideband flag so the
  * table can use 0 as the empty marker.
  */
final class LongSet(initialCapacity: Int = 1 << 10) {
  private var capacity = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var table = new Array[Long](capacity)
  private var mask = capacity - 1
  private var n = 0
  private var hasZero = false

  def size: Int = n + (if (hasZero) 1 else 0)

  def add(v: Long): Unit = { addIfAbsent(v); () }

  /** Add `v`; true iff it was not already present. The boolean form lets
    * first-seen work (e.g. one md5 per DISTINCT gram in SimHashKernel)
    * key off the insertion without a second probe.
    */
  def addIfAbsent(v: Long): Boolean = {
    if (v == 0L) {
      val added = !hasZero
      hasZero = true
      return added
    }
    var idx = (java.lang.Long.hashCode(v * -7046029254386353131L) & mask)
    while (true) {
      val cur = table(idx)
      if (cur == 0L) {
        table(idx) = v
        n += 1
        if (n * 4 >= capacity * 3) grow()
        return true
      }
      if (cur == v) return false
      idx = (idx + 1) & mask
    }
    false // unreachable
  }

  private def grow(): Unit = {
    val old = table
    capacity <<= 1
    mask = capacity - 1
    table = new Array[Long](capacity)
    n = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
  }

  /** All elements (order unspecified) — for serialization. */
  def toArray: Array[Long] = {
    val out = new Array[Long](size)
    var w = 0
    if (hasZero) { out(w) = 0L; w += 1 }
    var i = 0
    while (i < table.length) {
      if (table(i) != 0L) { out(w) = table(i); w += 1 }
      i += 1
    }
    out
  }
}

/** Distinct-union cardinality of `array<long>` inputs — a
  * `TypedImperativeAggregate` whose buffer is a [[LongSet]], so
  * deduplication happens MAP-SIDE in the partial aggregate: the shuffle
  * carries one deduped element set per (group, partition) instead of the
  * concatenation of every input array. For union-of-neighbor-sets
  * queries (two-hop counts, audience overlap) that is the difference
  * between shuffling Θ(Σ|arrays|) elements and Θ(|distinct per
  * partition|) — and there is no flattened mega-array to garbage-collect.
  * This is the exact counterpart of a sketch: when approximate counts
  * suffice, swap in HLL; this operator is for when they must be exact.
  */
case class DistinctLongUnionCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongSet] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_distinct_union_count"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): LongSet = new LongSet()

  override def update(buffer: LongSet, input: InternalRow): LongSet = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val m = a.numElements()
      while (i < m) {
        buffer.add(a.getLong(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: LongSet, other: LongSet): LongSet = {
    val elems = other.toArray
    var i = 0
    while (i < elems.length) {
      buffer.add(elems(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: LongSet): Any = buffer.size.toLong

  override def serialize(buffer: LongSet): Array[Byte] = {
    val elems = buffer.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * elems.length)
    bb.putInt(elems.length)
    var i = 0
    while (i < elems.length) { bb.putLong(elems(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongSet = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val set = new LongSet(math.max(16, m * 2))
    var i = 0
    while (i < m) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctLongUnionCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctLongUnionCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SetAggregates {
  /** Aggregate-column wrapper for [[DistinctLongUnionCount]]. */
  def distinctLongUnionCount(arr: Column): Column =
    ExpressionUtils.column(
      DistinctLongUnionCount(ExpressionUtils.expression(arr)).toAggregateExpression())
}
