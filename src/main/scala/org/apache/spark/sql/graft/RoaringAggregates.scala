package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** One 2^16-key slice of a [[RoaringSet]]: `bits == null` → sorted-array
  * mode over the first `n` entries of `arr`; else bitmap mode with `n`
  * tracking the set-bit count so cardinality never rescans.
  */
final class RoaringContainer {
  import RoaringSet.ArrayMax
  var n: Int = 0
  var arr: Array[Short] = new Array[Short](8)
  var bits: Array[Long] = null

  def add(low: Int): Boolean =
    if (bits != null) {
      val w = low >>> 6
      val m = 1L << (low & 63)
      if ((bits(w) & m) != 0L) false
      else { bits(w) |= m; n += 1; true }
    } else {
      val idx = search(low)
      if (idx >= 0) false
      else {
        if (n == ArrayMax) { promote(); add(low) }
        else {
          val at = -idx - 1
          if (n == arr.length) {
            val grown = new Array[Short](arr.length * 2)
            System.arraycopy(arr, 0, grown, 0, n)
            arr = grown
          }
          System.arraycopy(arr, at, arr, at + 1, n - at)
          arr(at) = low.toShort
          n += 1
          true
        }
      }
    }

  /** Binary search on the UNSIGNED short value (the array is kept in
    * unsigned order so serialization is canonical); returns the index
    * or `-(insertion point) - 1`.
    */
  private def search(low: Int): Int = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = arr(mid) & 0xffff
      if (v < low) lo = mid + 1
      else if (v > low) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  private def promote(): Unit = {
    bits = new Array[Long](1024)
    var i = 0
    while (i < n) {
      val v = arr(i) & 0xffff
      bits(v >>> 6) |= 1L << (v & 63)
      i += 1
    }
    arr = null
  }

  def mergeFrom(other: RoaringContainer): Unit =
    if (other.bits != null) {
      if (bits == null) promote()
      var i = 0
      var c = 0
      while (i < 1024) {
        bits(i) |= other.bits(i)
        c += java.lang.Long.bitCount(bits(i))
        i += 1
      }
      n = c
    } else {
      var i = 0
      while (i < other.n) { add(other.arr(i) & 0xffff); i += 1 }
    }

  /** Size of the intersection with `other`, without materializing it:
    * bitmap×bitmap is a popcount of ANDed words, array×bitmap probes
    * bits, array×array is a sorted merge-walk.
    */
  def intersectCount(other: RoaringContainer): Int =
    if (bits != null && other.bits != null) {
      var c = 0
      var i = 0
      while (i < 1024) { c += java.lang.Long.bitCount(bits(i) & other.bits(i)); i += 1 }
      c
    } else if (bits != null) other.intersectCount(this)
    else if (other.bits != null) {
      var c = 0
      var i = 0
      while (i < n) {
        val v = arr(i) & 0xffff
        if ((other.bits(v >>> 6) & (1L << (v & 63))) != 0L) c += 1
        i += 1
      }
      c
    } else {
      var c = 0
      var i = 0
      var j = 0
      while (i < n && j < other.n) {
        val a = arr(i) & 0xffff
        val b = other.arr(j) & 0xffff
        if (a < b) i += 1
        else if (a > b) j += 1
        else { c += 1; i += 1; j += 1 }
      }
      c
    }

  def foreachSet(f: Int => Unit): Unit =
    if (bits != null) {
      var w = 0
      while (w < 1024) {
        var word = bits(w)
        while (word != 0L) {
          f(w * 64 + java.lang.Long.numberOfTrailingZeros(word))
          word &= word - 1L
        }
        w += 1
      }
    } else {
      var i = 0
      while (i < n) { f(arr(i) & 0xffff); i += 1 }
    }

  def serializedSize: Int = 13 + (if (bits != null) 8192 else 2 * n)
}

/** Compressed (roaring-style) bitmap over 64-bit keys — the production
  * middle ground the dense [[Bitmap]] scaladoc points at: containers of
  * 2^16 keys addressed by the high 48 bits, each container either a
  * sorted short array (≤ [[RoaringSet.ArrayMax]] elements, 2 bytes each)
  * or a 1024-word bitmap (8 KB flat), promoted exactly at the crossover
  * where the bitmap becomes smaller. Memory therefore tracks the DATA —
  * clustered ids cost ~1 bit each, sparse stragglers ~2 bytes each —
  * instead of the key RANGE (dense [[Bitmap]]: range-bound, rejects keys
  * ≥ 2^31) or paying 8 bytes + load-factor slack per element
  * ([[LongSet]]: right for hashed keyspaces, 4–8× larger for id-shaped
  * ones). Negative keys land in high containers via the unsigned split;
  * the full signed-long domain is accepted. `merge` may alias the other
  * set's containers (safe on Spark's partial-merge path, where the
  * merged-from buffer is never touched again).
  */
final class RoaringSet {
  val containers = new scala.collection.mutable.LongMap[RoaringContainer]()

  def add(v: Long): Unit = {
    val key = v >>> 16
    val c = containers.getOrNull(key)
    val target =
      if (c != null) c
      else {
        val fresh = new RoaringContainer
        containers.update(key, fresh)
        fresh
      }
    target.add((v & 0xffffL).toInt)
    ()
  }

  def merge(other: RoaringSet): Unit =
    other.containers.foreachEntry { (key, oc) =>
      val c = containers.getOrNull(key)
      if (c == null) containers.update(key, oc)
      else c.mergeFrom(oc)
    }

  def cardinality: Long = {
    var total = 0L
    containers.foreachValue(total += _.n)
    total
  }

  /** |this ∩ other| — container-wise, touching only shared keys. */
  def intersectCardinality(other: RoaringSet): Long = {
    val (small, big) =
      if (containers.size <= other.containers.size) (this, other) else (other, this)
    var total = 0L
    small.containers.foreachEntry { (key, c) =>
      val oc = big.containers.getOrNull(key)
      if (oc != null) total += c.intersectCount(oc)
    }
    total
  }

  /** Canonical byte form: containers in ascending unsigned-key order,
    * each as `[key:8][mode:1][n:4][payload]` (array: n unsigned shorts in
    * order; bitmap: 1024 big-endian words) under a container-count
    * header. Canonical ordering makes the bytes a pure function of the
    * SET, so buffer bytes can be compared across partial/merge paths in
    * tests.
    */
  def serialize(): Array[Byte] = {
    var size = 4
    containers.foreachValue(size += _.serializedSize)
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(containers.size)
    containers.keys.toArray.sorted.foreach { key =>
      val c = containers(key)
      bb.putLong(key)
      if (c.bits != null) {
        bb.put(1: Byte).putInt(c.n)
        var i = 0
        while (i < 1024) { bb.putLong(c.bits(i)); i += 1 }
      } else {
        bb.put(0: Byte).putInt(c.n)
        var i = 0
        while (i < c.n) { bb.putShort(c.arr(i)); i += 1 }
      }
    }
    bb.array()
  }
}

object RoaringSet {
  /** Array→bitmap crossover: past 4096 elements the 8 KB bitmap is the
    * smaller representation (4096 × 2 bytes = 8 KB) — the classic
    * roaring threshold.
    */
  val ArrayMax = 4096

  def deserialize(bytes: Array[Byte]): RoaringSet = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val set = new RoaringSet
    val nc = bb.getInt
    var ci = 0
    while (ci < nc) {
      val key = bb.getLong
      val mode = bb.get
      val n = bb.getInt
      val c = new RoaringContainer
      c.n = n
      if (mode == 1) {
        c.bits = new Array[Long](1024)
        c.arr = null
        var i = 0
        while (i < 1024) { c.bits(i) = bb.getLong; i += 1 }
      } else {
        c.arr = new Array[Short](math.max(n, 8))
        var i = 0
        while (i < n) { c.arr(i) = bb.getShort; i += 1 }
      }
      set.containers.update(key, c)
      ci += 1
    }
    set
  }
}

/** `graft_roaring_distinct(key)` — EXACT distinct count of long keys via
  * a [[RoaringSet]] buffer. The reason this exists as an aggregate (vs
  * `count(distinct ...)`): Spark plans N distinct aggregates in one
  * `GROUP BY` through an `Expand` that replicates every input row N
  * times before the first aggregate — at 100 TB that triples (or worse)
  * the bytes entering the first shuffle. A set-buffer aggregate needs no
  * rewrite: each distinct column rides the SAME single pass, map-side
  * partials dedupe before the shuffle (one compressed set per group per
  * partition), and the merge is container-wise union. Pair with
  * `approx_count_distinct` the way g4 does: HLL when ±2% is fine, this
  * when the count must be exact (the same escalation boundary, one
  * swap). Reference behavior: the loader logs per-type entity/relation
  * tallies after each import stage (mysql2neo4j.py:248-253,358-363);
  * the multi-distinct stat block generalizes those tallies to one scan.
  */
case class RoaringDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RoaringSet] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_roaring_distinct"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): RoaringSet = new RoaringSet

  override def update(buffer: RoaringSet, input: InternalRow): RoaringSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: RoaringSet, other: RoaringSet): RoaringSet = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: RoaringSet): Any = buffer.cardinality

  override def serialize(buffer: RoaringSet): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): RoaringSet =
    RoaringSet.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RoaringDistinctCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RoaringDistinctCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_roaring_set(key)` — the SET ITSELF as a canonical binary blob
  * (the [[RoaringSet.serialize]] byte form): what a PERSISTED exact
  * rollup stores per cell, so later range queries union blobs instead of
  * rescanning raw rows — [[RoaringDistinctCount]]'s buffer made into a
  * first-class mergeable value, exactly as `hll_sketch_agg` is to
  * `approx_count_distinct`. Serialization is canonical (containers in
  * unsigned-key order, array/bitmap mode a pure function of container
  * cardinality), so equal sets produce equal bytes — append-vs-rebuild
  * comparisons are bit-exact.
  */
case class RoaringSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RoaringSet] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_roaring_set"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): RoaringSet = new RoaringSet

  override def update(buffer: RoaringSet, input: InternalRow): RoaringSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: RoaringSet, other: RoaringSet): RoaringSet = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: RoaringSet): Any = buffer.serialize()

  override def serialize(buffer: RoaringSet): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): RoaringSet =
    RoaringSet.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RoaringSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RoaringSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_roaring_union(blob)` — EXACT distinct count of the union of
  * [[RoaringSetAgg]] blobs: the query side of the exact rollup. Union of
  * exact sets is lossless by definition, so a rollup queried through
  * this aggregate answers IDENTICALLY to counting the raw rows — the
  * blobs only change the COST (O(cells) small binaries vs O(rows)), the
  * same contract `hll_union_agg` offers with an error bar and this
  * offers without one.
  */
case class RoaringBlobUnionCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RoaringSet] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_roaring_union"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): RoaringSet = new RoaringSet

  override def update(buffer: RoaringSet, input: InternalRow): RoaringSet = {
    val v = child.eval(input)
    // Deserialize allocates fresh containers, so the aliasing merge is
    // safe — nothing else holds them.
    if (v != null) buffer.merge(RoaringSet.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: RoaringSet, other: RoaringSet): RoaringSet = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: RoaringSet): Any = buffer.cardinality

  override def serialize(buffer: RoaringSet): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): RoaringSet =
    RoaringSet.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RoaringBlobUnionCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RoaringBlobUnionCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_roaring_union_blob(blob)` — union of [[RoaringSetAgg]] blobs
  * AS A BLOB: the rollup-maintenance sibling of [[RoaringBlobUnionCount]]
  * (count out). Folding daily cells into weekly/monthly cells, or the two
  * sides of a cohort comparison, stays inside the canonical serialized
  * form — so set ALGEBRA (intersection, difference via [[RoaringOps]])
  * can run on the unioned results without ever touching raw rows.
  */
case class RoaringBlobUnionBlob(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RoaringSet] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_roaring_union_blob"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): RoaringSet = new RoaringSet

  override def update(buffer: RoaringSet, input: InternalRow): RoaringSet = {
    val v = child.eval(input)
    if (v != null) buffer.merge(RoaringSet.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: RoaringSet, other: RoaringSet): RoaringSet = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: RoaringSet): Any = buffer.serialize()

  override def serialize(buffer: RoaringSet): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): RoaringSet =
    RoaringSet.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RoaringBlobUnionBlob =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RoaringBlobUnionBlob =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Static kernels for the scalar roaring expressions — public so
  * generated code can call them by name.
  */
object RoaringOps {
  def cardinality(blob: Array[Byte]): Long =
    RoaringSet.deserialize(blob).cardinality

  def andCount(a: Array[Byte], b: Array[Byte]): Long =
    RoaringSet.deserialize(a).intersectCardinality(RoaringSet.deserialize(b))
}

/** `graft_roaring_card(blob)` — exact cardinality of one stored blob. */
case class RoaringBlobCardinality(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_roaring_card"

  override protected def nullSafeEval(input: Any): Any =
    RoaringOps.cardinality(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graft.RoaringOps.cardinality($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_roaring_and(a, b)` — EXACT |A ∩ B| of two stored blobs, the
  * set-algebra query face of the exact rollup: returning-user /
  * retention / overlap questions answered from two range-union blobs
  * without rescanning raw rows. Difference needs no third kernel —
  * |A ∖ B| = |A| − |A ∩ B| with both terms exact.
  */
case class RoaringBlobAndCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_roaring_and"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RoaringOps.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.RoaringOps.andCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column wrappers for the roaring aggregates. */
object RoaringAggregates {
  /** Exact distinct count of long keys; compressed-set buffer. */
  def roaringDistinctCount(key: Column): Column =
    ExpressionUtils.column(
      RoaringDistinctCount(ExpressionUtils.expression(key)).toAggregateExpression())

  /** The set itself as a canonical mergeable blob (rollup storage form). */
  def roaringSetAgg(key: Column): Column =
    ExpressionUtils.column(
      RoaringSetAgg(ExpressionUtils.expression(key)).toAggregateExpression())

  /** Exact distinct count of a union of stored blobs (rollup query form). */
  def roaringBlobUnionCount(blob: Column): Column =
    ExpressionUtils.column(
      RoaringBlobUnionCount(ExpressionUtils.expression(blob)).toAggregateExpression())

  /** Union of stored blobs as a blob (rollup maintenance / cohort side). */
  def roaringBlobUnionBlob(blob: Column): Column =
    ExpressionUtils.column(
      RoaringBlobUnionBlob(ExpressionUtils.expression(blob)).toAggregateExpression())

  /** Exact cardinality of one stored blob. */
  def roaringBlobCardinality(blob: Column): Column =
    ExpressionUtils.column(RoaringBlobCardinality(ExpressionUtils.expression(blob)))

  /** Exact |A ∩ B| of two stored blobs. */
  def roaringBlobAndCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      RoaringBlobAndCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
