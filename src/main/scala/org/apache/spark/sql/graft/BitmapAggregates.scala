package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Growable uncompressed bitmap over non-negative long keys — the
  * aggregation buffer for [[LongBitmap]] / [[BitmapOrCardinality]].
  * Sized for DENSE, dictionary-encoded id spaces (graph vertex ids,
  * enumerated entity keys): one bit per key up to the max key seen, so a
  * 1M-key space costs 125 KB per group regardless of how many elements
  * land in it. For sparse / wide key spaces (raw 64-bit hashes), use
  * [[DistinctLongUnionCount]] instead — its hash-set buffer is
  * cardinality-bounded, not range-bounded. A compressed (roaring-style)
  * bitmap is the production middle ground; this uncompressed form keeps
  * the inner loops branch-free.
  */
final class Bitmap(initialWords: Int = 8) {
  var words: Array[Long] = new Array[Long](math.max(initialWords, 1))

  private def ensureWords(n: Int): Unit =
    if (n > words.length) {
      // n is bounded by MaxKey/64 + 1 (set() guards the key range), so
      // n * 2 - 1 cannot overflow Int here.
      val grown = new Array[Long](Integer.highestOneBit(n * 2 - 1))
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }

  def set(v: Long): Unit = {
    // Hard key-range guard, not a silent wrap: beyond 2^31 the word index
    // `(v >>> 6).toInt` would truncate and ALIAS large keys onto small ones
    // (v = 2^38 lands on word 0 — silently wrong distinct counts), and even
    // in-range multi-GB buffers signal the wrong data structure. The bitmap
    // is for DENSE dictionary-encoded id spaces; fail fast and point sparse
    // 64-bit keyspaces at the cardinality-bounded alternative.
    require(v >= 0 && v < Bitmap.MaxKey,
      s"graft_bitmap keys must be in [0, ${Bitmap.MaxKey}) — got $v. " +
        "For sparse or hashed 64-bit keyspaces use graft_distinct_union_count " +
        "(DistinctLongUnionCount): its buffer is bounded by cardinality, not key range.")
    val w = (v >>> 6).toInt
    ensureWords(w + 1)
    words(w) |= 1L << (v & 63L)
  }

  def or(other: Array[Long], len: Int): Unit = {
    ensureWords(len)
    var i = 0
    while (i < len) { words(i) |= other(i); i += 1 }
  }

  def cardinality: Long = {
    var c = 0L
    var i = 0
    while (i < words.length) { c += java.lang.Long.bitCount(words(i)); i += 1 }
    c
  }

  /** Words up to the last non-zero one — the serialized form. */
  def usedWords: Int = {
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    n
  }
}

object Bitmap {
  /** Exclusive upper bound on bitmap keys: 2^31 keeps the word index an
    * exact Int (no truncation aliasing) and caps the per-group buffer at
    * 256 MB even in the worst case.
    */
  val MaxKey: Long = 1L << 31
}

private[graft] trait BitmapAggBase extends TypedImperativeAggregate[Bitmap] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Bitmap = new Bitmap()

  override def merge(buffer: Bitmap, other: Bitmap): Bitmap = {
    buffer.or(other.words, other.usedWords)
    buffer
  }

  override def eval(buffer: Bitmap): Any = serialize(buffer)

  override def serialize(buffer: Bitmap): Array[Byte] = {
    val n = buffer.usedWords
    val bb = java.nio.ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putLong(buffer.words(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Bitmap = {
    val n = bytes.length / 8
    val bm = new Bitmap(math.max(n, 1))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < n) { bm.words(i) = bb.getLong; i += 1 }
    bm
  }
}

/** `bitmap(key)` — aggregates non-negative long keys into a serialized
  * bitmap (`binary`: little-endian-ordered 64-bit words, trailing zero
  * words trimmed). The set-valued half of the bitmap semiring: build one
  * bitmap per group, then compose with [[BitmapOrCardinality]] (or any
  * word-wise operator) instead of re-touching elements. Partial
  * aggregation ORs map-side, so the shuffle carries one bitmap per
  * (group, partition) — bounded by key range, not by input rows.
  */
case class LongBitmap(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BitmapAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def prettyName: String = "graft_bitmap"
  override def children: Seq[Expression] = Seq(child)

  override def update(buffer: Bitmap, input: InternalRow): Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.set(v.asInstanceOf[Long])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongBitmap =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongBitmap =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bitmap_or_count(bm)` — ORs serialized bitmaps (the [[LongBitmap]]
  * binary form) across a group and returns the cardinality of the union.
  * The reduce half of the bitmap semiring: distinct-union counting where
  * every merge is a word-wise OR (64 keys per instruction) instead of a
  * per-element hash probe. Two-hop neighborhood counts drop from
  * Θ(Σ deg²) hash inserts to Θ(E · |words|) ORs.
  */
case class BitmapOrCardinality(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BitmapAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_or_count"
  override def children: Seq[Expression] = Seq(child)

  override def update(buffer: Bitmap, input: InternalRow): Bitmap = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      val n = bytes.length / 8
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val incoming = new Array[Long](n)
      var i = 0
      while (i < n) { incoming(i) = bb.getLong; i += 1 }
      buffer.or(incoming, n)
    }
    buffer
  }

  override def eval(buffer: Bitmap): Any = buffer.cardinality

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrCardinality =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrCardinality =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Column wrappers for the bitmap semiring aggregates. */
object BitmapAggregates {
  /** Aggregate non-negative long keys into a serialized bitmap. */
  def bitmapOfLongs(key: Column): Column =
    ExpressionUtils.column(
      LongBitmap(ExpressionUtils.expression(key)).toAggregateExpression())

  /** OR serialized bitmaps across the group; return |union|. */
  def bitmapOrCount(bitmap: Column): Column =
    ExpressionUtils.column(
      BitmapOrCardinality(ExpressionUtils.expression(bitmap)).toAggregateExpression())
}
