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

  /** OR a SERIALIZED bitmap (the big-endian word form [[BitmapAggBase
    * .serialize]] emits) into this one, assembling each word directly
    * from the bytes. The obvious decode-then-or allocates a temp long
    * array per call; in the two-hop aggregate that call sits on the
    * per-joined-row path, and at ~2 KB per bitmap the temp arrays alone
    * were gigabytes of young-gen churn per sweep — the GC pressure, not
    * the OR itself, was the measured cost.
    */
  def orBytes(bytes: Array[Byte]): Unit = {
    val n = bytes.length / 8
    ensureWords(n)
    var i = 0
    while (i < n) {
      val b = i * 8
      words(i) |=
        ((bytes(b) & 0xffL) << 56) | ((bytes(b + 1) & 0xffL) << 48) |
        ((bytes(b + 2) & 0xffL) << 40) | ((bytes(b + 3) & 0xffL) << 32) |
        ((bytes(b + 4) & 0xffL) << 24) | ((bytes(b + 5) & 0xffL) << 16) |
        ((bytes(b + 6) & 0xffL) << 8) | (bytes(b + 7) & 0xffL)
      i += 1
    }
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
    // In-place OR straight from the serialized bytes: this update runs
    // once per JOINED row in the shuffle-join two-hop path, so a temp
    // word-array here multiplies into per-sweep gigabytes of garbage.
    if (v != null) buffer.orBytes(v.asInstanceOf[Array[Byte]])
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

/** A dictionary of serialized bitmaps packed into ONE binary value:
  * `[n][offsets(n+1)][words]`, entry id → its word slice. This is the
  * collected middle-vertex side of a two-hop query in a form a scalar
  * expression can index — the whole table of supplier→customers bitmaps
  * rides to executors once (inside the serialized expression), instead
  * of being joined onto every edge row, which is what made the
  * join+aggregate formulation allocate a bitmap copy PER EDGE.
  */
object BitmapBlob {
  final class Decoded(
      val n: Int, val offsets: Array[Int], val words: Array[Long]) {
    /** Longest single entry, in words — sizes the per-row union scratch. */
    val maxWords: Int = {
      var m = 0
      var i = 0
      while (i < n) {
        val w = offsets(i + 1) - offsets(i)
        if (w > m) m = w
        i += 1
      }
      m
    }
  }

  /** Pack (id, serialized bitmap) pairs. Ids must be small non-negative
    * ints (the same dense-dictionary assumption the bitmap itself makes);
    * missing ids get empty slices.
    */
  def build(entries: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val n = if (entries.isEmpty) 0 else entries.map(_._1).max.toInt + 1
    val wordCount = new Array[Int](n)
    entries.foreach { case (id, b) => wordCount(id.toInt) = b.length / 8 }
    val offsets = new Array[Int](n + 1)
    var i = 0
    while (i < n) { offsets(i + 1) = offsets(i) + wordCount(i); i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + 4 * (n + 1) + 8 * offsets(n))
    bb.putInt(n)
    offsets.foreach(bb.putInt)
    entries.sortBy(_._1).foreach { case (_, b) => bb.put(b) }
    bb.array()
  }

  def decode(blob: Array[Byte]): Decoded = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    val n = bb.getInt
    val offsets = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { offsets(i) = bb.getInt; i += 1 }
    val words = new Array[Long](offsets(n))
    i = 0
    while (i < offsets(n)) { words(i) = bb.getLong; i += 1 }
    new Decoded(n, offsets, words)
  }
}

/** `blob_union_count(keys_bm, blob)` — for one row's key-set bitmap,
  * OR together the blob entries of every set key and return the union's
  * cardinality. The scalar-projection form of the two-hop semiring step:
  * with per-customer supplier bitmaps as rows and the supplier→customers
  * dictionary as the blob, one output row per CUSTOMER replaces one
  * joined row per EDGE — the E-proportional work is still done (every
  * set bit ORs its slice), but no per-edge bitmap copies are ever
  * materialized, shuffled, or garbage-collected. `blob` must be a
  * foldable binary (a [[org.apache.spark.sql.catalyst.expressions
  * .Literal]] built by [[BitmapBlob.build]]); it is decoded once per
  * task, not per row.
  */
case class BitmapBlobUnionCount(keys: Expression, blob: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def left: Expression = keys
  override def right: Expression = blob
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_blob_union_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (!blob.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "blob must be a foldable binary literal")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // Decoded once per deserialized expression instance (per task); the
  // scratch union buffer is reused across rows with a high-watermark
  // clear, so steady-state row cost allocates nothing but the incoming
  // key bytes Spark hands us.
  @transient private lazy val table: BitmapBlob.Decoded =
    BitmapBlob.decode(blob.eval(null).asInstanceOf[Array[Byte]])
  @transient private lazy val scratch: Array[Long] =
    new Array[Long](math.max(table.maxWords, 1))
  @transient private var usedWords: Int = 0

  def unionCount(keyBytes: Array[Byte]): Long = {
    val t = table
    java.util.Arrays.fill(scratch, 0, usedWords, 0L)
    usedWords = 0
    val nw = keyBytes.length / 8
    var wi = 0
    while (wi < nw) {
      val b = wi * 8
      var w =
        ((keyBytes(b) & 0xffL) << 56) | ((keyBytes(b + 1) & 0xffL) << 48) |
        ((keyBytes(b + 2) & 0xffL) << 40) | ((keyBytes(b + 3) & 0xffL) << 32) |
        ((keyBytes(b + 4) & 0xffL) << 24) | ((keyBytes(b + 5) & 0xffL) << 16) |
        ((keyBytes(b + 6) & 0xffL) << 8) | (keyBytes(b + 7) & 0xffL)
      while (w != 0L) {
        val id = wi * 64 + java.lang.Long.numberOfTrailingZeros(w)
        if (id < t.n) {
          val s = t.offsets(id)
          val e = t.offsets(id + 1)
          var j = s
          while (j < e) { scratch(j - s) |= t.words(j); j += 1 }
          if (e - s > usedWords) usedWords = e - s
        }
        w &= w - 1L
      }
      wi += 1
    }
    var c = 0L
    var i = 0
    while (i < usedWords) { c += java.lang.Long.bitCount(scratch(i)); i += 1 }
    c
  }

  override protected def nullSafeEval(k: Any, b: Any): Any =
    unionCount(k.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("blobUnion", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (k, _) => s"${ev.value} = $ref.unionCount($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(keys = newLeft, blob = newRight)
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

  /** Per-row union cardinality of the blob entries named by a key-set
    * bitmap; `blob` is packed by [[BitmapBlob.build]].
    */
  def blobUnionCount(keysBm: Column, blob: Array[Byte]): Column =
    ExpressionUtils.column(BitmapBlobUnionCount(
      ExpressionUtils.expression(keysBm),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        blob, BinaryType)))
}
