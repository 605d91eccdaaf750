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
  /** Absolute word index of `words(0)` — the offset that keeps a
    * CLUSTERED id range cheap wherever it sits in the key space. Without
    * it, a bitmap whose smallest key is k pays ~k/64 leading-zero words
    * in every serialize/OR — and clustered ranges are exactly what
    * range-partitioned dictionary encoding produces at scale (the sf1
    * sweep measured g4's union cost growing with id OFFSET, not set
    * size). With the base, cost tracks the set-bit EXTENT only.
    */
  var base: Int = 0
  var words: Array[Long] = new Array[Long](math.max(initialWords, 1))
  private var anchored: Boolean = false

  /** Guarantee `words` covers absolute word range [wLo, wHi]. */
  private def ensureRange(wLo: Int, wHi: Int): Unit = {
    if (!anchored) { base = wLo; anchored = true }
    if (wLo >= base && wHi - base < words.length) return
    val newBase = math.min(base, wLo)
    val needed = math.max(wHi, base + words.length - 1) - newBase + 1
    // needed is bounded by MaxKey/64 + 1 (set() guards the key range), so
    // needed * 2 - 1 cannot overflow Int here.
    if (newBase == base && needed <= words.length) return
    val grown = new Array[Long](Integer.highestOneBit(needed * 2 - 1))
    System.arraycopy(words, 0, grown, base - newBase, words.length)
    words = grown
    base = newBase
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
    ensureRange(w, w)
    words(w - base) |= 1L << (v & 63L)
  }

  /** OR `len` words of `other` (whose first word sits at absolute index
    * `otherBase`) into this bitmap.
    */
  def orWords(otherBase: Int, other: Array[Long], len: Int): Unit = {
    if (len == 0) return
    ensureRange(otherBase, otherBase + len - 1)
    val off = otherBase - base
    var i = 0
    while (i < len) { words(off + i) |= other(i); i += 1 }
  }

  /** OR a SERIALIZED bitmap (the `[base:int][big-endian words]` form
    * [[BitmapAggBase.serialize]] emits) into this one, assembling each
    * word directly from the bytes. The obvious decode-then-or allocates a
    * temp long array per call; in the two-hop aggregate that call sits on
    * the per-joined-row path, and at ~2 KB per bitmap the temp arrays
    * alone were gigabytes of young-gen churn per sweep — the GC pressure,
    * not the OR itself, was the measured cost.
    */
  def orBytes(bytes: Array[Byte]): Unit = {
    if (bytes.length < 4) return
    val otherBase =
      ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val n = (bytes.length - 4) / 8
    if (n == 0) return
    ensureRange(otherBase, otherBase + n - 1)
    val off = otherBase - base
    var i = 0
    while (i < n) {
      val b = 4 + i * 8
      words(off + i) |=
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

  /** Words up to the last non-zero one (relative to `base`). */
  def usedWords: Int = {
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    n
  }

  /** First non-zero word index (relative to `base`); == usedWords when
    * the bitmap is empty.
    */
  def firstWord: Int = {
    val hi = usedWords
    var n = 0
    while (n < hi && words(n) == 0L) n += 1
    n
  }

  /** The canonical serialized form: `[absolute base of first non-zero
    * word: 4-byte big-endian int][that word .. last non-zero word,
    * big-endian]` — leading AND trailing zero words trimmed, so the size
    * is the set-bit extent regardless of where the keys sit. Empty
    * bitmap: `[0]` (4 bytes, no words).
    */
  def serialized: Array[Byte] = {
    val lo = firstWord
    val hi = usedWords
    val n = math.max(hi - lo, 0)
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(if (n == 0) 0 else base + lo)
    var i = lo
    while (i < hi) { bb.putLong(words(i)); i += 1 }
    bb.array()
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
    buffer.orWords(other.base, other.words, other.usedWords)
    buffer
  }

  override def eval(buffer: Bitmap): Any = serialize(buffer)

  override def serialize(buffer: Bitmap): Array[Byte] = buffer.serialized

  override def deserialize(bytes: Array[Byte]): Bitmap = {
    val bm = new Bitmap(math.max((bytes.length - 4) / 8, 1))
    bm.orBytes(bytes)
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
      val n: Int, val offsets: Array[Int], val bases: Array[Int],
      val words: Array[Long]) {
    /** Smallest absolute word any entry touches — anchors the scratch. */
    val minBase: Int = {
      var m = Int.MaxValue
      var i = 0
      while (i < n) {
        if (offsets(i + 1) > offsets(i) && bases(i) < m) m = bases(i)
        i += 1
      }
      if (m == Int.MaxValue) 0 else m
    }
    /** Absolute word extent of the union of all entries — sizes the
      * per-row union scratch (set-bit extent, not key-space width).
      */
    val scratchWords: Int = {
      var hi = 0
      var i = 0
      while (i < n) {
        val e = bases(i) + (offsets(i + 1) - offsets(i)) - minBase
        if (offsets(i + 1) > offsets(i) && e > hi) hi = e
        i += 1
      }
      hi
    }
  }

  /** Pack (id, serialized bitmap) pairs — each entry in the
    * `[base][words]` form [[Bitmap.serialized]] emits; the bases land in
    * their own lane so the word lanes stay leading-zero-free. Ids must be
    * small non-negative ints (the same dense-dictionary assumption the
    * bitmap itself makes); missing ids get empty slices.
    */
  def build(entries: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val n = if (entries.isEmpty) 0 else entries.map(_._1).max.toInt + 1
    val wordCount = new Array[Int](n)
    val baseOf = new Array[Int](n)
    entries.foreach { case (id, b) =>
      wordCount(id.toInt) = math.max(0, (b.length - 4) / 8)
      baseOf(id.toInt) =
        if (b.length < 4) 0
        else ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
          ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    }
    val offsets = new Array[Int](n + 1)
    var i = 0
    while (i < n) { offsets(i + 1) = offsets(i) + wordCount(i); i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + 4 * (n + 1) + 4 * n + 8 * offsets(n))
    bb.putInt(n)
    offsets.foreach(bb.putInt)
    baseOf.foreach(bb.putInt)
    entries.sortBy(_._1).foreach { case (_, b) =>
      if (b.length > 4) bb.put(b, 4, b.length - 4)
    }
    bb.array()
  }

  def decode(blob: Array[Byte]): Decoded = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    val n = bb.getInt
    val offsets = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { offsets(i) = bb.getInt; i += 1 }
    val bases = new Array[Int](n)
    i = 0
    while (i < n) { bases(i) = bb.getInt; i += 1 }
    val words = new Array[Long](offsets(n))
    i = 0
    while (i < offsets(n)) { words(i) = bb.getLong; i += 1 }
    new Decoded(n, offsets, bases, words)
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
    new Array[Long](math.max(table.scratchWords, 1))
  @transient private var usedLo: Int = 0
  @transient private var usedHi: Int = 0

  def unionCount(keyBytes: Array[Byte]): Long = {
    // Short/empty key: bail BEFORE touching the watermark — the previous
    // row's (valid) range stays in place for the next real row's clear.
    if (keyBytes.length < 4) return 0L
    val t = table
    java.util.Arrays.fill(scratch, usedLo, usedHi, 0L)
    usedLo = scratch.length
    usedHi = 0
    // Key-set bitmap arrives in the same [base][words] serialized form.
    val kBase =
      ((keyBytes(0) & 0xff) << 24) | ((keyBytes(1) & 0xff) << 16) |
      ((keyBytes(2) & 0xff) << 8) | (keyBytes(3) & 0xff)
    val nw = (keyBytes.length - 4) / 8
    var wi = 0
    while (wi < nw) {
      val b = 4 + wi * 8
      var w =
        ((keyBytes(b) & 0xffL) << 56) | ((keyBytes(b + 1) & 0xffL) << 48) |
        ((keyBytes(b + 2) & 0xffL) << 40) | ((keyBytes(b + 3) & 0xffL) << 32) |
        ((keyBytes(b + 4) & 0xffL) << 24) | ((keyBytes(b + 5) & 0xffL) << 16) |
        ((keyBytes(b + 6) & 0xffL) << 8) | (keyBytes(b + 7) & 0xffL)
      while (w != 0L) {
        val id = (kBase + wi) * 64 + java.lang.Long.numberOfTrailingZeros(w)
        if (id >= 0 && id < t.n) {
          val s = t.offsets(id)
          val e = t.offsets(id + 1)
          // Entry words land at their absolute position (minus the blob's
          // min base): ORs only touch the entry's extent, so a clustered
          // id range costs its own width wherever it sits.
          val off = t.bases(id) - t.minBase
          var j = s
          while (j < e) { scratch(off + j - s) |= t.words(j); j += 1 }
          if (e > s) {
            if (off < usedLo) usedLo = off
            if (off + e - s > usedHi) usedHi = off + e - s
          }
        }
        w &= w - 1L
      }
      wi += 1
    }
    var c = 0L
    var i = usedLo
    while (i < usedHi) { c += java.lang.Long.bitCount(scratch(i)); i += 1 }
    if (usedLo > usedHi) { usedLo = 0; usedHi = 0 }
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
