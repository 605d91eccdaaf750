package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the standard packaging for
  * third-party Catalyst expressions built against the public Spark jars.
  *
  * Rationale: the higher-order-function formulation
  * (`aggregate(zip_with(...))`) is interpreted (HOFs don't participate in
  * codegen) and allocates three intermediate arrays per row — profiled
  * ~50× slower on the all-pairs dedup join (d5: 97 s → ~2 s at sf0.1).
  * This expression generates one fused Java loop inside whole-stage
  * codegen: no allocation, no virtual dispatch, stays inside the join
  * stage. Accumulation is sequential left-to-right in double — the same
  * order as both the HOF fold and DuckDB's `list_cosine_similarity` — so
  * results are bit-identical to the oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  // Null (not truncate-to-min / NaN) on length mismatch and zero-norm
  // inputs: mirrors the HOF formulation's null on zip_with length mismatch
  // and keeps oracle comparisons well-defined (NaN orders differently in
  // DuckDB than in Spark filters).
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = (double) $a.getFloat($i);
         |    final double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ(aᵢ−bᵢ)² over two `array<int>` code vectors — the symmetric
  * scalar-quantization (SQ8) distance of s16 as one fused integer loop
  * in whole-stage codegen. Pure integer (codes are 0..255, so the sum
  * fits a long for any realistic dimensionality), hence bit-identical
  * to the DuckDB oracle's re-derivation by construction — no float
  * accumulation order to reconcile. Null on length mismatch, mirroring
  * [[CosineSimilarity]]'s discipline.
  */
case class IntSqDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = (x.getInt(i) - y.getInt(i)).toLong
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = (long) ($a.getInt($i) - $b.getInt($i));
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED string arrays via a fused
  * two-pointer merge — the codegen'd replacement for
  * `size(array_intersect(a, b))` on the dedup verify path.
  *
  * `array_intersect` builds an OpenHashSet per PAIR (profiled as the
  * hottest stack in LSH verification); with per-document sorted distinct
  * shingle arrays the intersection count is a linear merge with no
  * allocation and no hashing — and unlike hashed-gram tricks it is
  * exactly the set-intersection cardinality, so oracle parity is
  * unconditional. Inputs must be duplicate-free and sorted ascending
  * (Spark's `sort_array` binary UTF8 order — the comparison this merge
  * uses).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType), ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass MinHash signature of a text column: all `k` Carter–Wegman
  * minima over the character `n`-gram stream, computed in a single fused
  * loop per document.
  *
  * Replaces the explode-per-position + k-column min-aggregate formulation
  * (one row per corpus character through a shuffle-side aggregate — the
  * profiled 31%-of-bench cost of the LSH dedup path): same murmur3 base
  * hash per gram (identical to `hash(substr(text, pos, n))`), same
  * `(a·x + b) mod p` family and coefficient stream (`Random(42)`), so the
  * signature values are bit-identical to the aggregate formulation — but
  * the operator is now a shuffle-free projection. At 100 TB that's the
  * difference between a map-only corpus pass and re-shuffling every
  * character position.
  *
  * Returns null for texts shorter than `n` characters (no gram exists —
  * callers filter those out, as does the oracle).
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, k)

  // The heavy loop lives in MinHashSig.compute (plain JVM code, JIT-friendly);
  // codegen emits one static call so the expression stays inside the
  // whole-stage-codegen'd projection rather than falling back to interpreted
  // eval for the entire stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.MinHashSig.compute($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared MinHash kernel — public static-forwarded methods so generated
  * code can call them.
  */
object MinHashSig {
  /** 2^31 − 1, the Mersenne prime of the Carter–Wegman family. */
  val Prime: Long = 2147483647L

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** The (a_i, b_i) coefficient stream: `Random(42)`, a ∈ [1, 2^31−1),
    * b ∈ [0, 2^31−1) — one canonical definition for the expression, any
    * SQL-side formulation, and the specs.
    */
  def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, (kk: Int) => {
      val rng = new scala.util.Random(42)
      val a = new Array[Long](kk)
      val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = 1L + rng.nextInt(Int.MaxValue - 1)
        b(i) = rng.nextInt(Int.MaxValue).toLong
        i += 1
      }
      (a, b)
    })

  /** All k minima in one pass over the n-gram stream. Gram hashing matches
    * Spark's `hash(substr(text, pos, n))` exactly: murmur3 (seed 42) over
    * the UTF-8 bytes of each n-CHARACTER window, sign-extended to long.
    */
  def compute(s: UTF8String, n: Int, k: Int): GenericArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return null
    val (as, bs) = coefs(k)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    // Char-boundary byte offsets, computed once (UTF-8 windows are over
    // characters, not bytes — multi-byte text must match substr semantics).
    val offs = new Array[Int](numChars + 1)
    var ci = 0
    var b = 0
    while (b < nBytes) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      ci += 1
    }
    offs(numChars) = nBytes
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val last = numChars - n
    var i = 0
    while (i <= last) {
      val st = offs(i)
      val h0: Long = Murmur3_x86_32.hashUnsafeBytes(base, off + st, offs(i + n) - st, 42).toLong
      var j = 0
      while (j < k) {
        var v = (h0 * as(j) + bs(j)) % Prime
        if (v < 0) v += Prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Sorted distinct character n-gram CODES of a text column — the
  * long-array replacement for the interpreted
  * `sort_array(array_distinct(transform(...substr...)))` shingle-set
  * builder on the dedup verify path.
  *
  * Encoding is a BIJECTION for grams of ≤ 7 UTF-8 bytes (every ASCII
  * 5-gram — i.e. the entire oracle corpus): the bytes left-justified in
  * the upper 56 bits, the byte length in the low byte. Code equality ⇔
  * gram equality, so set cardinalities and intersection counts — and
  * therefore Jaccard — are EXACTLY the string-set values, same
  * unconditional oracle parity as the string formulation. Grams longer
  * than 7 bytes (only possible with multi-byte characters) fall back to a
  * 56-bit hash tagged 0xFF in the low byte (disjoint from packed codes,
  * whose low byte is 1..7); those are near-exact (collision ~n²/2⁵⁷ per
  * document) and absent from ASCII corpora entirely.
  *
  * Benefits over the string form: the build is one fused codegen'd pass
  * (no per-gram UTF8String allocation), the verify shuffle carries packed
  * longs, and the intersect merge compares longs instead of UTF8Strings.
  */
case class SortedGramCodes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_codes"

  override protected def nullSafeEval(input: Any): Any =
    GramCodes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.GramCodes.compute($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[SortedGramCodes]] (public object so generated code can
  * call it).
  */
object GramCodes {
  /** Packed code of one gram at byte range [st, st+len) of (base, off).
    * Bijective for len ≤ 7 (bytes left-justified big-endian in the upper
    * 56 bits, length in the low byte — code equality ⇔ gram equality);
    * longer grams (multi-byte text only) fall back to a 56-bit two-seed
    * murmur3 hash tagged 0xFF in the low byte, disjoint from every packed
    * code (low byte 1..7). Never 0 (the low byte is always non-zero), so
    * the code stream is directly usable as [[LongSet]] elements.
    */
  def gramCode(base: AnyRef, off: Long, st: Int, len: Int): Long =
    if (len <= 7) {
      var v = 0L
      var j = 0
      while (j < len) {
        v |= (Platform.getByte(base, off + st + j) & 0xffL) << (48 - 8 * j)
        j += 1
      }
      (v << 8) | len.toLong
    } else {
      val h1 = Murmur3_x86_32.hashUnsafeBytes(base, off + st, len, 42).toLong
      val h2 = Murmur3_x86_32.hashUnsafeBytes(base, off + st, len, 1042).toLong
      ((((h1 << 32) ^ (h2 & 0xffffffffL)) >>> 8) << 8) | 0xffL
    }

  /** Sorted distinct gram codes; empty array for texts shorter than n
    * characters (mirrors the empty shingle set).
    */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    val offs = new Array[Int](numChars + 1)
    var ci = 0
    var b = 0
    while (b < nBytes) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      ci += 1
    }
    offs(numChars) = nBytes
    val nGrams = numChars - n + 1
    val codes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val st = offs(i)
      codes(i) = gramCode(base, off, st, offs(i + n) - st)
      i += 1
    }
    java.util.Arrays.sort(codes)
    // in-place dedupe of the sorted run
    var w = 1
    i = 1
    while (i < nGrams) {
      if (codes(i) != codes(i - 1)) { codes(w) = codes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == nGrams) codes else java.util.Arrays.copyOf(codes, w))
  }
}

/** One-pass 60-bit SimHash of a text column over its DISTINCT character
  * n-grams — the shuffle-free replacement for the explode + 60-column
  * bit-vote aggregate.
  *
  * Per-gram hash is EXACTLY the oracle's: the first 15 hex characters of
  * md5(gram) parsed base-16 (= the digest's top 60 bits), so the
  * fingerprint is bit-identical to the `md5`/`conv` SQL formulation and
  * the DuckDB oracle. Votes are ±1 per bit per distinct gram, fingerprint
  * bit i set when the vote sum is ≥ 0.
  *
  * Turning the vote aggregation into a per-row loop removes the
  * one-row-per-gram explode and its shuffle entirely: at 100 TB the
  * SimHash pre-pass becomes scan-bound (one codegen'd projection), which
  * is the property that makes fingerprint-everything-first a viable
  * pipeline stage.
  */
case class SimHash60(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Long $boxed = org.apache.spark.sql.graft.SimHashKernel.compute($c, $n);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[SimHash60]] (public object so generated code can call
  * it).
  */
object SimHashKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Null for texts shorter than n characters (no gram exists). */
  def compute(s: UTF8String, n: Int): java.lang.Long = {
    val numChars = s.numChars()
    if (numChars < n) return null
    val bytes = s.getBytes
    // char-boundary offsets (grams are over characters, not bytes)
    val offs = new Array[Int](numChars + 1)
    var ci = 0
    var b = 0
    while (b < bytes.length) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    offs(numChars) = bytes.length
    // Distinct grams only — votes are per SET element, matching the
    // array_distinct in the reference formulation. Distinctness runs on
    // the packed gram CODES (same encoding as SortedGramCodes: exact for
    // ≤7-byte grams, i.e. all ASCII 5-grams; 56-bit-hash near-exact
    // beyond) through a primitive open-addressed LongSet — no per-gram
    // UTF8String or boxed HashSet entry, so the only per-DISTINCT-gram
    // allocation left is the md5 digest itself.
    val nGrams = numChars - n + 1
    val seen = new LongSet(nGrams)
    val votes = new Array[Int](60)
    val md = md5Local.get()
    var i = 0
    while (i < nGrams) {
      val st = offs(i)
      val len = offs(i + n) - st
      if (seen.addIfAbsent(GramCodes.gramCode(bytes, Platform.BYTE_ARRAY_OFFSET, st, len))) {
        md.reset()
        md.update(bytes, st, len)
        val d = md.digest()
        // top 60 bits of the digest = first 15 hex chars parsed base-16
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) >= 0) fp |= 1L << bit
      bit += 1
    }
    java.lang.Long.valueOf(fp)
  }
}

/** [[SortedIntersectCount]] for sorted long arrays — the merge the
  * gram-code formulation uses (long compares instead of UTF8String
  * compares).
  */
case class SortedIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_intersect_count_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var cnt = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass byte-level feature extraction over a binary payload — the
  * codegen'd FEATURE-EXTRACT stage of the multimodal plumbing (the stub
  * position where a codec-backed extractor computes model features; these
  * integer stats are the deterministic, oracle-checkable stand-in).
  * Returns (n_bytes, sum_bytes, n_distinct, n_high) in one fused loop:
  * no per-byte boxing, no intermediate arrays, stays inside whole-stage
  * codegen — a 100 TB payload scan is one map-only pass.
  */
/** Full 256-bin byte-value histogram of a binary payload as one
  * `array<long>` — the per-row input to corpus-level byte-distribution
  * statistics ([[graft.multimodal.Media]] m10 drift): one pass, one
  * allocation, whole-stage codegen. The sibling of [[ByteStats]] when the
  * DISTRIBUTION is the feature, not its moments.
  */
case class ByteHistogram(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_byte_histogram"

  override protected def nullSafeEval(input: Any): Any =
    ByteHistogramKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.ByteHistogramKernel.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[ByteHistogram]] (public so generated code can call it). */
object ByteHistogramKernel {
  def compute(bytes: Array[Byte]): ArrayData = {
    val h = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      h(bytes(i) & 0xff) += 1L
      i += 1
    }
    new GenericArrayData(h)
  }
}

case class ByteStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = ByteStatsKernel.schema
  override def prettyName: String = "graft_byte_stats"

  override protected def nullSafeEval(input: Any): Any =
    ByteStatsKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.ByteStatsKernel.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[ByteStats]] (public object so generated code can call
  * it).
  */
object ByteStatsKernel {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("sum_bytes", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_high", LongType, nullable = false)))

  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    var sum = 0L
    var high = 0L
    var distinct = 0
    val seen = new Array[Boolean](256)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      if (v >= 128) high += 1
      if (!seen(v)) { seen(v) = true; distinct += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bytes.length.toLong, sum, distinct, high)
  }
}

/** 60-bit blockwise average hash ("aHash") over a binary payload — the
  * perceptual-fingerprint stage of multimodal near-dup detection. The
  * payload is split into 60 proportional blocks (byte j belongs to block
  * `j*60 DIV n`, sizes differing by at most one); bit b is set iff block
  * b's mean byte exceeds the payload's global mean, compared in exact
  * cross-multiplied integers (`sum_b * n > sum_total * count_b`) so no
  * division and no float enters the fingerprint. Payloads shorter than 60
  * bytes leave the unhit blocks' bits at 0.
  *
  * Like [[SimHash60]] the fingerprint is 60 bits so it both stays
  * positive in a signed long and splits into 4×15-bit LSH bands; hamming
  * distance between fingerprints of resized/re-encoded variants of the
  * same content is small while unrelated payloads differ in ~30 bits.
  * One fused codegen'd pass; two fixed 61-slot long arrays per call, no
  * per-byte allocation.
  */
case class BlockAvgHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_block_avg_hash"

  override protected def nullSafeEval(input: Any): Any =
    BlockAvgHashKernel.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.BlockAvgHashKernel.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[BlockAvgHash60]] (public object so generated code can
  * call it).
  */
object BlockAvgHashKernel {
  final val Blocks = 60

  def compute(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](Blocks)
    val counts = new Array[Long](Blocks)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = bytes(i) & 0xff
      val b = (i.toLong * Blocks / n).toInt
      sums(b) += v
      counts(b) += 1
      total += v
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < Blocks) {
      // Cross-multiplication sums(b)*n can exceed Long for payloads past
      // ~1.4 GB (bounded by ~4.25·n²), so compare the 128-bit products.
      if (cmpProducts(sums(b), n.toLong, total, counts(b)) > 0) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Compares a·b vs c·d exactly for non-negative longs via 128-bit
    * products (high word from `Math.multiplyHigh`, low word unsigned).
    */
  private def cmpProducts(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(a * b, c * d)
  }
}

/** Argmin cell assignment for the exact integer k-means
  * ([[graft.similarity.Cluster]]): given a quantized `array<long>` vector
  * and a frozen centroid state (cell id, integer SUM vector, member
  * count), return the cell minimizing |n·q − S|²/n², ties to the lowest
  * cell id.
  *
  * The HOF formulation (`aggregate` over an array-of-structs literal with
  * a nested `zip_with` per centroid) is interpreted and allocates k
  * zipped arrays per row; this expression is one fused, allocation-free
  * double loop inside whole-stage codegen. Arithmetic is identical by
  * construction: the distance accumulates exactly in long, and the single
  * D/n² division is correctly rounded — so assignments are bit-identical
  * to both the HOF form and the DuckDB oracle (spec-pinned in
  * KernelPropertySpec).
  */
case class KmeansAssignExact(child: Expression, cents: Seq[(Long, Seq[Long], Long)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmeans_assign"

  // Flat, codegen-referenceable centroid state (ordered by cell id so the
  // strict `<` scan ties to the lowest cell).
  @transient private lazy val ordered = cents.sortBy(_._1)
  @transient private lazy val cellIds: Array[Long] = ordered.map(_._1).toArray
  @transient private lazy val sums: Array[Array[Long]] = ordered.map(_._2.toArray).toArray
  @transient private lazy val counts: Array[Long] = ordered.map(_._3).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val len = q.numElements()
    var bestCell = -1L
    var bestD = Double.MaxValue
    var c = 0
    while (c < cellIds.length) {
      val s = sums(c)
      if (s.length != len) return null
      val n = counts(c)
      var d = 0L
      var i = 0
      while (i < len) {
        val t = n * q.getLong(i) - s(i)
        d += t * t
        i += 1
      }
      val dd = d.toDouble / (n * n).toDouble
      if (dd < bestD) { bestD = dd; bestCell = cellIds(c) }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("kmCells", cellIds, "long[]")
    val sumsRef = ctx.addReferenceObj("kmSums", sums, "long[][]")
    val countsRef = ctx.addReferenceObj("kmCounts", counts, "long[]")
    nullSafeCodeGen(ctx, ev, q => {
      val len = ctx.freshName("len")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val dd = ctx.freshName("dd")
      val bad = ctx.freshName("bad")
      s"""
         |final int $len = $q.numElements();
         |long $best = -1L;
         |double $bestD = Double.MAX_VALUE;
         |boolean $bad = false;
         |for (int $c = 0; $c < $cellsRef.length && !$bad; $c++) {
         |  final long[] $s = $sumsRef[$c];
         |  if ($s.length != $len) { $bad = true; break; }
         |  final long $n = $countsRef[$c];
         |  long $d = 0L;
         |  for (int $i = 0; $i < $len; $i++) {
         |    final long $t = $n * $q.getLong($i) - $s[$i];
         |    $d += $t * $t;
         |  }
         |  final double $dd = (double) $d / (double) ($n * $n);
         |  if ($dd < $bestD) { $bestD = $dd; $best = $cellsRef[$c]; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Membership probe of a frozen [[org.apache.spark.util.sketch.BloomFilter]]
  * over a `long` digest column — the scan-side half of a Bloom-accelerated
  * anti/semi-join ([[graft.dedup.Dedup.d16BloomPrefilter]]).
  *
  * The filter is built once with Spark's distributed
  * `DataFrameStatFunctions.bloomFilter` aggregate (only the bit array
  * reaches the driver) and embedded here as a codegen reference object, so
  * the probe runs inside whole-stage codegen with no join, no shuffle, and
  * no per-row allocation. False positives only ever ADD candidate rows to
  * a downstream exact verification join; false negatives are impossible by
  * the Bloom contract — so operators built on it stay exact.
  */
case class BloomMightContainLong(
    child: Expression, filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "bloomFilter", filter, "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass winnowed-fingerprint selection (Schleimer et al. SIGMOD'03)
  * — the native kernel behind d18: word `k`-grams hashed by md5 (the
  * engine-portable choice; the first 15 hex nibbles as a 60-bit code,
  * exactly `conv(substring(md5(gram), 1, 15), 16, 10)`), each sliding
  * `w`-window's MINIMUM code selected, first-occurrence-distinct output
  * (`array_distinct` semantics). Bit-identical to the HOF formulation
  * (split → transform/slice/md5 → window array_min → array_distinct;
  * spec-pinned) but one JIT-friendly pass per row: the HOF chain paid
  * interpreted per-element expression dispatch plus a per-gram
  * UTF8String slice/join allocation storm — 28 s for the sf1 selection
  * stage vs ~2 s for this kernel. Total on short input (returns an
  * empty array below `k + w − 1` tokens) — the InferFiltersFromGenerate
  * rule can evaluate it anywhere safely.
  */
case class WinnowCodes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_codes"

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.WinnowKernel.compute($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowKernel {
  private val ws = UTF8String.fromString("\\s+")
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // Same tokenizer as SQL split(text, '\s+') — identical empty-token
    // behavior at string edges.
    val parts = text.split(ws, -1)
    val n = parts.length
    if (n < k + w - 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val codes = new Array[Long](m)
    val md = mdPool.get()
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(parts(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      var x = 0L
      var b = 0
      while (b < 8) { x = (x << 8) | (d(b) & 0xffL); b += 1 }
      // First 15 hex nibbles of the digest == top 60 of the first 64 bits.
      codes(i) = x >>> 4
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var jw = 0
    while (jw <= m - w) {
      var mn = codes(jw)
      var t = 1
      while (t < w) { if (codes(jw + t) < mn) mn = codes(jw + t); t += 1 }
      seen.add(mn)
      jw += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {
  /** Column wrapper for [[CosineSimilarity]]. */
  def cosineNative(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[IntSqDist]]. */
  def intSqDistNative(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntSqDist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectCount(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[MinHashSignature]]. */
  def minhashSignature(text: Column, n: Int = 5, k: Int = 128): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(text), n, k))

  /** Column wrapper for [[SimHash60]]. */
  def simhash60(text: Column, n: Int = 5): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(text), n))

  /** Column wrapper for [[SortedGramCodes]]. */
  def sortedGramCodes(text: Column, n: Int = 5): Column =
    ExpressionUtils.column(SortedGramCodes(ExpressionUtils.expression(text), n))

  /** Column wrapper for [[SortedIntersectCountLong]]. */
  def sortedIntersectCountLong(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectCountLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[ByteStats]]. */
  def byteStats(payload: Column): Column =
    ExpressionUtils.column(ByteStats(ExpressionUtils.expression(payload)))

  /** Column wrapper for [[BlockAvgHash60]]. */
  def blockAvgHash60(payload: Column): Column =
    ExpressionUtils.column(BlockAvgHash60(ExpressionUtils.expression(payload)))

  /** Column wrapper for [[WinnowCodes]]. */
  def winnowCodes(text: Column, k: Int = 8, w: Int = 4): Column =
    ExpressionUtils.column(WinnowCodes(ExpressionUtils.expression(text), k, w))

  /** Column wrapper for [[KmeansAssignExact]]. */
  def kmeansAssignExact(qv: Column, cents: Seq[(Long, Seq[Long], Long)]): Column =
    ExpressionUtils.column(KmeansAssignExact(ExpressionUtils.expression(qv), cents))

  /** Column wrapper for [[ByteHistogram]]. */
  def byteHistogram(payload: Column): Column =
    ExpressionUtils.column(ByteHistogram(ExpressionUtils.expression(payload)))

  /** Column wrapper for [[BloomMightContainLong]]. */
  def bloomMightContainLong(
      digest: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column =
    ExpressionUtils.column(
      BloomMightContainLong(ExpressionUtils.expression(digest), filter))

  /** Morton/Z-value as a raw Catalyst expression tree — THE definition of
    * the curve: `graft.sources.Layout.zValue` (Column API) and the
    * `graft_zvalue` SQL function both delegate here, so layout writes and
    * ad-hoc SQL always agree on the interleave. Plain shift/mask
    * arithmetic over existing codegen'd expressions.
    */
  def zValueExpr(a: Expression, b: Expression, bits: Int = 21): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{
      BitwiseAnd, BitwiseOr, Cast, Literal, ShiftLeft, ShiftRight}
    val aL = Cast(a, LongType)
    val bL = Cast(b, LongType)
    (0 until bits).map { i =>
      BitwiseOr(
        ShiftLeft(BitwiseAnd(ShiftRight(aL, Literal(i)), Literal(1L)), Literal(2 * i)),
        ShiftLeft(BitwiseAnd(ShiftRight(bL, Literal(i)), Literal(1L)), Literal(2 * i + 1)))
    }.reduce[Expression]((x, y) => BitwiseOr(x, y))
  }

  /** Column wrapper for [[zValueExpr]]. */
  def zValueNative(a: Column, b: Column, bits: Int = 21): Column =
    ExpressionUtils.column(
      zValueExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b), bits))
}
