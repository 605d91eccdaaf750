package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.{GramCodes, LongSet, MinHashSig, SimHashKernel}

/** Property-style tests for the native expression kernels — pure JVM, no
  * SparkSession: the kernels are deliberately plain static methods so
  * their contracts can be checked exhaustively and fast. Seeded random
  * generation keeps every run deterministic.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val Reps = 500

  private def asciiText(rng: scala.util.Random): String = {
    val n = rng.nextInt(61)
    val sb = new StringBuilder
    (1 to n).foreach(_ => sb += (' ' + rng.nextInt('~' - ' ' + 1)).toChar)
    sb.toString
  }

  private val pool = "abcdefghij 中央党校éåß" // mixes 1-, 2- and 3-byte chars
  private def unicodeText(rng: scala.util.Random): String = {
    val n = rng.nextInt(41)
    val sb = new StringBuilder
    (1 to n).foreach(_ => sb += pool(rng.nextInt(pool.length)))
    sb.toString
  }

  private def stringGramSet(s: String, n: Int): Set[String] =
    if (s.length < n) Set.empty
    else (0 to s.length - n).map(i => s.substring(i, i + n)).toSet

  test("gram codes: |codes| = |distinct string grams| (ASCII and multibyte)") {
    val rng = new scala.util.Random(7)
    (1 to Reps).foreach { _ =>
      val s = if (rng.nextBoolean()) asciiText(rng) else unicodeText(rng)
      val codes = GramCodes.compute(UTF8String.fromString(s), 5)
      val expected = stringGramSet(s, 5).size
      // short texts yield the EMPTY set (mirrors shingles()), not null
      assert(codes.numElements() === expected, s"text: '$s'")
    }
  }

  test("gram codes: output sorted strictly ascending (deduped)") {
    val rng = new scala.util.Random(11)
    (1 to Reps).foreach { _ =>
      val s = unicodeText(rng)
      val codes = GramCodes.compute(UTF8String.fromString(s), 5)
      if (codes != null) {
        val arr = codes.toLongArray()
        var i = 1
        while (i < arr.length) { assert(arr(i - 1) < arr(i)); i += 1 }
      }
    }
  }

  test("gram codes: bijective on ASCII — distinct gram sets get distinct code sets") {
    val rng = new scala.util.Random(13)
    (1 to Reps).foreach { _ =>
      val a = asciiText(rng)
      val b = asciiText(rng)
      val ca = Option(GramCodes.compute(UTF8String.fromString(a), 5)).map(_.toLongArray().toSeq)
      val cb = Option(GramCodes.compute(UTF8String.fromString(b), 5)).map(_.toLongArray().toSeq)
      if (stringGramSet(a, 5) != stringGramSet(b, 5)) assert(ca !== cb)
      else assert(ca === cb)
    }
  }

  test("minhash signature: length k, values in [0, p), null below n chars") {
    val rng = new scala.util.Random(17)
    (1 to Reps).foreach { _ =>
      val s = asciiText(rng)
      val sig = MinHashSig.compute(UTF8String.fromString(s), 5, 32)
      if (s.length < 5) assert(sig == null)
      else {
        assert(sig.numElements() === 32)
        sig.toLongArray().foreach(v => assert(v >= 0L && v < MinHashSig.Prime))
      }
    }
  }

  test("minhash signature: gram-permutation invariance (signature of doc = signature of shuffled grams)") {
    // Sliding 5-gram windows can't be freely permuted inside one string,
    // but a string of repeated blocks exercises duplicate-gram
    // idempotence: dup(s) has the same gram SET as s, so identical
    // signatures.
    val rng = new scala.util.Random(19)
    (1 to Reps).foreach { _ =>
      val block = asciiText(rng)
      if (block.length >= 5) {
        val s1 = UTF8String.fromString(block)
        // repeat with 4-char overlap bridge of itself: block + block
        // introduces bridge grams, so compare sets explicitly instead —
        // duplicate every gram by concatenating block with itself ONLY
        // when the bridge adds no new grams (all-same-char blocks).
        val rep = block.head.toString * (block.length * 2)
        val single = block.head.toString * block.length
        val a = MinHashSig.compute(UTF8String.fromString(single), 5, 32)
        val b = MinHashSig.compute(UTF8String.fromString(rep), 5, 32)
        assert(a.toLongArray().toSeq === b.toLongArray().toSeq)
        assert(s1 != null)
      }
    }
  }

  test("simhash: deterministic and fits in 60 bits") {
    val rng = new scala.util.Random(23)
    (1 to Reps).foreach { _ =>
      val s = if (rng.nextBoolean()) asciiText(rng) else unicodeText(rng)
      val a = SimHashKernel.compute(UTF8String.fromString(s), 5)
      val b = SimHashKernel.compute(UTF8String.fromString(s), 5)
      assert(a === b)
      if (a != null) assert((a.longValue() >>> 60) === 0L)
    }
  }

  test("simhash kernel matches the string-set md5-vote reference (ASCII and multibyte)") {
    // Independent reimplementation over DISTINCT string grams — the
    // contract the packed-gram-code distinctness in SimHashKernel must
    // preserve bit-for-bit.
    def ref(s: String, n: Int): Option[Long] = {
      if (s.codePointCount(0, s.length) < n) return None
      val grams = (0 to s.length - n).map(i => s.substring(i, i + n)).distinct
      val votes = new Array[Int](60)
      val md = java.security.MessageDigest.getInstance("MD5")
      grams.foreach { g =>
        val d = md.digest(g.getBytes("UTF-8"))
        var h = 0L
        (0 until 7).foreach(j => h = (h << 8) | (d(j) & 0xffL))
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        (0 until 60).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      var fp = 0L
      (0 until 60).foreach(b => if (votes(b) >= 0) fp |= 1L << b)
      Some(fp)
    }
    val rng = new scala.util.Random(37)
    (1 to Reps).foreach { _ =>
      val s = if (rng.nextBoolean()) asciiText(rng) else unicodeText(rng)
      val got = Option(SimHashKernel.compute(UTF8String.fromString(s), 5)).map(_.longValue())
      assert(got === ref(s, 5), s"text: '$s'")
    }
  }

  test("byte stats kernel matches the obvious per-byte reference") {
    val rng = new scala.util.Random(41)
    (1 to Reps).foreach { _ =>
      val bytes = Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      val row = org.apache.spark.sql.graft.ByteStatsKernel.compute(bytes)
      val vs = bytes.map(_ & 0xff)
      assert(row.getLong(0) === bytes.length.toLong)
      assert(row.getLong(1) === vs.map(_.toLong).sum)
      assert(row.getInt(2) === vs.distinct.length)
      assert(row.getLong(3) === vs.count(_ >= 128).toLong)
    }
  }

  test("byte histogram kernel matches the obvious per-byte reference") {
    val rng = new scala.util.Random(59)
    (1 to Reps).foreach { _ =>
      val bytes = Array.fill(rng.nextInt(300))(rng.nextInt(256).toByte)
      val h = org.apache.spark.sql.graft.ByteHistogramKernel.compute(bytes)
      assert(h.numElements() === 256)
      val expect = bytes.map(_ & 0xff).groupBy(identity).view.mapValues(_.length.toLong)
      (0 until 256).foreach { v =>
        assert(h.getLong(v) === expect.getOrElse(v, 0L), s"byte $v")
      }
      assert((0 until 256).map(h.getLong).sum === bytes.length.toLong)
    }
    // Empty payload: all-zero bins, not a crash.
    val empty = org.apache.spark.sql.graft.ByteHistogramKernel.compute(Array.emptyByteArray)
    assert((0 until 256).forall(empty.getLong(_) == 0L))
  }

  test("block-avg-hash kernel matches the obvious grouped-mean reference") {
    val rng = new scala.util.Random(43)
    (1 to Reps).foreach { _ =>
      // Lengths straddling the 60-block count: short payloads leave
      // blocks empty, long ones split unevenly.
      val bytes = Array.fill(rng.nextInt(300))(rng.nextInt(256).toByte)
      val got = org.apache.spark.sql.graft.BlockAvgHashKernel.compute(bytes)
      val n = bytes.length
      val expect =
        if (n == 0) 0L
        else {
          val vs = bytes.map(_ & 0xff).map(_.toLong)
          val total = vs.sum
          val byBlock = vs.zipWithIndex.groupBy { case (_, j) => j.toLong * 60 / n }
          byBlock.foldLeft(0L) { case (acc, (b, grp)) =>
            val s = grp.map(_._1).sum
            if (s * n > total * grp.length) acc | (1L << b.toInt) else acc
          }
        }
      assert(got === expect)
      assert(got >= 0L && got < (1L << 60))
    }
  }

  test("Bitmap rejects out-of-range keys instead of aliasing them") {
    val bm = new org.apache.spark.sql.graft.Bitmap(1)
    bm.set(org.apache.spark.sql.graft.Bitmap.MaxKey - 1) // in range: fine
    intercept[IllegalArgumentException](bm.set(org.apache.spark.sql.graft.Bitmap.MaxKey))
    intercept[IllegalArgumentException](bm.set(1L << 38)) // would alias word 0
    intercept[IllegalArgumentException](bm.set(-1L))
  }

  test("LongSet agrees with scala Set under arbitrary adds (incl. 0, negatives, growth)") {
    val rng = new scala.util.Random(29)
    (1 to 200).foreach { _ =>
      val n = rng.nextInt(5000)
      val xs = Seq.fill(n)(rng.nextInt(2000).toLong - 1000L) ++ Seq.fill(rng.nextInt(3))(0L)
      val set = new LongSet(4)
      xs.foreach(set.add)
      assert(set.size === xs.toSet.size)
      assert(set.toArray.toSet === xs.toSet)
    }
  }

  test("Bitmap: cardinality of unioned sets matches scala Set semantics (incl. growth, serde trim)") {
    val rng = new scala.util.Random(31)
    (1 to 200).foreach { _ =>
      // several per-group key sets, then a union — mirrors the two-hop
      // build (bitmap per middle vertex) + OR (per-endpoint union) shape
      val groups = Seq.fill(1 + rng.nextInt(5)) {
        Seq.fill(rng.nextInt(400))(rng.nextInt(10000).toLong)
      }
      val bms = groups.map { ks =>
        val bm = new org.apache.spark.sql.graft.Bitmap(1)
        ks.foreach(bm.set)
        assert(bm.cardinality === ks.toSet.size)
        bm
      }
      val union = new org.apache.spark.sql.graft.Bitmap(1)
      bms.foreach(b => union.orWords(b.base, b.words, b.usedWords))
      assert(union.cardinality === groups.flatten.toSet.size)
      // leading/trailing-zero trim in the serialized form never drops
      // set bits
      val reunion = new org.apache.spark.sql.graft.Bitmap(1)
      bms.foreach(b => reunion.orBytes(b.serialized))
      assert(reunion.cardinality === union.cardinality)
    }
  }

  test("orBytes: OR from serialized form is bit-identical to decode-then-or") {
    val rng = new scala.util.Random(37)
    (1 to 200).foreach { _ =>
      // offset keys exercise the base-trim: one operand clustered high,
      // one low, one spanning — serialized size must track extent, and
      // the OR must land bits at their absolute positions.
      val off = rng.nextInt(3) * 100000
      val base = Seq.fill(rng.nextInt(300))((off + rng.nextInt(8000)).toLong)
      val inc = Seq.fill(rng.nextInt(300))(rng.nextInt(2) * 100000L + rng.nextInt(8000))
      val incBm = new org.apache.spark.sql.graft.Bitmap(1)
      inc.foreach(incBm.set)
      val viaBytes = new org.apache.spark.sql.graft.Bitmap(1)
      base.foreach(viaBytes.set)
      viaBytes.orBytes(incBm.serialized)
      assert(viaBytes.cardinality === (base.toSet ++ inc.toSet).size)
      // serialized size is extent-bound: a pure-offset singleton is tiny
      val one = new org.apache.spark.sql.graft.Bitmap(1)
      one.set(off + 63L)
      assert(one.serialized.length <= 4 + 8)
    }
  }

  test("BitmapBlob: unionCount over packed entries matches the scala Set union") {
    import org.apache.spark.sql.graft.{Bitmap, BitmapBlob, BitmapBlobUnionCount}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val rng = new scala.util.Random(41)
    (1 to 100).foreach { _ =>
      // entry id → key set (some ids absent, some sets empty — the blob
      // must treat both as empty slices); key sets cluster at random
      // offsets (the base-trim case); key-set rows pick random ids,
      // including ids PAST the blob's range (ignored, not a crash)
      val nEntries = 1 + rng.nextInt(40)
      val entrySets: Map[Long, Set[Long]] =
        (0 until nEntries).flatMap { id =>
          if (rng.nextBoolean()) {
            val off = rng.nextInt(4) * 50000
            Some(id.toLong ->
              Seq.fill(rng.nextInt(200))((off + rng.nextInt(5000)).toLong).toSet)
          } else None
        }.toMap
      val blob = BitmapBlob.build(entrySets.toSeq.map { case (id, ks) =>
        val bm = new Bitmap(1)
        ks.foreach(bm.set)
        id -> bm.serialized
      })
      val expr = BitmapBlobUnionCount(
        Literal.create(null, BinaryType), Literal.create(blob, BinaryType))
      (1 to 20).foreach { _ =>
        val picked = Seq.fill(rng.nextInt(10))(rng.nextInt(nEntries + 8).toLong).toSet
        val keyBm = new Bitmap(1)
        picked.foreach(keyBm.set)
        val expected =
          picked.flatMap(id => entrySets.getOrElse(id, Set.empty[Long])).size
        // successive calls reuse the scratch buffer — the loop also
        // checks the watermark clear leaves no stale bits behind
        assert(expr.unionCount(keyBm.serialized) === expected.toLong)
      }
    }
  }

  test("roundCentroid: exact floor(s/n + 1/2) rounding across the full grid range") {
    // The PQ codebook claims `(2·(s + off·n) + n) / (2·n) − off` (JVM
    // TRUNCATING division after the non-negative shift) equals
    // floor(s/n + 1/2) — round-half-toward-+∞, the one convention a JVM
    // truncating form and a SQL flooring form (`(2*(v+512*n)+n) //
    // (2*n) - 512` in the oracle) can both reproduce exactly. Reference =
    // Math.floorDiv WITHOUT the shift, so the offset trick itself is what
    // the property exercises; exact-half cases pinned on both signs.
    def ref(s: Long, n: Long): Long = Math.floorDiv(2 * s + n, 2 * n)
    val rng = new scala.util.Random(11)
    (1 to Reps).foreach { _ =>
      val n = 1L + rng.nextInt(10000)
      val s = Seq.fill(8)(rng.nextLong() % (512L * n + 1))
      assert(similarity.Pq.roundCentroid(s, n) === s.map(ref(_, n)))
    }
    // Exact halves round toward +∞ on BOTH signs: -3/2 → -1, not -2.
    Seq((3L, 2L, 2L), (-3L, 2L, -1L), (1L, 2L, 1L), (-1L, 2L, 0L), (5L, 2L, 3L))
      .foreach { case (s, n, want) =>
        assert(similarity.Pq.roundCentroid(Seq(s), n) === Seq(want), s"$s/$n")
      }
  }
}
