package graft

import org.apache.spark.sql.functions._

/** Dev utility (the ExplainDump discipline): measures the fused-encode
  * crossover of [[functions.Bpe.encodeWords]] — per-pass checkpointing
  * (cadence 1) pays ~2 driver-sequential jobs per merge, a fused chain
  * (cadence K) pays Catalyst analysis + codegen of a 3K-window stack
  * per pin. The 6-merge production gate measured per-pass as the winner
  * (r16); a realistic 32k-vocab tokenizer has THOUSANDS of merges, where
  * job count must dominate. This main times encodeWords over the sf
  * vocabulary at a grid of (merge-list length × cadence) and prints one
  * table row per cell — the measured basis for the length-gated default
  * (VERDICT r16 item 6).
  *
  * Usage: runMain graft.EncodeCrossover [sfDir] [lengths] [cadences]
  * e.g. runMain graft.EncodeCrossover /root/testdata/sf0.1 6,64,256,1024 1,4,8,32
  *
  * Merges beyond the trained 6 are SYNTHETIC ([a-z] pair cycle): pass
  * cost is the 3-window scan over the words-sized sequence table
  * whether or not the pair matches, which is the cost being measured.
  */
object EncodeCrossover {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val lengths = (if (args.length > 1) args(1) else "6,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val cadences = (if (args.length > 2) args(2) else "1,4,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.create("encode-crossover")
    val letters = ('a' to 'z').map(_.toString)
    def syntheticMerges(n: Int): Seq[(String, String)] =
      (0 until n).map { i =>
        // Cycle the alphabet pair space; after the first 676 pairs the
        // left side grows (merged symbols), mirroring a real table's
        // multi-char left constituents.
        val l = letters(i % 26) * (1 + i / 676)
        val r = letters((i / 26) % 26)
        (l, r)
      }
    val words = functions.Bpe.vocabulary(
      Tables(spark, dir).documents, 500).select("word").localCheckpoint(true)
    println("length,cadence,seconds")
    for (n <- lengths; k <- cadences) {
      spark.sparkContext.setJobDescription(s"crossover:n=$n,k=$k")
      val t0 = System.nanoTime()
      functions.Bpe.encodeWords(words, syntheticMerges(n), checkpointEvery = k)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseCaches(spark)
      println(f"$n,$k,$dt%.2f")
      System.out.flush()
    }
    spark.stop()
  }
}
