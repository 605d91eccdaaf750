package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family for the training-data pipeline.
  *
  * Reference analog: the skip-already-fetched bookkeeping
  * (processor/data_processor.py:91-143, utils/db_utils.py:91) is an exact
  * dedup on a content key; here generalized to the operators an LLM data
  * pipeline needs at 100 TB.
  */
object Dedup {

  /** Distinct character 3-gram shingle set of a text column (codegen'd
    * higher-order functions; empty set for texts shorter than 3 chars).
    */
  def shingles3(c: Column): Column =
    when(length(c) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3)))))

  /** d1: exact dedup — hash-aggregate on md5(text), keep the smallest id.
    * No sort, map-side partial agg; at 100 TB this is one shuffle keyed by
    * the 128-bit digest.
    */
  def d1ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .orderBy("text_hash")

  /** d2: n-gram Jaccard near-dup pairs — the exact O(n²) baseline that the
    * MinHash-LSH path (d3) approximates at scale. Shingle sets are computed
    * once per side before the join; the Jaccard score is exact integer
    * fixed-point so it hashes identically everywhere.
    */
  def d2NgramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    // length>=3 pre-filter: texts with no 3-gram have an empty shingle set,
    // whose 0/0 Jaccard is engine-dependent (NaN vs error) — exclude on
    // BOTH sides (same filter in the oracle) so parity is by construction.
    val docs = Tables(spark, dir).documents
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), shingles3(col("text")).as("grams"))
    val a = docs.select(col("doc_id").as("doc_id1"), col("grams").as("g1"))
    val b = docs.select(col("doc_id").as("doc_id2"), col("grams").as("g2"))
    val inter = size(array_intersect(col("g1"), col("g2"))).cast("double")
    val union = size(array_union(col("g1"), col("g2"))).cast("double")
    a.crossJoin(b)
      .filter(col("doc_id1") < col("doc_id2"))
      .withColumn("jac", inter / union)
      .filter(col("jac") >= threshold)
      .select(
        col("doc_id1"), col("doc_id2"),
        floor(col("jac") * 1000000.0).cast("long").as("jaccard_micro"))
      .orderBy("doc_id1", "doc_id2")
  }

  /** d3: MinHash + LSH banding — the scale path for near-dup detection.
    *
    * 128 min-hashes per document (hash family = murmur3 seeded by the
    * function index, computed as codegen'd array expressions), banded
    * 32×4: documents agreeing on any full band land in the same bucket, so
    * the O(n²) similarity join becomes an equijoin on (band_id, band_hash)
    * with bucket-bounded pair explosion. Candidates are then verified with
    * the exact Jaccard, so output precision is 1.0 and recall at the 0.8
    * threshold is 1 − (1 − 0.8⁴)³² ≈ 1 − 5e-8 — which is why the exact-join
    * oracle (same SQL as d2) is a sound check.
    */
  def d3MinHashLsh(
      spark: SparkSession,
      dir: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    val docs = Tables(spark, dir).documents
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), shingles3(col("text")).as("grams"))
    val sigs = docs.select(
      col("doc_id"),
      array((0 until numHashes).map(i =>
        array_min(transform(col("grams"), g => hash(g, lit(i))))): _*).as("sig"))
    val banded = sigs
      .select(col("doc_id"), explode(sequence(lit(0), lit(bands - 1))).as("band_id"), col("sig"))
      .select(
        col("doc_id"), col("band_id"),
        hash(col("band_id"), slice(col("sig"), col("band_id") * rowsPerBand + 1, lit(rowsPerBand)))
          .as("band_hash"))
    val candidates = banded.as("x")
      .join(banded.as("y"), Seq("band_id", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id1"), col("y.doc_id").as("doc_id2"))
      .distinct()
    val g1 = docs.select(col("doc_id").as("doc_id1"), col("grams").as("g1"))
    val g2 = docs.select(col("doc_id").as("doc_id2"), col("grams").as("g2"))
    val inter = size(array_intersect(col("g1"), col("g2"))).cast("double")
    val union = size(array_union(col("g1"), col("g2"))).cast("double")
    candidates
      .join(g1, Seq("doc_id1"))
      .join(g2, Seq("doc_id2"))
      .withColumn("jac", inter / union)
      .filter(col("jac") >= threshold)
      .select(
        col("doc_id1"), col("doc_id2"),
        floor(col("jac") * 1000000.0).cast("long").as("jaccard_micro"))
      .orderBy("doc_id1", "doc_id2")
  }

  /** d4: 60-bit SimHash fingerprints with 4×15-bit hamming bands.
    *
    * Per-gram hashes come from md5 (first 15 hex chars parsed as an
    * integer) so the oracle can reproduce them exactly in DuckDB; the bit
    * votes are folded with codegen'd `aggregate` over the gram array — the
    * whole operator is one shuffle-free projection, which is what makes it
    * viable as a 100 TB pre-pass. Documents within hamming distance 15 are
    * guaranteed to share at least one of the 4 bands (pigeonhole), so the
    * bands are the LSH bucketing key for near-dup candidate generation.
    */
  def d4SimHash(spark: SparkSession, dir: String): DataFrame = {
    val nBits = 60
    val docs = Tables(spark, dir).documents
      .filter(length(col("text")) >= 3)
      .select(
        col("doc_id"),
        transform(shingles3(col("text")), g =>
          conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("hs"))
    val bitVotes = (0 until nBits).map { i =>
      aggregate(col("hs"), lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val fp = (0 until nBits)
      .map(i => when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    docs.select(col("doc_id") +: bitVotes: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .select(
        col("doc_id"), col("simhash"),
        shiftright(col("simhash"), 0).bitwiseAND(lit(32767L)).as("band0"),
        shiftright(col("simhash"), 15).bitwiseAND(lit(32767L)).as("band1"),
        shiftright(col("simhash"), 30).bitwiseAND(lit(32767L)).as("band2"),
        shiftright(col("simhash"), 45).bitwiseAND(lit(32767L)).as("band3"))
      .orderBy("doc_id")
  }
}
