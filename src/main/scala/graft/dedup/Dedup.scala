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
}
