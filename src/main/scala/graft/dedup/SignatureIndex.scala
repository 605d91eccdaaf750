package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dedup index — the pay-at-ingest half of incremental
  * deduplication. [[Dedup.d7IncrementalDedup]] proves the asymmetric
  * incoming-vs-existing semantics but recomputes the existing side's
  * digests/signatures/grams from raw text on every batch; against a 100 TB
  * accumulated corpus that rescan IS the cost. This store writes one index
  * row per accepted document — 16-byte digest, 128-int MinHash signature,
  * packed-long gram codes — so classifying a new crawl batch touches the
  * (much smaller) index and never the historical text again. The reference
  * keeps exactly this shape in its store: a digest column checked before
  * fetch (`check_html_exists`, utils/db_utils.py:91) with the skip logic of
  * `filter_existing` (processor/data_processor.py:91-143).
  *
  * Layout: plain parquet at `path` keyed by doc_id. LSH bands are DERIVED
  * from the stored signature at read time — a cheap 32-hash projection of
  * 128 stored ints per row; materializing them would multiply the index by
  * the band count for no scan savings (the band join always reads the whole
  * index's bands once per batch). On a cluster the natural refinement is
  * bucketing the index by band_hash at write; the classify join then rides
  * the layout exchange-free on the index side.
  */
object SignatureIndex {

  private val NumHashes = 128
  private val Bands = 32
  private val RowsPerBand = NumHashes / Bands

  /** One index row per document: digest always; signature + gram codes
    * only where the text clears the shingle width (shorter docs can only
    * ever be exact dups — same rule as every d-family operator).
    */
  def buildRows(docs: DataFrame): DataFrame = {
    val longEnough = length(col("text")) >= 5
    docs.select(
      col("doc_id"),
      md5(col("text")).as("text_hash"),
      when(longEnough,
        org.apache.spark.sql.graft.VectorExpressions
          .minhashSignature(col("text"), 5, NumHashes)).as("sig"),
      when(longEnough, Dedup.gramCodes(col("text"))).as("grams"))
  }

  /** Create/replace the index from an initial corpus. */
  def write(docs: DataFrame, path: String): Unit =
    buildRows(docs).write.mode("overwrite").parquet(path)

  /** Append newly-accepted documents (call with the batch's `new` docs
    * after classification; parquet append keeps this an O(batch) write).
    */
  def append(docs: DataFrame, path: String): Unit =
    buildRows(docs).write.mode("append").parquet(path)

  private def bandsOf(withSig: DataFrame, idAs: String): DataFrame = withSig
    .filter(col("sig").isNotNull)
    .select(col("doc_id").as(idAs), explode(sequence(lit(0), lit(Bands - 1))).as("band_id"), col("sig"))
    .select(col(idAs), col("band_id"),
      hash(col("band_id"), slice(col("sig"), col("band_id") * RowsPerBand + 1, lit(RowsPerBand)))
        .as("band_hash"))

  /** Classify a new batch against the stored corpus — same output schema
    * and semantics as [[Dedup.d7IncrementalDedup]] (doc_id, status ∈
    * exact|near|new, dup_of = min matching corpus id), but every
    * existing-side artifact comes from the index scan: digest equijoin for
    * exact, signature-derived band equijoin for candidates, stored gram
    * codes for the threshold-exact Jaccard verify. The historical TEXT
    * column is never read.
    */
  def classify(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      threshold: Double = 0.8): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val index = spark.read.parquet(path)
    val inRows = buildRows(incoming.select(col("doc_id"), col("text")))
      .repartition(nPart)
      .localCheckpoint(true) // probed three times: exact, bands, verify
    val exact = inRows.select(col("doc_id"), col("text_hash"))
      .join(index.select(col("text_hash"), col("doc_id").as("ex_id")), Seq("text_hash"))
      .groupBy("doc_id")
      .agg(min(col("ex_id")).as("exact_dup_of"))
    val candidates = bandsOf(inRows, "in_id")
      .join(bandsOf(index, "ex_id"), Seq("band_id", "band_hash"))
      .select("in_id", "ex_id")
      .distinct()
      .repartition(nPart, col("in_id"), col("ex_id"))
    val n1 = size(col("g1")).cast("double")
    val n2 = size(col("g2")).cast("double")
    val inter = org.apache.spark.sql.graft.VectorExpressions
      .sortedIntersectCountLong(col("g1"), col("g2")).cast("double")
    val near = candidates
      .join(inRows.select(col("doc_id").as("in_id"), col("grams").as("g1")), Seq("in_id"))
      .join(index.select(col("doc_id").as("ex_id"), col("grams").as("g2")), Seq("ex_id"))
      .filter(least(n1, n2) / greatest(n1, n2) >= threshold)
      .filter(inter / (n1 + n2 - inter) >= threshold)
      .groupBy("in_id")
      .agg(min(col("ex_id")).as("near_dup_of"))
      .withColumnRenamed("in_id", "doc_id")
    incoming.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("exact_dup_of").isNotNull, lit("exact"))
          .when(col("near_dup_of").isNotNull, lit("near"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_dup_of"), col("near_dup_of")).as("dup_of"))
      .orderBy("doc_id")
  }
}
