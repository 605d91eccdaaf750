package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of incremental dedup — the d7 semantics applied to an
  * unbounded ingest stream, which is how a crawl pipeline actually runs:
  * documents arrive continuously and each must pass "not already in the
  * corpus, not already seen in flight" before entering the store
  * (reference analog: the fetch loop consults `check_html_exists` per
  * item, utils/db_utils.py:91 — here that per-item lookup becomes two
  * set-oriented operators on the stream).
  *
  * Composition, all incremental-execution-safe:
  *  1. stream-static LEFT ANTI join of the incoming stream's md5 digests
  *     against the existing corpus digest index (the d1 output — at scale
  *     a bucketed table maintained at ingest; Spark re-plans the static
  *     side per micro-batch, so a growing index is picked up on refresh);
  *  2. watermarked `dropDuplicates` on the digest for IN-FLIGHT dedup:
  *     two copies arriving in the same or nearby micro-batches keep only
  *     the first, and the state store holds digests only until the
  *     watermark passes — bounded state on an unbounded stream.
  *
  * Emits the surviving (new, first-seen) documents. The near-dup half of
  * d7 composes the same way — signature projection is stateless, the
  * band probe is another stream-static join — and is exercised in batch
  * by [[Dedup.d7IncrementalDedup]]; the spec drives THIS operator with a
  * MemoryStream against the batch exact-stage semantics.
  */
object DedupStream {

  /** `docs`: streaming DataFrame with (doc_id: long, text: string,
    * ingest_ts_ns: long event time). `existingHashes`: static DataFrame
    * with a `text_hash` column (e.g. [[Dedup.d1ExactDedup]]'s output).
    */
  def incrementalDedupStream(
      docs: DataFrame,
      existingHashes: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withColumn("event_time",
        timestamp_micros((col("ingest_ts_ns") / 1000L).cast("long")))
      .withWatermark("event_time", watermarkDelay)
      .join(existingHashes.select(col("text_hash")), Seq("text_hash"), "left_anti")
      .dropDuplicates("text_hash")
      .select(col("doc_id"), col("text_hash"))
}
