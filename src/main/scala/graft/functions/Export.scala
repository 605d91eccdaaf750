package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-export shuffle — the deterministic seeded global shuffle +
  * sharding every pretraining data loader expects its corpus in.
  *
  * Trainers need documents in a pseudorandom order that is (a) seeded —
  * epoch 2 reshuffles by changing one string, (b) REPRODUCIBLE — a
  * preempted export job resumes/reruns to the byte-identical layout, and
  * (c) computed without a global sort of the corpus. The standard trick
  * delivers all three: order by a cryptographic hash of (seed, key).
  * md5 here — not for security but because it is the one hash every
  * engine renders identically (the oracle re-derives the full shuffle in
  * SQL), and a seeded hash of a unique key has no ties, so the order is
  * total.
  *
  * Scale shape: shard = a prefix of the hex digest (uniform by
  * construction — shard sizes concentrate tightly around corpus/shards),
  * and the plan is exactly the export's physical layout: ONE hash
  * exchange on the shard id, then a sortWithinPartitions-sized sort per
  * shard for the in-shard position. The corpus is never globally sorted
  * and no shard ever needs another shard's rows — 1000 executors write
  * 4096 shards with no coordination, which is why this shape (and not
  * `ORDER BY random()`) is how 100 TB corpora actually get shuffled.
  */
object Export {

  /** Assignment frame: (doc_id, h, shard) for a given seed. `hexChars`
    * hex characters of prefix give 16^hexChars shards.
    */
  def assign(docs: DataFrame, seed: String, hexChars: Int): DataFrame =
    docs
      .withColumn("h", md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))))
      .withColumn("shard", substring(col("h"), 1, hexChars))

  /** t28: the export manifest — every document's shard and in-shard
    * position under the seeded shuffle. The window partitions by shard
    * (the only exchange) and sorts each shard locally by the hash; a
    * writer consuming this frame emits one file per shard already in
    * final order.
    */
  def t28ShuffleExport(spark: SparkSession, dir: String,
      seed: String = "epoch0", hexChars: Int = 1): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    assign(docs, seed, hexChars)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("h"), col("pos"))
  }
}
