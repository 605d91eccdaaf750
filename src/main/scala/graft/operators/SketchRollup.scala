package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pre-aggregated distinct-count rollups via HLL sketches — the pattern
  * that makes "distinct users over an arbitrary date range" an O(days)
  * query instead of an O(events) rescan at 100 TB: aggregate each (day,
  * event_type) cell ONCE into a mergeable DataSketches HLL sketch
  * (`hll_sketch_agg`, built into Spark 4 — codegen-adjacent, partial-
  * aggregating, exactly the engine-first choice over a hand-rolled
  * sketch), persist the sketch table (tiny: one ≤2^lgK-register blob per
  * cell), and answer every later range query by `hll_union_agg` over the
  * selected cells. Union is LOSSLESS for same-lgK HLL sketches, so the
  * rolled-up estimate is bit-identical to sketching the raw range
  * directly (spec-asserted) — the rollup changes cost, never answers.
  * New days append as one more sketch row each (the SignatureIndex
  * ingest discipline applied to analytics state).
  *
  * The exact/approximate boundary mirrors g4's escalation: HLL's ~1.6%
  * rsd at lgK=12 when estimates suffice; q12's roaring aggregate when
  * the count must be exact.
  *
  * Reference behavior: the loader's per-stage entity tallies
  * (mysql2neo4j.py:248-253) re-answered over time windows without
  * rescanning history.
  */
object SketchRollup {

  /** One HLL sketch of `user_id` per (day, event_type) cell, plus the
    * exact row count (free at aggregate time, useful for weighting).
    * `ts` is exact integer nanoseconds (TESTDATA nanosAsLong); the day
    * bucket is integer division, engine-portable.
    */
  def buildDaily(spark: SparkSession, dir: String, lgK: Int = 12): DataFrame =
    Tables(spark, dir).events
      .withColumn("day", expr("ts DIV 86400000000000").cast("long"))
      .groupBy(col("day"), col("event_type"))
      .agg(
        hll_sketch_agg(col("user_id"), lit(lgK)).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Distinct-user estimate per event_type over `[fromDay, toDay]`,
    * answered entirely from the sketch table: filters prune cells
    * (partition pruning when the table is written partitioned by day),
    * and the union touches one small blob per surviving cell.
    */
  def distinctUsersOverRange(
      sketches: DataFrame, fromDay: Long, toDay: Long): DataFrame =
    sketches
      .filter(col("day").between(fromDay, toDay))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"), lit(false)))
        .as("n_users_est"))
      .orderBy("event_type")
}
