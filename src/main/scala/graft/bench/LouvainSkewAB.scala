package graft.bench

import org.apache.spark.sql.functions._
import graft.GraftSession

/** A/B harness for the Louvain skew defense's ARMED path — the half the
  * sf10 skew-free A/B could not measure (there the probe correctly kept
  * the defense OFF; here the fixture guarantees it arms).
  *
  * Fixture: a synthetic giant community — `hubMembers` nodes all tied to
  * one hub with heavy weights (after round 1 every member joins the
  * hub's community, making its id the hot key of both per-round comdeg
  * joins) — plus `nPairs` disjoint heavy pairs as background so the
  * community count stays large enough that the broadcast route is out
  * of reach at the A/B's levers. Route A: the salted defense armed
  * (blockThreshold well under the giant's size, broadcastComs below the
  * community count). Route B: plain shuffle joins (blockThreshold
  * effectively infinite). Labels must be identical (routing never
  * changes the algebra); wall-clock difference is what the defense buys
  * on a measured mega-key.
  *
  * Run: `sbt "runMain graft.bench.LouvainSkewAB [hubMembers] [nPairs]"`.
  */
object LouvainSkewAB {
  def main(args: Array[String]): Unit = {
    val hubMembers = if (args.length > 0) args(0).toLong else 1000000L
    val nPairs = if (args.length > 1) args(1).toLong else 500000L
    val spark = GraftSession.create("louvain-skew-ab")
    import spark.implicits._

    // Hub star: members 1..hubMembers each tied to hub 0 with weight 100.
    val star = spark.range(1L, hubMembers + 1L)
      .select(col("id").as("src"), lit(0L).as("dst"), lit(100L).as("w"))
    // Background pairs: (base+2i) — (base+2i+1), weight 100.
    val base = hubMembers + 1L
    val pairs = spark.range(0L, nPairs)
      .select((col("id") * 2 + base).as("src"),
        (col("id") * 2 + base + 1).as("dst"), lit(100L).as("w"))
    val e = star.unionByName(pairs)
    // Checkpointed per arm: releaseCaches between arms drops ALL
    // persistent blocks, so each arm builds (and pays for) its own copy.
    def symOf() = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .localCheckpoint(true)
    val sym = symOf()
    println(s"AB fixture: ${sym.count()} sym edges, hub=$hubMembers pairs=$nPairs")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"AB $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // Armed: the giant community (hubMembers+1 members after round 1)
    // crosses blockThreshold=100k; broadcastComs=1k < ~nPairs communities
    // forces the SALTED route rather than the broadcast escape.
    // Deterministic labeling checksum (a tie-broken top-k is NOT one):
    // row count, distinct communities, and Σ node·community.
    def checksum(lab: org.apache.spark.sql.DataFrame) = lab
      .agg(count(lit(1)), countDistinct(col("community")),
        sum(col("node") * col("community"))).collect()(0)
    val armed = time("salted-armed") {
      checksum(graft.operators.Louvain.louvain(
        sym, broadcastComs = 1000L, blockThreshold = 100000))
    }
    GraftSession.releaseCaches(spark)
    val sym2 = symOf()
    // Plain: defense disabled — the hot key rides one reducer.
    val plain = time("plain") {
      checksum(graft.operators.Louvain.louvain(
        sym2, broadcastComs = 1000L, blockThreshold = Int.MaxValue))
    }
    println(s"AB armed checksum: $armed")
    println(s"AB plain checksum: $plain")
    require(armed.toString == plain.toString,
      "routing must not change the labeling")
    spark.stop()
  }
}
