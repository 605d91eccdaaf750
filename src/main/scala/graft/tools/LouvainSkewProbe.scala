package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Louvain

/** Diagnostic: the g23 skew defense measured on a graph that actually
  * HAS a mega-community — the shape the sf corpus can't produce (its
  * bipartite transaction graph is skew-free by construction). Builds a
  * hub star (`spokes` leaves all consolidating into one community
  * within two rounds — the comdeg joins' hot key) plus a cycle of 1000
  * as a second community, then runs the identical Louvain algebra under
  * each forced route and prints wall times + label agreement. Run with
  * `runMain graft.tools.LouvainSkewProbe [spokes]`.
  */
object LouvainSkewProbe {
  def main(args: Array[String]): Unit = {
    val spokes = if (args.nonEmpty) args(0).toLong else 4000000L
    val spark = GraftSession.create("graft-louvain-skew-probe")
    import spark.implicits._
    // Hub 0 ↔ spokes 1..spokes; cycle over spokes+1 .. spokes+1000.
    val star = spark.range(1L, spokes + 1)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(1L).as("w"))
    val ringBase = spokes + 1
    val ring = spark.range(0L, 1000L)
      .select((lit(ringBase) + col("id")).as("src"),
        (lit(ringBase) + (col("id") + 1) % 1000).as("dst"), lit(1L).as("w"))
    val e = star.unionByName(ring)
    val sym = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .localCheckpoint(true)
    println(s"PROBE |sym| = ${sym.count()}")
    def run(name: String, bc: Long, bt: Int): Long = {
      val t0 = System.nanoTime()
      val cnt = Louvain.louvain(sym, broadcastComs = bc, blockThreshold = bt)
        .groupBy("community").count().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-28s $secs%8.2f s  ($cnt communities)")
      secs.toLong
    }
    // Plain: the pre-defense shape (raw shuffle join on the hot key —
    // with the probe-armed ordering this is what an unmeasured run
    // would do).
    run("plain (no defense)", 0L, Int.MaxValue)
    // Salted: hot community measured, broadcast disabled — hot probe
    // rows spread by node hash.
    run("salted (blockThreshold=10k)", 0L, 10000)
    // Broadcast: hot community measured, community count within the
    // broadcast budget — the whole dimension ships once.
    run("broadcast (hot, bc=max)", Long.MaxValue, 10000)
    spark.stop()
  }
}
