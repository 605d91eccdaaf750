package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Diagnostic: where does g23's wall time go at a given SF — edge build,
  * each local-move round (via per-phase label materializations), the
  * contraction, level 2? Prints one line per phase; run with
  * `runMain graft.tools.LouvainProbe <sfDir> [l1Rounds] [l2Rounds]`.
  * Also prints the measured quantities that drive the cost model:
  * |V|, |sym|, |kic| per round, #communities per round.
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.create("graft-louvain-probe")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val t0 = System.nanoTime()
    val tb = Tables(spark, dir)
    val edges = tb.lineitem
      .join(tb.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(countDistinct(col("l_orderkey")).as("w"))
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val e1 = t("edge build+checkpoint") { val d = sym.localCheckpoint(true); d.count(); d }
    println(s"PROBE |sym| = ${e1.count()}")
    val twoM = e1.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
    val k = t("degrees") {
      val d = e1.groupBy(col("src").as("node")).agg(sum("w").as("k")).localCheckpoint(true)
      d.count(); d
    }
    println(s"PROBE |V| = ${k.count()}")
    var labels = e1.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("com")).localCheckpoint(true)
    (1 to 4).foreach { i =>
      val parity = i % 2
      val comdeg = t(s"r$i comdeg") {
        val d = labels.join(k, Seq("node")).groupBy("com").agg(sum("k").as("cd"))
          .localCheckpoint(true); d.count(); d
      }
      println(s"PROBE r$i #communities = ${comdeg.count()}")
      val kic = t(s"r$i kic") {
        val d = e1.filter(col("src") =!= col("dst"))
          .join(labels.select(col("node").as("dst"), col("com").as("c")), Seq("dst"))
          .groupBy(col("src").as("node"), col("c")).agg(sum("w").as("kic"))
          .localCheckpoint(true); d.count(); d
      }
      println(s"PROBE r$i |kic| = ${kic.count()}")
      val cand = kic.join(k, Seq("node")).join(labels, Seq("node"))
        .join(comdeg.withColumnRenamed("com", "c"), Seq("c"))
        .select(col("node"), col("c"),
          (lit(twoM) * col("kic") - col("k") * (col("cd") -
            when(col("com") === col("c"), col("k")).otherwise(lit(0L)))).as("score"))
      val best = t(s"r$i best") {
        val d = cand.groupBy("node")
          .agg(max(struct(col("score"), (-col("c")).as("nc"))).as("m"))
          .select(col("node"), (-col("m.nc")).as("bc"), col("m.score").as("bscore"))
          .localCheckpoint(true); d.count(); d
      }
      val stay = labels.join(k, Seq("node")).join(comdeg, Seq("com"))
        .join(kic.withColumnRenamed("c", "com"), Seq("node", "com"), "left")
        .select(col("node"), col("com"),
          (lit(twoM) * coalesce(col("kic"), lit(0L)) -
            col("k") * (col("cd") - col("k"))).as("sscore"))
      val next = t(s"r$i update") {
        val d = stay.join(best, Seq("node"), "left")
          .select(col("node"),
            when(pmod(col("node"), lit(2)) === lit(parity) &&
              col("bscore") > col("sscore"), col("bc"))
              .otherwise(col("com")).as("com"))
          .localCheckpoint(true); d.count(); d
      }
      labels = next
    }
    println(f"PROBE level-1 total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    val e2 = t("contraction") {
      val d = e1
        .join(labels.select(col("node").as("src"), col("com").as("cs")), Seq("src"))
        .join(labels.select(col("node").as("dst"), col("com").as("cd2")), Seq("dst"))
        .groupBy(col("cs").as("src"), col("cd2").as("dst"))
        .agg(sum("w").as("w")).localCheckpoint(true)
      d.count(); d
    }
    println(s"PROBE |e2| = ${e2.count()}")
    spark.stop()
  }
}
