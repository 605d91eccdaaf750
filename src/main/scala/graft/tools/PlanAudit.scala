package graft.tools

import graft.{GraftSession, SparkEntry}

/** Diagnostic: physical-plan shape audit for keyed queries — counts the
  * join strategies and flags cartesian products so a new operator's plan
  * can be checked against intent without reading a full explain dump.
  * `runMain graft.tools.PlanAudit <sfDir> <key1,key2,...>`; also smoke-
  * runs SparkEntry.entry (the driver's flagship check) when asked with
  * the pseudo-key `entry`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keys = if (args.length > 1) args(1).split(",").toSeq else Seq("entry")
    val spark = GraftSession.create("graft-plan-audit")
    keys.foreach {
      case "entry" =>
        println("AUDIT entry rows=" + SparkEntry.entry(spark).count())
      case k =>
        val df = SparkEntry.queries(k)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        println(s"AUDIT $k bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
          s"shj=${n("ShuffledHashJoin")} bnl=${n("BroadcastNestedLoop")} " +
          s"cartesian=${n("CartesianProduct")} exchanges=${n("Exchange")} " +
          s"wsc=${n("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
