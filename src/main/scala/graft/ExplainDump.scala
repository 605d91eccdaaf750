package graft

/** Dev utility: dump formatted physical plans for plan audits. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_pricing_agg", "q2_join_agg", "g1_same_group_pairs", "s1_cosine_topk", "e1_tumbling_agg")
    val spark = GraftSession.create("explain-dump")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
