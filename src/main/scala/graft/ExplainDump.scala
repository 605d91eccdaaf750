package graft

/** Dev utility: dump formatted physical plans for plan audits. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_pricing_agg", "q2_join_agg", "g1_same_group_pairs", "s1_cosine_topk", "e1_tumbling_agg")
    val spark = GraftSession.create("explain-dump")
    // Internal (pre-pin) pipelines, addressable as `_name`: eager
    // localCheckpoints cut a query's visible plan at the pin, so the
    // stages a pin hides need their own entry to be plan-auditable.
    def edges(d: String) = {
      val t = Tables(spark, d)
      t.lineitem
        .join(t.orders, org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
        .select(org.apache.spark.sql.functions.col("l_suppkey").as("s"),
          org.apache.spark.sql.functions.col("o_custkey").as("c"))
        .distinct()
    }
    val internal: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "_g20_pairs" -> ((ss, d) => operators.GraphOps.linkPredictionPairs(edges(d), 50)),
      "_g13_pairs" -> ((ss, d) => operators.GraphOps.nodeSimilarityPairs(edges(d), 50)))
    names.foreach { n =>
      println(s"===== $n =====")
      val df = internal.get(n).map(_(spark, dir))
        .getOrElse(SparkEntry.queries(n)(spark, dir))
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
