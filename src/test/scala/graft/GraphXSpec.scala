package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Agreement spec between the GraphX bridge and the shipped DataFrame
  * fixed-point PageRank: both engines must induce (near-)identical
  * rankings on the same graph — the evidence that the DataFrame
  * formulation is the same analysis, not a different algorithm.
  */
class GraphXSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-graphx-test", master = "local[4]")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("GraphX staticPageRank and the DataFrame fixed-point agree on the induced ranking") {
    val micro = operators.GraphIter.g6PageRank(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gx = operators.GraphXInterop.g6PageRankGraphX(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gx.keySet === micro.keySet)
    // Same top-decile membership: GraphX floats (0.15 reset, float sums)
    // vs integer micro-units can swap close neighbors, but the influence
    // ranking itself must be the same analysis.
    val k = math.max(10, micro.size / 10)
    val topMicro = micro.toSeq.sortBy { case (n, r) => (-r, n) }.take(k).map(_._1).toSet
    val topGx = gx.toSeq.sortBy { case (n, r) => (-r, n) }.take(k).map(_._1).toSet
    val overlap = topMicro.intersect(topGx).size.toDouble / k
    assert(overlap >= 0.8, f"top-$k overlap = $overlap%.2f")
  }
}
