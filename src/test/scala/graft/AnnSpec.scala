package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

/** Recall specs for the TRAINED ANN variants — the production half the
  * oracle can't check (quantizer quality has no exact SQL ground truth;
  * the measure is recall against the brute-force ranking).
  */
class AnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-ann-test", master = "local[4]")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** query_id -> top-k neighbor set. */
  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

  private def recallAt10(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  private lazy val truth = topkSets(Ann.s1CosineTopK(spark, dir))

  test("trained random-hyperplane LSH (multi-probe) reaches recall@10 >= 0.7 vs brute force") {
    val got = topkSets(Ann.s2LshAnnTrained(spark, dir))
    val r = recallAt10(got, truth)
    assert(r >= 0.7, f"s2 trained recall@10 = $r%.3f")
  }

  test("trained k-means IVF (nProbe=2) reaches recall@10 >= 0.7 vs brute force") {
    val got = topkSets(Ann.s3CentroidIvfTrained(spark, dir))
    val r = recallAt10(got, truth)
    assert(r >= 0.7, f"s3 trained recall@10 = $r%.3f")
  }

  test("k-means training is deterministic: identical centroids across runs") {
    def snap() = Ann.trainedCentroids(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("cent_id"), r.getSeq[Float](1)))
      .sortBy(_._1)
      .toSeq
    assert(snap() === snap())
  }
}
