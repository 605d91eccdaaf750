package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.RoaringSet

/** Contract tests for the roaring-style compressed distinct-count
  * aggregate: pure-JVM set semantics + serialization canonicity for the
  * buffer, then the q12 plan shape (no Expand, unlike the
  * `count(distinct)` rewrite) and value agreement with the built-in on
  * real data.
  */
class RoaringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-roaring-test", master = "local[4]")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Mixed-regime key stream: clustered small ids (array→bitmap
    * containers), sparse full-range longs (singleton containers), and
    * negatives (high unsigned containers).
    */
  private def randomKeys(rng: scala.util.Random, n: Int): Array[Long] =
    Array.fill(n) {
      rng.nextInt(3) match {
        case 0 => rng.nextInt(10000).toLong
        case 1 => rng.nextLong()
        case _ => -1L - rng.nextInt(100000)
      }
    }

  test("roaring set: cardinality matches Set semantics across key regimes") {
    val rng = new scala.util.Random(41)
    (1 to 50).foreach { _ =>
      val keys = randomKeys(rng, 1 + rng.nextInt(5000))
      val rs = new RoaringSet
      keys.foreach(rs.add)
      assert(rs.cardinality === keys.toSet.size.toLong)
    }
  }

  test("roaring set: serialize is canonical and round-trips") {
    val rng = new scala.util.Random(43)
    (1 to 30).foreach { _ =>
      val keys = randomKeys(rng, 1 + rng.nextInt(3000))
      val a = new RoaringSet
      keys.foreach(a.add)
      // Same SET built in a different insertion order must serialize to
      // the same bytes (canonical container order + sorted array mode).
      val b = new RoaringSet
      rng.shuffle(keys.toSeq).foreach(b.add)
      assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
      val back = RoaringSet.deserialize(a.serialize())
      assert(back.cardinality === a.cardinality)
      assert(java.util.Arrays.equals(back.serialize(), a.serialize()))
    }
  }

  test("roaring set: k-way partitioned merge equals the direct build") {
    val rng = new scala.util.Random(47)
    (1 to 30).foreach { _ =>
      val keys = randomKeys(rng, 1 + rng.nextInt(4000))
      val direct = new RoaringSet
      keys.foreach(direct.add)
      val k = 1 + rng.nextInt(5)
      val merged = new RoaringSet
      keys.grouped(math.max(1, keys.length / k)).foreach { part =>
        // merge through the serialized form — the exact partial-aggregate
        // path Spark exercises (serialize partial, deserialize, merge)
        val partial = new RoaringSet
        part.foreach(partial.add)
        merged.merge(RoaringSet.deserialize(partial.serialize()))
      }
      assert(merged.cardinality === direct.cardinality)
      assert(java.util.Arrays.equals(merged.serialize(), direct.serialize()))
    }
  }

  test("roaring set: array→bitmap promotion boundary is exact") {
    // Exactly ArrayMax distinct lows in one container: still array mode;
    // one more promotes. Cardinality and bytes must stay consistent
    // across the boundary, including re-adding existing keys afterwards.
    val rs = new RoaringSet
    (0 until RoaringSet.ArrayMax).foreach(i => rs.add(i * 16L)) // same container (<2^16)
    assert(rs.cardinality === RoaringSet.ArrayMax.toLong)
    rs.add(1L) // forces insert past the full array → promotion path
    assert(rs.cardinality === RoaringSet.ArrayMax + 1L)
    (0 until RoaringSet.ArrayMax).foreach(i => rs.add(i * 16L)) // idempotent re-adds
    assert(rs.cardinality === RoaringSet.ArrayMax + 1L)
    val back = RoaringSet.deserialize(rs.serialize())
    assert(back.cardinality === rs.cardinality)
    // A bitmap-mode container must merge correctly into an array-mode one.
    val other = new RoaringSet
    other.add(2L)
    other.merge(RoaringSet.deserialize(rs.serialize()))
    assert(other.cardinality === RoaringSet.ArrayMax + 2L)
  }

  private def physical(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  test("q12 values agree with the built-in count(distinct) rewrite") {
    val t = Tables(spark, dir)
    val naive = t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().toSeq
    val roaring = SparkEntry.queries("q12_multi_distinct")(spark, dir)
      .collect().toSeq
    assert(roaring === naive)
    assert(roaring.nonEmpty)
  }

  test("q12 plans WITHOUT Expand; the count(distinct) form needs one") {
    val t = Tables(spark, dir)
    val q12 = SparkEntry.queries("q12_multi_distinct")(spark, dir)
    val expandsRoaring = physical(q12).collectWithSubqueries {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(physical(q12).collectWithSubqueries { case p => p }.nonEmpty)
    assert(expandsRoaring.isEmpty,
      s"roaring multi-distinct must not Expand:\n${physical(q12)}")
    // The plain count(DISTINCT) form ALSO plans without Expand now —
    // because RewriteMultiDistinctToRoaring rewrites it to the same
    // roaring aggregates (that is q15's contract). The Expand that
    // motivated q12 is still what Spark's native path produces: show it
    // on a guard case the rule leaves alone (string distinct keys).
    val naive = t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    assert(physical(naive).toString.contains("graft_roaring_distinct"),
      s"the injected rule should rewrite the plain form:\n${physical(naive)}")
    val native = t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_shipdate")).as("n_dates"),
        countDistinct(col("l_linestatus")).as("n_status"))
    val expandsNative = physical(native).collectWithSubqueries {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expandsNative.nonEmpty,
      "expected Spark's native multi-distinct rewrite (string keys stay " +
        "un-rewritten) to plan an Expand — if Spark stopped needing one, " +
        "q12's motivation note should be revisited")
  }

  test("q12 partial-aggregates map-side: two ObjectHashAggregate phases") {
    val q12 = SparkEntry.queries("q12_multi_distinct")(spark, dir)
    val aggs = physical(q12).collectWithSubqueries {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.length >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n${physical(q12)}")
  }

  test("roaring set: intersectCardinality matches Set semantics across container modes") {
    val rng = new scala.util.Random(53)
    (1 to 50).foreach { _ =>
      // Overlapping ranges so intersections are non-trivial; sizes
      // straddle the 4096 array→bitmap promotion on one or both sides.
      val ka = randomKeys(rng, 1 + rng.nextInt(6000))
      val kb = randomKeys(rng, 1 + rng.nextInt(6000)) ++ ka.take(rng.nextInt(ka.length))
      val (a, b) = (new RoaringSet, new RoaringSet)
      ka.foreach(a.add)
      kb.foreach(b.add)
      val expect = ka.toSet.intersect(kb.toSet).size.toLong
      assert(a.intersectCardinality(b) === expect)
      assert(b.intersectCardinality(a) === expect, "intersection must be symmetric")
    }
    // Forced pure-bitmap × pure-array corners.
    val big = new RoaringSet
    (0L until 5000L).foreach(big.add)
    val small = new RoaringSet
    Seq(3L, 4999L, 70000L).foreach(small.add)
    assert(big.intersectCardinality(small) === 2L)
  }

  test("q18 cohort set-ops agree with a count-distinct recompute and are internally consistent") {
    val dir01 = "/root/testdata/sf0.01"
    val got = operators.ExactRollup.q18CohortSetops(spark, dir01).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_users_a"), r.getAs[Long]("n_users_b"),
          r.getAs[Long]("returning_users"), r.getAs[Long]("churned_users"),
          r.getAs[Long]("new_users")))).toMap
    assert(got.values.exists(_._3 > 0), "degenerate gate: no returning users anywhere")
    got.values.foreach { case (na, nb, ret, churn, nw) =>
      assert(ret <= math.min(na, nb) && churn === na - ret && nw === nb - ret)
    }
    // Independent recompute: distinct user sets per half straight off the
    // events scan — no blobs, no roaring code.
    val d = Tables(spark, dir01).events
      .select(expr("ts DIV 86400000000000").cast("long").as("day"),
        col("event_type"), col("user_id"))
    val r = d.agg(min("day"), max("day")).collect()(0)
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    val sets = d.collect()
      .groupBy(x => (x.getAs[String]("event_type"), x.getAs[Long]("day") >= mid))
      .map { case (k, rows) => k -> rows.map(_.getAs[Long]("user_id")).toSet }
    val expected = sets.keys.map(_._1).toSeq.distinct.map { et =>
      val a = sets.getOrElse((et, false), Set.empty[Long])
      val b = sets.getOrElse((et, true), Set.empty[Long])
      val ret = a.intersect(b).size.toLong
      et -> ((a.size.toLong, b.size.toLong, ret, a.size - ret, b.size - ret))
    }.toMap
    assert(got === expected)
  }
}
