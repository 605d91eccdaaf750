package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface: a user driving the engine through `spark.sql`
  * over the registered views (plus the graft_* functions) must get the
  * same answers as the DataFrame operators — including the dedup path,
  * whose heavy lifting is native expressions reachable from SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-sql-test", master = "local[4]")
    Tables(spark, dir).createViews()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q2 revenue per nation agrees between SQL and the DataFrame operator") {
    val sql = spark.sql(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val df = operators.Relational.q2JoinAgg(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(sql === df)
  }

  test("the d3 signature/verify math is reachable from SQL via graft_* functions") {
    val sqlPairs = spark.sql(
      """WITH g AS (
        |  SELECT doc_id, graft_gram_codes(text) AS grams
        |  FROM documents WHERE length(text) >= 5)
        |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE graft_sorted_intersect(a.grams, b.grams) * 1.0 /
        |      (size(a.grams) + size(b.grams) - graft_sorted_intersect(a.grams, b.grams)) >= 0.8
        |ORDER BY doc_id1, doc_id2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // d3's keyed form no longer ends in a global sort (Verify
    // canonicalizes at dump time) — compare as sets.
    val dfPairs = dedup.Dedup.d3MinHashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlPairs.toSet === dfPairs.toSet)
    assert(dfPairs.size === dfPairs.toSet.size)
    assert(sqlPairs.nonEmpty)
  }

  test("graft_roaring_distinct is reachable from SQL and matches count(distinct)") {
    val got = spark.sql(
      """SELECT l_returnflag,
        |  graft_roaring_distinct(l_suppkey) AS n_supps,
        |  graft_roaring_distinct(l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = spark.sql(
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("roaring set algebra is reachable from SQL: store, union, intersect, cardinality") {
    // The whole store→union→intersect path in one statement: per-flag
    // daily-ish cells, two cohorts unioned as blobs, intersected exactly.
    val got = spark.sql(
      """WITH cells AS (
        |  SELECT l_returnflag AS f, l_linenumber AS seg,
        |    graft_roaring_set(l_suppkey) AS s
        |  FROM lineitem GROUP BY 1, 2),
        |coh AS (
        |  SELECT f,
        |    graft_roaring_union_blob(CASE WHEN seg <= 3 THEN s END) AS a,
        |    graft_roaring_union_blob(CASE WHEN seg > 3 THEN s END) AS b
        |  FROM cells GROUP BY f)
        |SELECT f, graft_roaring_card(a) AS na, graft_roaring_card(b) AS nb,
        |  graft_roaring_and(a, b) AS nab
        |FROM coh ORDER BY f""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = spark.sql(
      """SELECT l_returnflag AS f,
        |  count(DISTINCT CASE WHEN l_linenumber <= 3 THEN l_suppkey END) AS na,
        |  count(DISTINCT CASE WHEN l_linenumber > 3 THEN l_suppkey END) AS nb,
        |  count(DISTINCT CASE WHEN l_suppkey IN (
        |    SELECT l_suppkey FROM lineitem i
        |    WHERE i.l_returnflag = lineitem.l_returnflag AND i.l_linenumber > 3)
        |    AND l_linenumber <= 3 THEN l_suppkey END) AS nab
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    assert(got.exists(_._4 > 0), "degenerate gate: no overlap anywhere")
  }

  test("graft_zvalue is reachable from SQL and matches the Layout column form") {
    import org.apache.spark.sql.functions._
    Tables(spark, dir).events.createOrReplaceTempView("events_z")
    val got = spark.sql(
      """SELECT event_id, graft_zvalue(user_id, ts DIV 86400000000000) AS z
        |FROM events_z ORDER BY event_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables(spark, dir).events
      .select(col("event_id"),
        graft.sources.Layout.zValue(col("user_id"), expr("ts DIV 86400000000000")).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
