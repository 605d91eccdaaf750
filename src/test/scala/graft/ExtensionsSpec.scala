package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions: every graft_* function must
  * be callable from plain SQL (that is the point of GraftExtensions), and
  * literal-parameter misuse must fail at ANALYSIS time with a real
  * AnalysisException naming the function — not an unbound-reference
  * error, NPE or ClassCastException at execution.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-ext-test", master = "local[4]")
    spark.sql("SELECT 'abcdefgh' AS t, 5 AS n").createOrReplaceTempView("ext_t")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every graft_* function is callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |  size(graft_minhash_sig(t)) AS sig_len,
        |  graft_simhash60(t) AS sh,
        |  size(graft_gram_codes(t)) AS n_grams,
        |  graft_sorted_intersect(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS inter,
        |  graft_byte_stats(encode(t, 'UTF-8')).n_bytes AS nb,
        |  aggregate(graft_byte_histogram(encode(t, 'UTF-8')), 0L, (a, x) -> a + x) AS hist_sum,
        |  graft_block_avg_hash(encode(t, 'UTF-8')) AS bah
        |FROM ext_t""".stripMargin).head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getInt(1) === 128)
    assert((row.getLong(2) >>> 60) === 0L)
    assert(row.getInt(3) === 4) // 8 chars -> 4 distinct 5-grams
    assert(row.getInt(4) === 2)
    assert(row.getLong(5) === 8L)
    assert(row.getLong(6) === 8L) // histogram bins sum to the byte count
    assert(row.getLong(7) ===
      org.apache.spark.sql.graft.BlockAvgHashKernel.compute("abcdefgh".getBytes("UTF-8")))
    val agg = spark.sql(
      """SELECT graft_bitmap_or_count(bm) AS c FROM (
        |  SELECT graft_bitmap(v) AS bm FROM VALUES (1L), (2L), (2L), (65L) AS x(v))
        |""".stripMargin).head()
    assert(agg.getLong(0) === 3L)
  }

  test("non-foldable literal parameter fails analysis with the function name") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_minhash_sig(t, n, 128) FROM ext_t").head()
    }
    assert(e.getMessage.contains("graft_minhash_sig"))
  }

  test("NULL literal parameter fails analysis, not NPE") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_simhash60(t, NULL) FROM ext_t").head()
    }
    assert(e.getMessage.contains("graft_simhash60"))
  }

  test("non-integer literal parameter fails analysis, not ClassCastException") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_gram_codes(t, 'five') FROM ext_t").head()
    }
    assert(e.getMessage.contains("graft_gram_codes"))
  }

  test("out-of-range bitmap key fails fast with the documented pointer") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bitmap(v) FROM VALUES (CAST(274877906944 AS BIGINT)) AS x(v)").head()
    }
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("graft_distinct_union_count"))
  }

  test("multi count(DISTINCT) auto-rewrites to roaring: no Expand, exact answers") {
    import org.apache.spark.sql.functions._
    val ss = spark; import ss.implicits._
    val df = Seq(
      (1L, 10L, 100, Some(7L)), (1L, 10L, 200, None), (1L, 20L, 100, Some(7L)),
      (2L, 10L, 300, Some(8L)), (2L, 10L, 300, Some(9L)))
      .toDF("g", "a", "b", "n")
    val multi = df.groupBy("g").agg(
      countDistinct(col("a")).as("da"),
      countDistinct(col("b")).as("db"),
      countDistinct(col("n")).as("dn"), // nullable: nulls excluded
      count(lit(1)).as("cnt"))
    val plan = multi.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"rewrite should eliminate Expand:\n$plan")
    assert(plan.contains("graft_roaring_distinct"), s"expected roaring aggs:\n$plan")
    val rows = multi.collect().map(r =>
      r.getAs[Long]("g") -> ((r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("dn"), r.getAs[Long]("cnt")))).toMap
    // Baselines run as SINGLE distinct aggregates (below the >=2 guard,
    // so they take Spark's native path) — cross-engine within one session.
    for ((c, pick) <- Seq(
        "a" -> ((t: (Long, Long, Long, Long)) => t._1),
        "b" -> ((t: (Long, Long, Long, Long)) => t._2),
        "n" -> ((t: (Long, Long, Long, Long)) => t._3))) {
      val single = df.groupBy("g").agg(countDistinct(col(c)).as("d")).collect()
        .map(r => r.getAs[Long]("g") -> r.getAs[Long]("d")).toMap
      single.foreach { case (g, d) => assert(pick(rows(g)) === d, s"col $c group $g") }
    }
    // Guarded cases stay native: a sum(DISTINCT) in the mix, or string keys.
    val mixed = df.groupBy("g").agg(
      countDistinct(col("a")), countDistinct(col("b")), sum_distinct(col("b")))
    assert(mixed.queryExecution.executedPlan.toString.contains("Expand"),
      "mixed distinct operators must be left to the native rewrite")
    val strings = df.withColumn("s", col("a").cast("string"))
      .groupBy("g").agg(countDistinct(col("s")), countDistinct(col("a")))
    assert(!strings.queryExecution.executedPlan.toString.contains("graft_roaring_distinct"),
      "string distinct keys must not be rewritten")
  }

  test("MV rewrite: day-range count(DISTINCT) answers from the rollup store") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.RoaringAggregates
    val ss = spark; import ss.implicits._
    val dayNs = 86400000000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-mv").toString
    // Crafted raw table: 3 days × 2 types, user overlap across days so
    // the union genuinely dedupes (day-local counts would overcount).
    val raw = (0 until 60).map { i =>
      val day = i % 3
      (i.toLong, day * dayNs + (i / 3) * 1000L, (i % 7).toLong,
        if (i % 2 == 0) "click" else "view")
    }.toDF("event_id", "ts", "user_id", "event_type")
    val src = raw.select("event_id", "ts", "user_id", "event_type")
    src.write.mode("overwrite").parquet(s"$tmp/events_raw")
    val srcPath = s"$tmp/events_raw"
    val cells = spark.read.parquet(srcPath)
      .withColumn("day", expr("ts DIV 86400000000000").cast("long"))
      .groupBy("day", "event_type")
      .agg(RoaringAggregates.roaringSetAgg(col("user_id")).as("user_set"),
        count(lit(1)).as("n_events"))
    cells.write.mode("overwrite").parquet(s"$tmp/cells")
    def q(lo: Long, hi: Long) = spark.read.parquet(srcPath)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
    def scans(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten.toSet
    val native = q(0L, 2 * dayNs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      spark.conf.set("spark.graft.rollup.source", srcPath)
      spark.conf.set("spark.graft.rollup.store", s"$tmp/cells")
      val rewritten = q(0L, 2 * dayNs)
      assert(scans(rewritten) === Set(s"$tmp/cells"),
        s"rewrite must swap the scan to the store:\n${rewritten.queryExecution.optimizedPlan}")
      assert(rewritten.collect().map(r => r.getString(0) -> r.getLong(1)).toMap === native)
      // Global (ungrouped) shape rewrites too.
      val global = spark.read.parquet(srcPath)
        .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
        .agg(countDistinct(col("user_id")).as("n_users"))
      assert(scans(global) === Set(s"$tmp/cells"))
      assert(global.head().getLong(0) ===
        spark.read.parquet(srcPath).filter(col("ts") < lit(2 * dayNs))
          .select("user_id").distinct().count())
      // Mixed shape: count(*) AND count(DISTINCT) from one cell scan.
      val mixed = spark.read.parquet(srcPath)
        .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("d"))
      assert(scans(mixed) === Set(s"$tmp/cells"), "mixed count(*)+distinct must rewrite")
      val mixedGot = mixed.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val mixedNative = spark.read.parquet(srcPath)
        .filter(col("ts") < lit(2 * dayNs))
        .groupBy("event_type")
        .agg(count(lit(1)), countDistinct(col("user_id")))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(mixedGot === mixedNative)
      // A sum(value) the cells don't carry: not answerable — stays native.
      val unanswerable = spark.read.parquet(srcPath)
        .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")), sum(col("event_id")))
      assert(scans(unanswerable) === Set(srcPath), "an aggregate outside the cells must not rewrite")
      // Misaligned bound: the cells cannot answer it — stays on the source.
      val misaligned = q(0L, 2 * dayNs - 1L)
      assert(scans(misaligned) === Set(srcPath), "misaligned range must not rewrite")
      // An extra predicate narrows rows beyond the cells — stays native.
      val extra = spark.read.parquet(srcPath)
        .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs) && col("event_id") > 5L)
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_users"))
      assert(scans(extra) === Set(srcPath), "extra predicate must not rewrite")
    } finally {
      spark.conf.set("spark.graft.rollup.source", "")
      spark.conf.set("spark.graft.rollup.store", "")
    }
    // Confs cleared: back to the native plan.
    assert(scans(q(0L, 2 * dayNs)) === Set(srcPath))
  }

  test("MV rewrite: the milli-unit SUM shape answers from the cells; raw DOUBLE sum stays native") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.RoaringAggregates
    val ss = spark; import ss.implicits._
    val dayNs = 86400000000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-mv-sum").toString
    val raw = (0 until 60).map { i =>
      (i.toLong, (i % 3) * dayNs + (i / 3) * 1000L, (i % 7).toLong,
        if (i % 2 == 0) "click" else "view", i * 0.37 - 3.1)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val srcPath = s"$tmp/events_raw"
    raw.write.mode("overwrite").parquet(srcPath)
    spark.read.parquet(srcPath)
      .withColumn("day", expr("ts DIV 86400000000000").cast("long"))
      .groupBy("day", "event_type")
      .agg(RoaringAggregates.roaringSetAgg(col("user_id")).as("user_set"),
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_value_milli"))
      .write.mode("overwrite").parquet(s"$tmp/cells")
    def scans(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten.toSet
    def statBlock() = spark.read.parquet(srcPath)
      .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
      .groupBy("event_type")
      .agg(sum(floor(col("value") * 1000).cast("long")).as("s"),
        count(lit(1)).as("n"), countDistinct(col("user_id")).as("d"))
      .orderBy("event_type")
    val native = statBlock().collect().map(_.toSeq).toSeq
    try {
      spark.conf.set("spark.graft.rollup.source", srcPath)
      spark.conf.set("spark.graft.rollup.store", s"$tmp/cells")
      // The full dashboard stat block — sum + count + distinct — from ONE
      // cell scan, bit-identical to the raw-row plan.
      val rewritten = statBlock()
      assert(scans(rewritten) === Set(s"$tmp/cells"),
        s"milli-sum must rewrite:\n${rewritten.queryExecution.optimizedPlan}")
      assert(rewritten.collect().map(_.toSeq).toSeq === native)
      // A raw DOUBLE sum(value) is NOT the stored partial (its
      // accumulation order would differ) — stays on the source.
      val rawSum = spark.read.parquet(srcPath)
        .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
        .groupBy("event_type").agg(sum(col("value")).as("s"))
      assert(scans(rawSum) === Set(srcPath), "raw DOUBLE sum must not rewrite")
      // A different scaling is not the stored partial either.
      val wrongScale = spark.read.parquet(srcPath)
        .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
        .groupBy("event_type").agg(sum(floor(col("value") * 100).cast("long")).as("s"))
      assert(scans(wrongScale) === Set(srcPath), "a non-milli scaling must not rewrite")
      // An OLD store without the milli partial cannot answer a SUM ask:
      // decline cleanly, never fail analysis.
      spark.read.parquet(s"$tmp/cells").drop("sum_value_milli")
        .write.mode("overwrite").parquet(s"$tmp/cells_old")
      spark.conf.set("spark.graft.rollup.store", s"$tmp/cells_old")
      val vsOld = statBlock()
      assert(scans(vsOld) === Set(srcPath), "a store lacking the partial must not rewrite")
      assert(vsOld.collect().map(_.toSeq).toSeq === native)
    } finally {
      spark.conf.set("spark.graft.rollup.source", "")
      spark.conf.set("spark.graft.rollup.store", "")
    }
  }

  test("MV rewrite: a stale source fingerprint blocks the rewrite") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.{RoaringAggregates, RollupStoreMeta}
    val ss = spark; import ss.implicits._
    val dayNs = 86400000000000L
    val tmp = java.nio.file.Files.createTempDirectory("graft-mv-fp").toString
    val raw = (0 until 30).map { i =>
      (i.toLong, (i % 3) * dayNs + i * 1000L, (i % 5).toLong, "click")
    }.toDF("event_id", "ts", "user_id", "event_type")
    val srcPath = s"$tmp/events_raw"
    raw.write.mode("overwrite").parquet(srcPath)
    spark.read.parquet(srcPath)
      .withColumn("day", expr("ts DIV 86400000000000").cast("long"))
      .groupBy("day", "event_type")
      .agg(RoaringAggregates.roaringSetAgg(col("user_id")).as("user_set"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(s"$tmp/cells")
    def q() = spark.read.parquet(srcPath)
      .filter(col("ts") >= lit(0L) && col("ts") < lit(2 * dayNs))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
    def scans(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toUri.getPath)
      }.flatten.toSet
    try {
      spark.conf.set("spark.graft.rollup.source", srcPath)
      spark.conf.set("spark.graft.rollup.store", s"$tmp/cells")
      spark.conf.set("spark.graft.rollup.fingerprint",
        RollupStoreMeta.fingerprint(spark, srcPath))
      // Fresh: fingerprint matches, the rewrite fires.
      assert(scans(q()) === Set(s"$tmp/cells"))
      // Mutate the source (an appended batch the cells never saw) —
      // the registered fingerprint is now stale; the rewrite must
      // decline and the query answers from the (grown) source exactly.
      Seq((100L, 0L * dayNs + 5L, 99L, "click"))
        .toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("append").parquet(srcPath)
      val after = q()
      assert(scans(after) === Set(srcPath),
        s"stale fingerprint must block the rewrite:\n${after.queryExecution.optimizedPlan}")
      // And the answer reflects the appended user (id 99 is new).
      assert(after.collect().map(_.getLong(1)).max >= 6L)
    } finally {
      spark.conf.set("spark.graft.rollup.source", "")
      spark.conf.set("spark.graft.rollup.store", "")
      spark.conf.set("spark.graft.rollup.fingerprint", "")
    }
  }
}
