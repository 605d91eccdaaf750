package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout support — the storage-side half of shuffle elimination.
  *
  * A fact table written with `bucketBy(n, key).sortBy(key)` carries its
  * hash-partitioning in the catalog: every later equi-join or aggregation
  * on `key` between co-bucketed tables plans WITHOUT a shuffle (and with
  * sorted buckets, without a sort). On a 100 TB warehouse this is the
  * difference between re-shuffling the fact table on every query and
  * paying the partitioning once at ingest: the lineitem⋈orders join in
  * BucketingSpec shows the exchange-free SortMergeJoin plan.
  *
  * Reference analog: the MySQL schema's indexed join keys
  * (leader/schema.py) — the relational engine's "pay at write time so
  * reads co-locate" lever, re-expressed in Spark's storage layer.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table in the session
    * warehouse. Drops any previous table AND its on-disk location first:
    * the default catalog is session-scoped, so a location left by an
    * earlier session is orphaned metadata-wise and would fail
    * LOCATION_ALREADY_EXISTS on create.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Idempotent ingest: (re)write `df` as a bucketed table unless an
    * up-to-date one already exists. "Up to date" is a row-count match —
    * cheap (parquet metadata counts on both sides) and sufficient for the
    * append-only ingest this models; a mutable warehouse would version the
    * table instead.
    *
    * The default catalog is session-scoped while the warehouse directory
    * is not, so a FRESH session first re-registers a layout left on disk
    * by an earlier one (CREATE TABLE ... CLUSTERED BY ... LOCATION —
    * bucket files keep their bucket-id naming, so the re-created table is
    * fully bucket-aware) and only rewrites when no valid layout exists.
    * This is what makes "pay the partitioning once at ingest" true across
    * sessions, which is the entire point of the layout.
    */
  /** Tables already verified up-to-date in this JVM: the existence probe
    * (two metadata counts + catalog lookups) is paid once per application,
    * not once per query — a repeated fact-fact join should cost the join,
    * not a re-check of the ingest it rides on. Append-only ingest model:
    * a table mutated behind a live application needs an explicit re-ingest
    * via [[writeBucketed]].
    */
  private val verified = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensureBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    // Cache key carries (key, buckets): a repeat call for the same table
    // name but a DIFFERENT layout must fall through to the real check, not
    // silently vouch for a co-location that was never written.
    val ck = spark.sparkContext.applicationId + ":" + table + ":" + key + ":" + buckets
    if (verified.contains(ck)) return
    ensureBucketedUncached(df, table, key, buckets)
    verified.add(ck)
  }

  private def ensureBucketedUncached(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    def upToDate = scala.util.Try(spark.table(table).count() == df.count()).getOrElse(false)
    // The up-to-date probe must be LAYOUT-aware, not just row-count-aware:
    // an existing table with the same name but a different bucket spec
    // must not be vouched for (the caller would silently lose the
    // exchange-free co-location it asked for). A layout mismatch is a
    // naming bug on the caller's side — fail loudly rather than clobber.
    if (spark.catalog.tableExists(table)) {
      val spec = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec
      spec.foreach { s =>
        require(s.numBuckets == buckets && s.bucketColumnNames == Seq(key),
          s"ensureBucketed: table '$table' exists with layout " +
            s"(${s.bucketColumnNames.mkString(",")} x ${s.numBuckets} buckets) but " +
            s"($key x $buckets) was requested — use a distinct table name per layout")
      }
    }
    if (spark.catalog.tableExists(table) && upToDate) return
    if (!spark.catalog.tableExists(table)) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = java.nio.file.Paths.get(warehouse, table)
      if (java.nio.file.Files.isDirectory(loc)) {
        val registered = scala.util.Try {
          spark.sql(
            s"""CREATE TABLE $table (${df.schema.toDDL})
               |USING PARQUET
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
               |LOCATION '${loc.toUri}'""".stripMargin)
          upToDate
        }.getOrElse(false)
        if (registered) return
        spark.sql(s"DROP TABLE IF EXISTS $table")
      }
    }
    writeBucketed(df, table, key, buckets)
  }

  /** Join two co-bucketed tables on their bucket key. With matching bucket
    * counts the planner emits a SortMergeJoin with no Exchange on either
    * side.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), col(leftKey) === col(rightKey))
  }
}
