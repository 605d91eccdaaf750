package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Manifest-based file pruning — the Iceberg/Delta data-skipping layer
  * re-expressed over plain parquet (the R12 survey item, buildable
  * without a table format in the image).
  *
  * Parquet already carries min/max stats, but they live in each file's
  * FOOTER: skipping with them still requires listing every file and
  * opening every footer — at 100 TB that is millions of S3 list+read
  * round-trips before the first data byte, repeated by every query. A
  * manifest hoists those stats into ONE tiny table written next to the
  * data: (file, min, max, rows) per data file. The query path reads the
  * manifest (KBs), intersects each file's [min,max] envelope with the
  * predicate's range DRIVER-side, and hands Spark an explicit file list
  * — the scan never sees, lists, or opens a non-matching file. Footer
  * stats then still prune row groups WITHIN the surviving files, so the
  * two layers compose (file-level coarse, row-group fine), exactly the
  * Iceberg manifest → parquet-stats cascade.
  *
  * The layout makes the envelopes selective: data is range-partitioned
  * on the stat column at write time (the 1-D sibling of h5's z-order —
  * one clustering dimension, disjoint per-file ranges), so a range
  * predicate keeps O(matching) files instead of "every file overlaps".
  * Manifest size is O(files), controlled by the write-time file sizing,
  * and the manifest itself is TIERED (Iceberg's manifest-list
  * indirection): entries live in min_v-ordered chunks of `chunkFiles`
  * files with a per-chunk envelope summary, so a range prune reads
  * O(chunks) summary rows plus only the MATCHING chunks' entries — at
  * file counts where the manifest is itself a dataset, the per-file
  * intersection still runs as a partition-pruned Spark scan, never a
  * full-manifest collect.
  *
  * Reference behavior: the loader's by-date retrieval windows over
  * career events (mysql2neo4j.py:700-829) — time-sliced reads of an
  * append-mostly fact table, the canonical manifest customer.
  */
object Manifest {

  /** Write `df` clustered by long column `statCol` into ~`nFiles`
    * range-partitioned files under `path/data`, plus a TWO-TIER stats
    * manifest: per-file envelopes under `path/manifest` (hash-laid-out
    * in `chunk=N` directories of `chunkFiles` entries each, chunked in
    * min_v order so each chunk's envelope stays tight), and the
    * per-chunk envelope summary — Iceberg's manifest list — under
    * `path/manifest_list`. One pass re-reads the written files to
    * derive the envelopes (stats are computed at write time, once per
    * ingest — never by queries); `input_file_name` keys the aggregate,
    * so the manifest is exact for the files as laid down. The chunk
    * assignment sorts the O(files) stat rows once at ingest — manifest
    * rows, not data rows.
    */
  def write(spark: SparkSession, df: DataFrame, statCol: String, path: String,
      nFiles: Int = 16, chunkFiles: Int = 1024): Unit = {
    import org.apache.spark.sql.expressions.Window
    df.repartitionByRange(nFiles, col(statCol))
      .sortWithinPartitions(statCol)
      .write.mode("overwrite").parquet(s"$path/data")
    val w = Window.orderBy(col("min_v"), col("file"))
    spark.read.parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(statCol)).as("min_v"),
        max(col(statCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .withColumn("chunk", ((row_number().over(w) - 1) / chunkFiles).cast("long"))
      .write.mode("overwrite").partitionBy("chunk").parquet(s"$path/manifest")
    // `chunk` is a partition directory, so it reads back via partition
    // type inference (int); the summary pins it to long explicitly.
    spark.read.parquet(s"$path/manifest")
      .groupBy(col("chunk").cast("long").as("chunk"))
      .agg(
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        count(lit(1)).as("n_files"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/manifest_list")
  }

  /** The pruned scan: keep exactly the files whose [min,max] envelope
    * intersects [lo, hi] (inclusive bounds — an envelope TOUCHING the
    * range may hold matching rows, so it must survive; correctness never
    * depends on the manifest being selective, only on it being an
    * envelope). The residual row filter still applies — pruning decides
    * which FILES are read, never which rows qualify.
    *
    * Two-tier cascade: the manifest LIST (O(chunks) rows) is read
    * first and its envelope filter selects which `chunk=N` manifest
    * partitions are opened at all — so at 10⁶-file tables the per-file
    * intersection scans only the matching chunks' entries, and the
    * driver materializes exactly two bounded lists: surviving chunk
    * ids, then surviving file paths (which must reach the reader
    * regardless — Spark itself runs a distributed listing job over
    * them past `parallelPartitionDiscovery.threshold`).
    */
  def scanRange(spark: SparkSession, path: String, statCol: String,
      lo: Long, hi: Long): DataFrame = {
    val chunks = spark.read.parquet(s"$path/manifest_list")
      .filter(col("max_v") >= lo && col("min_v") <= hi)
      .select("chunk")
      .collect().map(_.getLong(0))
    // isin carries INT literals so the partition-pruning filter stays on
    // the inferred partition column type (a cast would defeat pruning).
    val kept =
      if (chunks.isEmpty) Array.empty[String]
      else spark.read.parquet(s"$path/manifest")
        .filter(col("chunk").isin(chunks.map(_.toInt).toIndexedSeq: _*))
        .filter(col("max_v") >= lo && col("min_v") <= hi)
        .select("file")
        .collect().map(_.getString(0))
    val residual = col(statCol) >= lo && col(statCol) <= hi
    if (kept.isEmpty)
      // No envelope intersects: schema-only read, zero data files opened.
      spark.read.parquet(s"$path/data").filter(lit(false))
    else
      spark.read.parquet(kept.toIndexedSeq: _*).filter(residual)
  }

  /** Build-once staging path: keyed on the session AND the full dataset
    * dir (the h7 collision rule), with a completion marker so repeated
    * calls in one session reuse the layout instead of rewriting it.
    */
  private def staged(spark: SparkSession, dir: String): String = {
    val base = f"/tmp/graft_manifest/${spark.sparkContext.applicationId}/" +
      f"${dir.hashCode}%08x_${new java.io.File(dir).getName}/orders"
    val marker = new java.io.File(s"$base/_built")
    if (!marker.exists()) {
      // o_orderdate arrives as TIMESTAMP_NTZ; the cast to TIMESTAMP is
      // the identity under the session's pinned UTC zone (the Tables.events
      // convention — any other zone fails loudly there).
      val orders = Tables(spark, dir).orders
        .withColumn("ord_us", unix_micros(col("o_orderdate").cast("timestamp")))
      write(spark, orders, "ord_us", base)
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    base
  }

  /** h9: the manifest-pruned range aggregate — order counts and exact
    * revenue per priority for one calendar year, answered by a scan
    * whose FILE LIST was cut down driver-side from the manifest (the
    * spec asserts the pruned scan's `inputFiles` is a strict subset of
    * the layout). The oracle runs the same range over the raw table, so
    * the driver hash-checks "pruned scan == full scan" end to end.
    */
  def h9ManifestPrune(spark: SparkSession, dir: String): DataFrame = {
    val base = staged(spark, dir)
    val lo = java.time.LocalDate.parse("1995-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    val hi = java.time.LocalDate.parse("1996-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    val loUs = lo.getEpochSecond * 1000000L
    val hiUs = hi.getEpochSecond * 1000000L - 1L
    scanRange(spark, base, "ord_us", loUs, hiUs)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }
}
