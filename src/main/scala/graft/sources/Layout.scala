package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multidimensional clustering (Z-order) for write-time layout — the
  * data-skipping lever for tables queried by MORE THAN ONE dimension.
  * Sorting by (a, b) clusters a perfectly and b not at all; interleaving
  * the bits of a and b (the Morton curve) keeps every file/row-group
  * tight in BOTH dimensions, so a 2-d box predicate prunes row groups by
  * parquet min/max stats instead of scanning one full dimension stripe.
  * At 100 TB this is the difference between "point-in-rectangle reads one
  * curve segment" and "reads 1/k of the table".
  *
  * Everything here is engine-native: the z-value is a codegen'd
  * shift/mask column expression (no UDF), the layout is
  * `repartitionByRange` + `sortWithinPartitions` on it, and the skipping
  * itself is Spark's ordinary parquet predicate pushdown hitting
  * row-group stats — the layout just makes those stats selective
  * (spec-measured: the z-ordered scan's output rows collapse vs the
  * same predicate over a single-dimension layout).
  *
  * Reference behavior: the loader's by-region × by-time organization of
  * career events (mysql2neo4j.py:700-829) — queries slice both ways, so
  * storage must serve both.
  */
object Layout {

  /** Morton/Z-value: the low `bits` bits of two non-negative longs
    * interleaved (`a` on even positions, `b` on odd). Pure shift/mask
    * arithmetic — whole-stage-codegen'd, exactly reproducible on any
    * engine (the oracle re-derives it in SQL). Single curve definition
    * shared with the `graft_zvalue` SQL function
    * ([[org.apache.spark.sql.graft.VectorExpressions.zValueExpr]]).
    */
  def zValue(a: Column, b: Column, bits: Int = 21): Column =
    org.apache.spark.sql.graft.VectorExpressions.zValueNative(a, b, bits)

  /** Write `df` clustered on the z-value of (`ca`, `cb`): range-partition
    * into `nFiles` curve segments (each task gets one contiguous z-range
    * — files are non-overlapping in z, hence tight in both source
    * dimensions), sort within partitions so row groups inside each file
    * are tight too, and keep the z-value as a column so readers can also
    * range-prune on it directly.
    */
  def writeZOrdered(
      df: DataFrame, ca: String, cb: String, path: String,
      nFiles: Int = 16, rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    df.withColumn("zval", zValue(col(ca), col(cb)))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .option("parquet.page.size", math.max(rowGroupBytes / 8, 1024L))
      .parquet(path)

  /** What [[compact]] did, for the maintenance log. */
  final case class CompactionReport(
      filesBefore: Int, filesAfter: Int, bytes: Long, rows: Long)

  /** Small-file compaction — the table-maintenance pass that keeps a
    * continuously-ingested warehouse scannable: streaming sinks and
    * per-batch upserts shatter tables into thousands of tiny files, and
    * at 100 TB the scan cost becomes task-scheduling and footer-reading
    * overhead instead of I/O. Rewrite the directory into
    * ceil(bytes/targetBytes) size-balanced files and atomically swap
    * (the [[Upsert.applyBatch]] discipline — readers never observe a
    * half-compacted table; crash before the rename leaves the original
    * untouched).
    *
    * Content is preserved exactly (spec: row multiset identical); only
    * the file layout changes. Skips (returns the current state) when the
    * directory already meets the target, so a maintenance loop is
    * idempotent and cheap to re-run. Operates on ONE leaf directory of
    * parquet files — for a partitioned table, run it per partition
    * directory (which is also the right scale unit: per-partition
    * compaction parallelizes and never rewrites cold partitions).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): CompactionReport = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(target)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    // Empty leaf dir (fresh partition, only _SUCCESS): nothing to do, and
    // spark.read.parquet on it would throw — report zeros instead so a
    // per-partition maintenance loop sails past it.
    if (dataFiles.isEmpty) return CompactionReport(0, 0, 0L, 0L)
    val bytes = dataFiles.map(_.getLen).sum
    val nAfter = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // Churn guard: rewriting N files into N (or N−ε, e.g. because the
    // compacted layout sheds per-file footer overhead and re-measures
    // slightly smaller) pays a full rewrite for no real gain — a
    // maintenance loop must converge, not oscillate. Only compact when
    // it at least halves the file count (or collapses to one file).
    if (dataFiles.length < 2 * nAfter)
      return CompactionReport(dataFiles.length, dataFiles.length, bytes,
        spark.read.parquet(path).count())
    val df = spark.read.parquet(path)
    val tmp = new Path(path + ".compact-tmp")
    // repartition (round-robin), not coalesce: coalesce would glue
    // neighboring input files into uneven outputs; the shuffle buys
    // size-balanced files, once, at maintenance time.
    df.repartition(nAfter).write.mode("overwrite").parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    // Swap via a backup rename, not delete-then-rename: a crash between
    // the two renames leaves either the original or the compacted table
    // on disk (plus a recoverable .compact-bak) — never neither.
    val bak = new Path(path + ".compact-bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    require(fs.rename(target, bak), s"backup rename failed for $path")
    require(fs.rename(tmp, target), s"atomic swap failed for $path")
    fs.delete(bak, true)
    CompactionReport(dataFiles.length, nAfter, bytes, rows)
  }

  /** h5: the z-value projection itself, keyed on the events table —
    * (event_id, user_id, day, zval). The layout write is the
    * spec-asserted surface; this keys the curve arithmetic to the
    * DuckDB oracle so the interleave is verified bit-for-bit.
    */
  def h5ZorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts DIV 86400000000000").as("day"),
        zValue(col("user_id"), expr("ts DIV 86400000000000")).as("zval"))
}
