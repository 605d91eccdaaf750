package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.Tables

/** Interchange-format ingest/egress — the boundary a production pipeline
  * actually has (upstream dumps arrive as CSV/JSONL, curated data leaves
  * as partitioned parquet).
  *
  * Two rules encode the 100 TB posture:
  *  - **Schemas are always explicit.** `inferSchema` scans the input once
  *    just to guess types (a full extra pass at scale) and guesses
  *    per-file, so two shards can disagree; every reader here takes a
  *    `StructType` and trusts it.
  *  - **Columnar + partitioned at rest.** Text formats are for the edge
  *    of the system; anything queried repeatedly is rewritten as parquet,
  *    optionally `partitionBy` a low-cardinality column so predicate
  *    pushdown prunes whole directories (FormatsSpec asserts the pruned
  *    scan).
  *
  * Reference analog: the scraper's MySQL ingest + JSON payload columns
  * (leader/schema.py) — re-expressed as schema-first file interchange.
  */
object Formats {

  /** Read newline-delimited JSON with a trusted schema. Unparseable rows
    * land in `_corrupt_record`-free PERMISSIVE nulls by default; pass
    * `failFast = true` to abort on malformed input instead (bad-shard
    * triage mode).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** Write newline-delimited JSON (one object per line — the format every
    * LLM-corpus tool chain speaks).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read headered CSV with a trusted schema (no inference pass). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Write headered CSV. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Write parquet partitioned by `cols`: each distinct combination
    * becomes a directory, so an equality/IN filter on the partition
    * columns prunes at PLANNING time — the scan never opens non-matching
    * directories. The partition columns should be low-cardinality (a
    * language tag, a date) or the small-files problem eats the win.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Overwrite ONLY the partitions present in `df`, leaving every other
    * partition's files untouched — Spark's dynamic partitionOverwriteMode,
    * the incremental-egress contract: a corrected day (or language, or
    * source) re-publishes atomically per partition without rewriting the
    * landing zone, and downstream readers of unaffected partitions never
    * see churn. STATIC mode (the default) would instead drop EVERY
    * partition before writing the batch — the difference between "replace
    * day D" and "replace the dataset", which is why the mode is set
    * explicitly per write rather than session-wide.
    */
  def overwritePartitions(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*)
      .parquet(path)

  /** h8: the incremental-egress round trip ON the correctness gate — the
    * events table leaves partitioned by day, a RETRACTION batch for the
    * middle day (its click rows removed) dynamically overwrites just that
    * partition, and the re-read landing zone must aggregate to exactly
    * "all events except day-D clicks": day D's old files really gone
    * (no doubled rows), every other day byte-untouched. The oracle
    * computes the same corrected aggregate from the raw table, so the
    * driver hash-checks the write-side semantics end to end — the same
    * posture as h7's format round trip, applied to partition lifecycle.
    */
  def h8DynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = f"/tmp/graft_dynover/${spark.sparkContext.applicationId}/" +
      f"${dir.hashCode}%08x/events"
    val ev = Tables(spark, dir).events
      .withColumn("day", expr("ts DIV 86400000000000").cast("long"))
      .select(col("day"), col("event_type"), col("user_id"))
    val b = ev.agg(min(col("day")), max(col("day"))).collect()(0)
    val midDay = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    writePartitioned(ev, path, "day")
    // The retraction batch: day D republished without its click rows.
    overwritePartitions(
      ev.filter(col("day") === midDay && col("event_type") =!= "click"),
      path, "day")
    // Partition-directory columns read back as INT; restore the LONG the
    // writer had so the output schema is stable across the round trip.
    readPartitioned(spark, path)
      .groupBy(col("day").cast("long").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id")).as("sum_users"))
      .orderBy("day", "event_type")
  }

  /** Read a partitioned parquet dataset (schema from footers — parquet is
    * self-describing, unlike the text formats).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a parquet dataset to ~`targetBytes` files: the small-files
    * remedy every long-lived warehouse needs (streaming sinks and
    * per-batch ingests accrete kilobyte files whose per-file open/footer
    * cost eventually dominates scans). File count is computed from the
    * ACTUAL on-disk bytes, the rewrite is a single round-robin
    * repartition (no skewed output files), and the write goes to a new
    * path — swap-on-success is the caller's atomic rename, so a failed
    * compaction never corrupts the live dataset.
    */
  def compactParquet(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Write ORC — the other columnar format a warehouse boundary speaks
    * (Hive-lineage systems hand over ORC the way everything else hands
    * over parquet). Same posture as parquet: self-describing, predicate
    * pushdown and column pruning at the scan (FormatsSpec asserts both
    * on the round-trip).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC (schema from file metadata). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write Avro — the ROW-oriented interchange format of the Kafka/
    * schema-registry world (columnar parquet/ORC serve scans; Avro
    * serves record streams and schema-evolving log compaction, and is
    * what a CDC feed or event-bus archive hands over). Spark 4 compiles
    * the source into spark-sql but this distribution does not register
    * the `avro` short name in its DataSourceRegister services file, so
    * the provider is addressed by class — same engine code either way.
    */
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(AvroProvider).save(path)

  /** Read Avro (schema from the container-file header — self-describing
    * like the columnar formats, unlike JSONL/CSV). Row-oriented storage
    * means column PRUNING saves decode work but never I/O bytes, and
    * filters evaluate post-read — Avro is a boundary format here:
    * anything queried repeatedly gets rewritten columnar first (the
    * FormatsSpec round-trip pins values; no pushdown assertion, because
    * the format genuinely has none to offer).
    */
  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroProvider).load(path)

  /** h7: the Avro interchange ON the correctness gate — the corpus exits
    * through the row-oriented boundary format and re-enters, and a
    * downstream aggregate over the re-read copy must hash-match the
    * oracle computed on the ORIGINAL parquet: the round-trip preserves
    * every value (longs, UTF-8 text lengths, group keys) bit-for-bit or
    * the driver's gate fails. This is the CDC-handoff contract — what an
    * event-bus archive or cross-team export actually needs from a
    * format surface, verified end-to-end rather than asserted per-type.
    * The egress write is part of the measured operator (a handoff that
    * only benches its read half isn't a handoff).
    */
  def h7AvroInterchange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, dir).documents
    // Egress path keyed on the application run AND the full dataset dir:
    // two datasets sharing a basename (.../a/sf0.1 vs .../b/sf0.1) or two
    // concurrent runs against the same dataset must never collide on the
    // staging directory.
    val path = f"/tmp/graft_avro/${spark.sparkContext.applicationId}/" +
      f"${dir.hashCode}%08x_${new java.io.File(dir).getName}/documents"
    writeAvro(docs, path)
    readAvro(spark, path)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"))
      .orderBy("lang", "source")
  }

  /** Read a parquet dataset written under EVOLVING schemas: files from
    * before a column existed merge with files from after it
    * (`mergeSchema` reconciles footers by name; rows from older files
    * read the new column as null). This is how a long-lived landing zone
    * absorbs a schema change without rewriting history — the ingest
    * keeps appending, readers see the superset schema. The footer merge
    * costs one extra pass over file METADATA only; leave it off
    * (plain `readPartitioned`) for schema-stable tables.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Read XML with a trusted schema via Spark 4's BUILT-IN xml source
    * (the former spark-xml package, folded into the engine): one row per
    * `rowTag` element, attributes surfaced as `_attr` columns by the
    * source's convention. Same schema-first posture as JSONL/CSV — no
    * inference pass over the data, PERMISSIVE nulls for malformed
    * elements unless `failFast`. This is the feed shape the reference
    * scrapes (Baike HTML/XML exports, sitemap feeds) entering the engine
    * as a declarative scan instead of a parser loop.
    */
  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: StructType, failFast: Boolean = false): DataFrame =
    spark.read
      .format("xml")
      .schema(schema)
      .option("rowTag", rowTag)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .load(path)

  /** Write XML, one `rowTag` element per row under `rootTag`. */
  def writeXml(df: DataFrame, path: String, rowTag: String,
      rootTag: String = "rows"): Unit =
    df.write.mode("overwrite")
      .format("xml")
      .option("rowTag", rowTag)
      .option("rootTag", rootTag)
      .save(path)

  /** Read raw media files via Spark's `binaryFile` source: one row per
    * file — `(path, modificationTime, length, content: binary)`. This is
    * how a media crawl on disk/object storage enters the engine: no
    * decode on read, `content` flows straight into the Media operators
    * (sniff → phash → byte-stats) exactly like a parquet blob column
    * (FormatsSpec asserts bit-identical m5 fingerprints either way).
    *
    * Scale posture: `glob` filters at LISTING time — non-matching files
    * are never opened — and the `length <= maxLength` predicate pushes
    * to the file index (metadata, no content read), EXCLUDING oversized
    * files from this reader: a stray multi-GB file would otherwise
    * materialize whole in one task, so such payloads belong to a chunked
    * reader; list them with the inverted predicate. Files split only at
    * file granularity, so millions of small files want the same
    * compaction step parquet gets ([[compactParquet]]) after first
    * ingest: read binary → write (path, content) parquet, and all
    * downstream passes scan columnar instead of re-listing the crawl.
    */
  def readBinaryFiles(
      spark: SparkSession,
      path: String,
      glob: String = "*",
      maxLength: Long = 256L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(path)
      .filter(org.apache.spark.sql.functions.col("length") <= maxLength)
}
