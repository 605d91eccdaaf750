package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot-versioned table over plain parquet — the Iceberg/Delta
  * SNAPSHOT + TIME-TRAVEL contract re-expressed with nothing but
  * immutable data files and per-version manifests (the storage half of
  * the table-format story; [[Manifest]] is the pruning half).
  *
  * The core idea is that a snapshot is a MANIFEST OF IMMUTABLE FILES,
  * not a copy of the data: committing a batch writes ONLY that batch's
  * data files plus one tiny manifest listing `parent's files + new
  * files`. Consequences, each of which is the property a 100 TB table
  * actually buys with a table format:
  *
  *   - commit cost is O(batch), never O(table) — appending a day to a
  *     100 TB fact table moves one day of bytes;
  *   - every historical version stays readable FOREVER at zero storage
  *     cost beyond its manifest (time travel: `readAsOf(v)`) because
  *     data files are shared between snapshots, not rewritten;
  *   - readers are isolated from writers for free — a reader that
  *     resolved version v's file list keeps reading exactly those files
  *     whatever commits land after it (files are never mutated, only
  *     ADDED and de-listed);
  *   - maintenance (compaction) is just another commit: new manifest,
  *     content-identical file set, old versions untouched — h5's
  *     `Layout.compact` becomes snapshot-safe by construction.
  *
  * [[commit]]/[[commitRewrite]] are the single-writer fast path (one
  * driver owns the table); [[commitOptimistic]] adds the multi-writer
  * OPTIMISTIC-CONCURRENCY protocol on top of the same manifests — the
  * version-slot rename is the commit point, exactly the Hadoop-catalog
  * convention (Iceberg's HadoopTableOperations: rename to the
  * versioned metadata path, lose the race ⇒ rebase and retry).
  *
  * Reference behavior: the loader re-runs ingest batches against an
  * ever-growing store and must never corrupt what earlier runs see
  * (mysql2neo4j.py's MERGE-driven idempotent loads); the crawl history
  * IS a sequence of snapshots.
  */
object Snapshots {

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version, 0 if the table does not exist yet. */
  def currentVersion(spark: SparkSession, path: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    val f = fs(spark)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).foldLeft(0L)(math.max)
  }

  /** Commit `batch` as the next snapshot: write the batch's data files
    * under an immutable per-version directory, then write manifest
    * version N = manifest(N−1) ∪ {new files}. Only the batch moves;
    * every inherited file is listed, never touched.
    */
  def commit(spark: SparkSession, path: String, batch: DataFrame): Long = {
    val v = currentVersion(spark, path) + 1
    batch.write.mode("overwrite").parquet(s"$path/data/batch-$v")
    val newFiles = spark.read.parquet(s"$path/data/batch-$v").inputFiles.toSeq
    import spark.implicits._
    val prev: Seq[String] =
      if (v == 1) Seq.empty
      else spark.read.parquet(s"$path/manifest/v${v - 1}")
        .as[String].collect().toSeq
    (prev ++ newFiles).toDF("file")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest/v$v")
    v
  }

  /** Atomic claim of a version slot: exclusive `mkdir` of a per-version
    * claim marker — the one primitive with exactly ONE winner at the
    * syscall level on every Hadoop filesystem (HDFS mkdir is atomic
    * server-side; POSIX mkdir is O_EXCL by definition — unlike a
    * DIRECTORY rename, whose "fail if destination exists" is a
    * check-then-act on the local filesystem and silently degrades to
    * mv-into-destination when it loses the window). Returns true iff
    * this writer owns slot v. A claim whose manifest never materialized
    * (crashed winner) is broken after `staleClaimMs` by any later
    * writer.
    */
  private def claimSlot(
      f: org.apache.hadoop.fs.FileSystem,
      path: String,
      v: Long,
      staleClaimMs: Long): Boolean = {
    val claim = new org.apache.hadoop.fs.Path(s"$path/manifest/.claim-v$v")
    val slot = new org.apache.hadoop.fs.Path(s"$path/manifest/v$v")
    try {
      val uri = f.makeQualified(claim).toUri
      if (uri.getScheme == "file")
        // The local Hadoop mkdir degrades to mkdirs (exists = success);
        // NIO createDirectory is the O_EXCL syscall — one winner.
        java.nio.file.Files.createDirectory(java.nio.file.Paths.get(uri.getPath))
      else
        org.apache.hadoop.fs.FileContext
          .getFileContext(f.getConf)
          .mkdir(claim, org.apache.hadoop.fs.permission.FsPermission.getDirDefault, false)
      // A claim can be won for a slot that already materialized if the
      // previous winner's claim cleanup raced us — the slot is the truth.
      if (f.exists(slot)) { f.delete(claim, true); false } else true
    } catch {
      case _: java.io.IOException =>
        // Lost. If the standing claim is stale (crashed winner: claim
        // present, slot never arrived, no progress for staleClaimMs),
        // break it so the table cannot wedge; the NEXT attempt re-races.
        try {
          val st = f.getFileStatus(claim)
          if (!f.exists(slot) &&
            st.getModificationTime < System.currentTimeMillis() - staleClaimMs)
            f.delete(claim, true)
        } catch { case _: java.io.IOException => () }
        false
    }
  }

  /** Multi-writer APPEND commit under optimistic concurrency. Data
    * files write first under a writer-unique immutable directory — no
    * coordination, an abandoned attempt's files are exactly what
    * [[removeOrphans]] reclaims. The commit point is an atomic
    * exclusive CLAIM of the next version slot ([[claimSlot]]'s mkdir
    * CAS) followed by a rename of the staged manifest into the slot
    * (uncontended — only the claim winner touches it; readers see the
    * version only once the rename lands). A loser deletes its staged
    * copy, REBASES on the new current version, and retries: appends
    * commute, so a rebase is just `new base's files + this batch` — no
    * validation needed; contrast [[commitRewriteOptimistic]], where a
    * lost race is a real conflict. Returns the committed version.
    */
  def commitOptimistic(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      maxAttempts: Int = 8,
      staleClaimMs: Long = 600000L): Long = {
    import spark.implicits._
    val f = fs(spark)
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    batch.write.mode("overwrite").parquet(s"$path/data/batch-$uid")
    val newFiles = spark.read.parquet(s"$path/data/batch-$uid").inputFiles.toSeq
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(spark, path)
      val v = base + 1
      val prev: Seq[String] =
        if (base == 0) Seq.empty
        else spark.read.parquet(s"$path/manifest/v$base").as[String].collect().toSeq
      val staged = s"$path/manifest/.staged-$uid-$v"
      (prev ++ newFiles).toDF("file")
        .coalesce(1).write.mode("overwrite").parquet(staged)
      if (claimSlot(f, path, v, staleClaimMs)) {
        f.rename(
          new org.apache.hadoop.fs.Path(staged),
          new org.apache.hadoop.fs.Path(s"$path/manifest/v$v"))
        f.delete(new org.apache.hadoop.fs.Path(s"$path/manifest/.claim-v$v"), true)
        return v
      }
      // Lost the race for slot v. The winner may not have renamed yet
      // (its slot is claimed but not visible): give it a beat so the
      // rebase reads the NEW manifest rather than spinning on the old.
      f.delete(new org.apache.hadoop.fs.Path(staged), true)
      val deadline = System.currentTimeMillis() + 10000L
      while (!f.exists(new org.apache.hadoop.fs.Path(s"$path/manifest/v$v")) &&
        f.exists(new org.apache.hadoop.fs.Path(s"$path/manifest/.claim-v$v")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50L)
      attempt += 1
    }
    // Give up cleanly: reclaim our own batch so the failed attempt
    // leaves no orphans, then surface the contention to the caller.
    f.delete(new org.apache.hadoop.fs.Path(s"$path/data/batch-$uid"), true)
    throw new java.util.ConcurrentModificationException(
      s"commitOptimistic: lost $maxAttempts version races on $path")
  }

  /** Multi-writer REWRITE commit (compaction under concurrency). A
    * rewrite plans against a specific base: it replaces exactly the
    * file set it read, so a commit that lands AFTER someone else's
    * means silently dropping their rows — the one thing a table format
    * must never do. Hence serializable semantics, not retry: stage the
    * manifest, attempt the slot rename for `plannedBase + 1` ONCE, and
    * on a lost race throw `ConcurrentModificationException` — the
    * caller re-plans the compaction against the new current version
    * (Iceberg's RewriteFiles validation failure). Returns the committed
    * version.
    */
  def commitRewriteOptimistic(
      spark: SparkSession,
      path: String,
      rewritten: DataFrame,
      plannedBase: Long,
      staleClaimMs: Long = 600000L): Long = {
    import spark.implicits._
    val f = fs(spark)
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val v = plannedBase + 1
    // A commit already past the planned base is a conflict before any
    // byte moves — fail fast without writing the rewrite's files.
    def conflict(): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"commitRewriteOptimistic: version $v already committed on $path — " +
          "re-plan the rewrite against the current version")
    if (currentVersion(spark, path) != plannedBase) conflict()
    rewritten.write.mode("overwrite").parquet(s"$path/data/batch-$uid")
    val newFiles = spark.read.parquet(s"$path/data/batch-$uid").inputFiles.toSeq
    val staged = s"$path/manifest/.staged-$uid-$v"
    newFiles.toDF("file")
      .coalesce(1).write.mode("overwrite").parquet(staged)
    if (claimSlot(f, path, v, staleClaimMs)) {
      f.rename(
        new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(s"$path/manifest/v$v"))
      f.delete(new org.apache.hadoop.fs.Path(s"$path/manifest/.claim-v$v"), true)
      v
    } else {
      f.delete(new org.apache.hadoop.fs.Path(staged), true)
      f.delete(new org.apache.hadoop.fs.Path(s"$path/data/batch-$uid"), true)
      conflict()
    }
  }

  /** Replace the current file set wholesale (compaction / rewrite
    * commit): `rewritten` is laid down as the new version's data files
    * and the new manifest lists ONLY them. Old versions keep their own
    * manifests and files — time travel across a compaction is exact.
    */
  def commitRewrite(spark: SparkSession, path: String, rewritten: DataFrame): Long = {
    val v = currentVersion(spark, path) + 1
    rewritten.write.mode("overwrite").parquet(s"$path/data/batch-$v")
    val newFiles = spark.read.parquet(s"$path/data/batch-$v").inputFiles.toSeq
    import spark.implicits._
    newFiles.toDF("file")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest/v$v")
    v
  }

  /** Snapshot EXPIRY (Iceberg's `expire_snapshots`): drop every version
    * below `keepFrom` and physically delete the data files NO RETAINED
    * MANIFEST references. Reference-counted at the file level, so a file
    * shared forward by later snapshots survives the expiry of the
    * version that introduced it — history is truncated, the live table
    * is byte-untouched (spec pins both). This is the storage-reclaim
    * half of the snapshot contract: without it "every version readable
    * forever" monotonically leaks the space of every rewrite commit.
    * Returns the number of data files deleted.
    *
    * The reclaim set is derived from MANIFEST ALGEBRA alone (expired ∖
    * retained, a distributed anti-join) — never from listing the data
    * tree — and deletion fans out to the executors; stray files no
    * manifest ever referenced (a crashed write's leftovers) are a
    * separate orphan-file sweep's job, as in Iceberg.
    */
  def expire(spark: SparkSession, path: String, keepFrom: Long): Int = {
    import spark.implicits._
    val f = fs(spark)
    val latest = currentVersion(spark, path)
    require(keepFrom >= 1 && keepFrom <= latest, s"keepFrom $keepFrom out of [1, $latest]")
    // PURE MANIFEST ALGEBRA, computed as a Spark job (Iceberg's
    // expire_snapshots shape): doomed = (files referenced by expired
    // manifests) ∖ (files referenced by retained manifests). No
    // directory listing of the data tree ever happens — at 10⁶-file
    // tables the listing is the latency, and every data file is
    // introduced by exactly one commit, so the manifest difference IS
    // the reclaim set. Manifests store Spark `inputFiles` URIs; both
    // sides normalize to the scheme-free URI path (file:/// vs file:/).
    // A previous expiry already dropped manifests below its own
    // keepFrom, so only the versions still present participate.
    val present: Seq[Long] = f
      .listStatus(new org.apache.hadoop.fs.Path(s"$path/manifest"))
      .map(_.getPath.getName).filter(_.startsWith("v")).map(_.drop(1).toLong)
      .sorted.toSeq
    val expiredVs = present.filter(_ < keepFrom)
    val deleted =
      if (expiredVs.isEmpty) 0
      else {
        val normPath = udf((s: String) => new java.net.URI(s).getPath)
        def union(vs: Seq[Long]): DataFrame = vs
          .map(v => spark.read.parquet(s"$path/manifest/v$v"))
          .reduce(_.union(_))
          .select(normPath(col("file")).as("file"))
          .distinct()
        val doomed = union(expiredVs)
          .join(union(present.filter(_ >= keepFrom)), Seq("file"), "left_anti")
        // Distributed delete: each task reclaims its partition's files
        // with its own FileSystem client — the driver never holds the
        // doomed list, only per-partition counts.
        org.apache.spark.sql.graft.GraftInternals
          .distributedDelete(doomed.as[String])
      }
    expiredVs.foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/manifest/v$v"), true)
    }
    deleted
  }

  /** ORPHAN-FILE sweep — the complement of [[expire]] (Iceberg's
    * `remove_orphan_files`): delete data files NO manifest of ANY
    * present version references — a crashed write's leftovers, which
    * manifest algebra can never see because no commit ever listed them.
    * This is the one maintenance path that must look at the data tree,
    * so the listing fans out over executors per batch directory
    * ([[org.apache.spark.sql.graft.GraftInternals.distributedListing]]),
    * the referenced-set anti-join runs as a Spark job, and deletion is
    * executor-side — the driver holds only the O(versions) top-level
    * directory names and the delete count. Files younger than `graceMs`
    * are spared (an in-flight commit writes data before its manifest —
    * the standard orphan-sweep race guard). Returns files deleted.
    */
  def removeOrphans(spark: SparkSession, path: String, graceMs: Long = 3600000L): Int = {
    import spark.implicits._
    val f = fs(spark)
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data")
    val manifestDir = new org.apache.hadoop.fs.Path(s"$path/manifest")
    if (!f.exists(dataDir) || !f.exists(manifestDir)) return 0
    val batchDirs = f.listStatus(dataDir).map(_.getPath.toString).toSeq
    if (batchDirs.isEmpty) return 0
    val present = f.listStatus(manifestDir)
      .map(_.getPath.getName).filter(_.startsWith("v")).map(_.drop(1).toLong).toSeq
    val normPath = udf((s: String) => new java.net.URI(s).getPath)
    val referenced = present
      .map(v => spark.read.parquet(s"$path/manifest/v$v"))
      .reduce(_.union(_))
      .select(normPath(col("file")).as("file"))
      .distinct()
    val cutoff = System.currentTimeMillis() - graceMs
    val listed = org.apache.spark.sql.graft.GraftInternals
      .distributedListing(spark, batchDirs)
      .toDF("file", "mtime")
      // Only data files participate; success markers and the like are
      // commit-local bookkeeping, not orphans.
      .filter(col("file").endsWith(".parquet") && col("mtime") < cutoff)
      .select("file")
    val orphans = listed.join(referenced, Seq("file"), "left_anti")
    val n = org.apache.spark.sql.graft.GraftInternals.distributedDelete(orphans.as[String])
    // A crashed optimistic writer's other leftovers: a staged manifest
    // that never won (or never attempted) its slot rename, or a claim
    // marker whose slot never materialized. O(writers) entries in one
    // directory, so the driver handles these directly.
    f.listStatus(manifestDir)
      .filter { s =>
        val nm = s.getPath.getName
        s.getModificationTime < cutoff &&
          (nm.startsWith(".staged-") ||
            (nm.startsWith(".claim-") &&
              !f.exists(new org.apache.hadoop.fs.Path(s"$path/manifest/${nm.stripPrefix(".claim-")}"))))
      }
      .foreach(s => f.delete(s.getPath, true))
    n
  }

  /** Time travel: the table exactly as of version `v` — a scan of
    * precisely the files version v's manifest lists. No directory
    * listing of the data tree ever happens (at 100 TB the listing is
    * the latency), and no later commit can change what this returns.
    */
  def readAsOf(spark: SparkSession, path: String, v: Long): DataFrame = {
    import spark.implicits._
    val files = spark.read.parquet(s"$path/manifest/v$v").as[String].collect()
    require(files.nonEmpty, s"snapshot v$v of $path is empty or missing")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** INCREMENTAL read: exactly the rows ADDED between versions `fromV`
    * (exclusive) and `toV` (inclusive) — the manifest set difference, so
    * the consumer of a snapshot table never rescans history (Iceberg's
    * incremental scan / Delta's change feed for the append-only case).
    * Exact because data files are immutable and append commits only ADD
    * files: the difference IS the delta. A rewrite commit (compaction)
    * breaks the append precondition by design — its manifest replaces
    * the file set — so consumers pin their cursor to pre-compaction
    * versions or resync, the same contract real table formats document.
    */
  def readBetween(spark: SparkSession, path: String, fromV: Long, toV: Long): DataFrame = {
    import spark.implicits._
    require(fromV < toV, s"fromV $fromV must precede toV $toV")
    // The set difference runs as a Spark anti-join over the two manifest
    // relations (manifests are parquet datasets, not driver lists), so
    // the driver materializes O(delta) file paths — never either
    // version's full list. At 10⁶-file tables the manifests are
    // themselves data; only what the scan genuinely needs (the delta's
    // paths, which must reach the reader anyway) ever leaves the cluster.
    val upto = spark.read.parquet(s"$path/manifest/v$toV")
    val fresh: IndexedSeq[String] =
      (if (fromV == 0) upto
       else upto.join(
         spark.read.parquet(s"$path/manifest/v$fromV"), Seq("file"), "left_anti"))
        .as[String].collect().toIndexedSeq
    // Empty delta: schema-correct empty frame off the target version's
    // own files (never the manifest's string schema).
    if (fresh.isEmpty) readAsOf(spark, path, toV).filter(lit(false))
    else spark.read.parquet(fresh: _*)
  }

  /** Build-once staging for the driver key: the events table committed
    * as three day-range batches (an append-mostly fact table growing by
    * ingest window — the canonical snapshot customer).
    */
  private def staged(spark: SparkSession, dir: String): String = {
    val base = f"/tmp/graft_snapshots/${spark.sparkContext.applicationId}/" +
      f"${dir.hashCode}%08x_${new java.io.File(dir).getName}/events"
    val marker = new java.io.File(s"$base/_built")
    if (!marker.exists()) {
      // No marker but committed versions exist: an interrupted staging
      // run left a partial v1..vK history. Resuming with more commits
      // would silently hand h10/h11 a history that never matches the
      // day-cut contract — treat it as corrupt and restage from scratch.
      if (currentVersion(spark, base) > 0) {
        val f = fs(spark)
        f.delete(new org.apache.hadoop.fs.Path(base), true)
      }
      val ev = Tables(spark, dir).events
        .select(col("event_id"), col("event_type"),
          expr("ts DIV 86400000000000").cast("long").as("day"))
      val days = ev.agg(min("day"), max("day")).head()
      val (lo, hi) = (days.getLong(0), days.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * (hi - lo) / 3
      commit(spark, base, ev.filter(col("day") <= cut1))
      commit(spark, base, ev.filter(col("day") > cut1 && col("day") <= cut2))
      commit(spark, base, ev.filter(col("day") > cut2))
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    base
  }

  /** h10: TIME TRAVEL on the correctness gate — the same aggregate
    * (rows per event type) answered against snapshots v1, v2 and v3 of
    * the staged table, all three read AFTER every commit has landed.
    * The oracle recomputes each version's answer from the raw table
    * with the same day cuts, so the driver hash-checks that historical
    * versions read back exactly the data they held at commit time —
    * file sharing, manifest isolation and the append path all on one
    * gate.
    */
  /** h11: the INCREMENTAL-consumption contract on the correctness gate —
    * the delta between snapshots v1 and v3 of the staged table (i.e.
    * batches 2 and 3, never batch 1, never a rescan of v1's files)
    * aggregated per event type. The oracle re-derives "everything after
    * the first day cut" from the raw table, so the gate fails if the
    * manifest set difference reads a byte too much or too little.
    */
  def h11IncrementalRead(spark: SparkSession, dir: String): DataFrame = {
    val base = staged(spark, dir)
    readBetween(spark, base, 1L, 3L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), min(col("day")).as("first_day"))
      .orderBy("event_type")
  }

  def h10TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val base = staged(spark, dir)
    val per = (1L to 3L).map { v =>
      readAsOf(spark, base, v)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("version", lit(v))
    }
    per.reduce(_.unionByName(_))
      .select("version", "event_type", "n_events")
      .orderBy("version", "event_type")
  }
}
