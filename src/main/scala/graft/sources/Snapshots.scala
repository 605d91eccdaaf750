package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot-versioned table over plain parquet — the Iceberg/Delta
  * SNAPSHOT + TIME-TRAVEL contract re-expressed with nothing but
  * immutable data files and a TWO-TIER manifest (the storage half of
  * the table-format story; [[Manifest]] is the pruning half).
  *
  * The core idea is that a snapshot is a MANIFEST OF IMMUTABLE FILES,
  * not a copy of the data — and the manifest itself must scale the
  * same way the data does. Storage layout (Iceberg's manifest-list
  * shape):
  *
  *   - `manifest/chunks/c-*`: one immutable DELTA manifest per commit,
  *     listing only that commit's data files (column `file`) —
  *     O(batch) rows, written once, shared by every later version;
  *   - `manifest/vN`: the version's MANIFEST LIST (column `chunk`) —
  *     one row per inherited delta chunk, O(commits) rows. An append's
  *     list is `parent's chunks + the new chunk`; a rewrite's list is
  *     a single fresh chunk.
  *
  * Consequences, each of which is the property a 100 TB table
  * actually buys with a table format:
  *
  *   - commit cost is O(batch) data + O(batch) new manifest rows +
  *     O(commits) list rows — NEVER O(table-files). The driver holds
  *     only the chunk-path list (one string per commit) and the new
  *     batch's own paths; the full file list never round-trips through
  *     driver memory on the commit path (at 10⁶ files that round-trip
  *     is the Iceberg problem manifest lists exist to solve);
  *   - every historical version stays readable FOREVER at zero storage
  *     cost beyond its list (time travel: `readAsOf(v)`) because data
  *     files AND manifest chunks are shared between snapshots;
  *   - readers are isolated from writers for free — a reader that
  *     resolved version v's chunks keeps reading exactly those files
  *     whatever commits land after it (chunks are never mutated, only
  *     ADDED and de-listed);
  *   - the incremental read ([[readBetween]]) is a CHUNK-LIST set
  *     difference — O(commits) driver work — and opens only the delta
  *     chunks, so a consumer's cursor advance costs O(delta), not
  *     O(history);
  *   - maintenance (compaction) is just another commit: new chunk,
  *     content-identical file set, old versions untouched — h5's
  *     `Layout.compact` becomes snapshot-safe by construction.
  *
  * [[commit]]/[[commitRewrite]] are the single-writer fast path (one
  * driver owns the table); [[commitOptimistic]] adds the multi-writer
  * OPTIMISTIC-CONCURRENCY protocol on top of the same manifests — an
  * atomic mkdir CLAIM of the version slot, then a VERIFIED rename of
  * the staged list into it (exactly the Hadoop-catalog convention;
  * Iceberg's HadoopTableOperations renames to the versioned metadata
  * path and loses the race ⇒ rebase and retry). The rename is verified
  * by an owner marker because a directory rename is NOT a CAS on the
  * local filesystem: rename into an EXISTING directory silently nests
  * the source inside it, so a paused writer whose stale claim was
  * broken could otherwise pollute a slot a new winner already filled.
  *
  * Reference behavior: the loader re-runs ingest batches against an
  * ever-growing store and must never corrupt what earlier runs see
  * (mysql2neo4j.py's MERGE-driven idempotent loads); the crawl history
  * IS a sequence of snapshots.
  */
object Snapshots {

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def hpath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Latest committed version, 0 if the table does not exist yet. */
  def currentVersion(spark: SparkSession, path: String): Long = {
    val dir = hpath(s"$path/manifest")
    val f = fs(spark)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).foldLeft(0L)(math.max)
  }

  /** The chunk paths version `v`'s manifest list references — O(commits)
    * strings, the ONLY manifest state the driver ever materializes for a
    * version (never the per-file entries).
    */
  private def chunksOf(spark: SparkSession, path: String, v: Long): Seq[String] = {
    import spark.implicits._
    val df = spark.read.parquet(s"$path/manifest/v$v")
    // COMMIT ORDER is part of the manifest contract (merge-on-read
    // delete scoping is positional — see [[deleteScopedSegments]]):
    // lists written with an explicit `pos` column sort by it; legacy
    // single-column lists fall back to file order (one coalesced part
    // file, row order as written).
    if (df.columns.contains("pos"))
      df.orderBy(col("pos")).select("chunk").as[String].collect().toSeq
    else df.select("chunk").as[String].collect().toSeq
  }

  /** Per-version key→value properties (Iceberg's snapshot summary) —
    * the O(1) metadata that must SURVIVE rewrites: every commit path
    * writes `parent props ++ overlay`, so a compaction that resets the
    * chunk list still carries e.g. the streaming ingest watermark
    * forward. The props file lands BEFORE the manifest list (the list
    * is the commit point; an orphaned props file for a version that
    * never materialized is overwritten by the slot's eventual winner).
    */
  private def propsOf(
      spark: SparkSession, path: String, v: Long): Map[String, String] = {
    // Walk back to the latest present props file at or below v: every
    // commit path inherits, so the most recent file IS v's effective
    // set — and a single missed write (an optimistic winner crashing
    // between publish and props) cannot break the chain. O(versions)
    // existence probes worst case, one parquet read.
    val f = fs(spark)
    var cur = v
    while (cur >= 1 && !f.exists(hpath(s"$path/manifest/props/p-v$cur"))) cur -= 1
    if (cur < 1) Map.empty
    else spark.read.parquet(s"$path/manifest/props/p-v$cur").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  private def writeProps(
      spark: SparkSession, path: String, v: Long,
      props: Map[String, String]): Unit = {
    import spark.implicits._
    if (props.nonEmpty)
      props.toSeq.toDF("key", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/manifest/props/p-v$v")
  }

  /** Inherit the parent version's props (plus `overlay`) into version
    * `v` — called by EVERY commit path so no rewrite loses them.
    */
  private def inheritProps(
      spark: SparkSession, path: String, v: Long,
      overlay: Map[String, String] = Map.empty): Unit =
    writeProps(spark, path, v, propsOf(spark, path, v - 1) ++ overlay)

  /** Union scan of a chunk set. Chunks written before a table adopted
    * file stats carry only `file`; stats-bearing chunks add
    * `min_<col>`/`max_<col>` pairs — mergeSchema reconciles the two
    * generations (footer-level work over O(commits) tiny files), and a
    * stats-less entry simply reads back NULL bounds, which every pruning
    * consumer treats as "unknown ⇒ keep".
    */
  private def readChunks(spark: SparkSession, chunks: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(chunks: _*)

  /** A version's chunk list split into DATA chunks (file entries, under
    * `manifest/chunks/`) and DELETE chunks (merge-on-read key sets,
    * under `manifest/deletes/` — see [[deleteByKey]]). The split is by
    * path, so the manifest list schema never changed and pre-delete
    * tables read back with an empty delete side.
    */
  private def splitChunks(chunks: Seq[String]): (Seq[String], Seq[String]) =
    chunks.partition(c => !c.contains("/deletes/"))

  /** The outstanding merge-on-read delete set of version `v` as ONE
    * key frame (None when the version carries no delete chunks). All
    * delete chunks of a table share one key column by construction
    * ([[deleteByKey]] enforces it against the outstanding set).
    */
  private def deletesOf(
      spark: SparkSession, path: String, v: Long): Option[DataFrame] = {
    val dels = splitChunks(chunksOf(spark, path, v))._2
    if (dels.isEmpty) None
    else Some(readChunks(spark, dels).distinct())
  }

  /** Write one immutable delta chunk listing exactly `files`; returns the
    * chunk path. O(batch) rows — the only per-file manifest rows a commit
    * ever writes.
    */
  private def writeChunk(
      spark: SparkSession, path: String, uid: String, files: Seq[String]): String = {
    import spark.implicits._
    val chunk = s"$path/manifest/chunks/c-$uid"
    files.toDF("file").coalesce(1).write.mode("overwrite").parquet(chunk)
    chunk
  }

  /** Write version `v`'s manifest list (one row per chunk path, with an
    * explicit commit-order position — delete scoping is positional).
    */
  private def writeList(
      spark: SparkSession, dest: String, chunks: Seq[String]): Unit = {
    import spark.implicits._
    chunks.zipWithIndex.map { case (c, i) => (c, i) }
      .toDF("chunk", "pos").coalesce(1).write.mode("overwrite").parquet(dest)
  }

  /** Write one immutable delta chunk carrying per-file MIN/MAX bounds for
    * `statsCols` next to each file entry — Iceberg's column-stats
    * manifest entries, the metadata that turns a snapshot read into a
    * PLANNED scan ([[readAsOfPruned]]) and a MERGE into a partial rewrite
    * ([[mergeInto]]). The bounds come from ONE executor-side aggregate
    * over the freshly written batch (`input_file_name()` groupBy —
    * O(batch) rows in, O(batch-files) rows out); the driver never sees
    * row data and the chunk stays O(batch). Stats columns are stored as
    * LONG bounds (`min_<col>`/`max_<col>`) — the integer-key/day/ts
    * family every pruning predicate in the suite ranges over; a column
    * that cannot cast to long would surface as an analysis error here,
    * at write time, not silently at plan time.
    */
  private def writeStatsChunk(
      spark: SparkSession,
      path: String,
      uid: String,
      dataDir: String,
      statsCols: Seq[String]): String = {
    val chunk = s"$path/manifest/chunks/c-$uid"
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).cast("long").as(s"min_$c"),
        max(col(c)).cast("long").as(s"max_$c"))
    }
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1).write.mode("overwrite").parquet(chunk)
    chunk
  }

  /** Commit `batch` as the next snapshot: write the batch's data files
    * under an immutable per-version directory, one delta chunk listing
    * them, and manifest list N = list(N−1) + that chunk. Only the batch
    * moves; every inherited file is referenced through its original
    * chunk, never relisted — commit manifest cost is O(batch) entry rows
    * plus O(commits) list rows, and the driver never holds the table's
    * file list.
    */
  def commit(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      statsCols: Seq[String] = Nil,
      uid: Option[String] = None,
      props: Map[String, String] = Map.empty): Long = {
    val v = currentVersion(spark, path) + 1
    val dataDir = s"$path/data/batch-${uid.getOrElse(v.toString)}"
    batch.write.mode("overwrite").parquet(dataDir)
    val chunkUid = uid.getOrElse(s"v$v")
    val chunk =
      if (statsCols.isEmpty)
        writeChunk(spark, path, chunkUid, spark.read.parquet(dataDir).inputFiles.toSeq)
      else writeStatsChunk(spark, path, chunkUid, dataDir, statsCols)
    val prev = if (v == 1) Seq.empty[String] else chunksOf(spark, path, v - 1)
    inheritProps(spark, path, v, props)
    writeList(spark, s"$path/manifest/v$v", prev :+ chunk)
    v
  }

  /** MERGE-ON-READ delete (Iceberg v2 equality-delete files / Delta
    * deletion vectors): commit a DELETE of every row whose `keyCol` is
    * in `keys` by writing ONLY the key set — one delete chunk under
    * `manifest/deletes/`, O(deleted keys) bytes — and a new manifest
    * list referencing it next to the untouched data chunks. NO data
    * file is opened, rewritten, or moved: this is the other half of the
    * COW/MoR duality — [[mergeInto]] pays at write time (rewrite the
    * touched files, reads stay pure scans), deleteByKey pays at READ
    * time ([[readAsOf]] applies the outstanding delete set as an
    * anti-join), which is the right trade when deletes are frequent,
    * small, or latency-critical (a GDPR erasure against a 100 TB table
    * must not rewrite a terabyte of files to drop a thousand rows).
    * The debt is bounded and dischargeable: [[compactClustered]] (or
    * any rewrite commit) reads THROUGH the delete set and commits a
    * resolved file set with a fresh chunk list — the delete chunks
    * simply stop being referenced, and [[expire]] reclaims them.
    *
    * All outstanding delete chunks must share one key column (mixed-key
    * anti-joins would need per-column passes; enforced loudly here).
    * Older snapshots are untouched — time travel to a pre-delete
    * version still sees the rows, exactly the Iceberg contract.
    *
    * Semantics note: deletes are SCOPED BY COMMIT ORDER (Iceberg's
    * sequence-number semantics): a delete chunk applies only to data
    * chunks listed BEFORE it in the manifest list, so a row appended
    * AFTER the delete — a streamed re-insert of a previously deleted
    * key — survives the read. [[mergeInto]] still refuses while deletes
    * are outstanding (its candidate rewrite reads files without their
    * delete set and would resurrect rows); plain appends need no guard.
    */
  def deleteByKey(
      spark: SparkSession, path: String, keys: DataFrame, keyCol: String): Long = {
    val v0 = currentVersion(spark, path)
    require(v0 >= 1, s"deleteByKey: no committed snapshot at $path")
    deletesOf(spark, path, v0).foreach { d =>
      require(d.columns.sameElements(Array(keyCol)),
        s"deleteByKey: outstanding deletes key on ${d.columns.mkString(",")}, not $keyCol — " +
          "compact to resolve them before deleting on a different key")
    }
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val chunk = s"$path/manifest/deletes/d-$uid"
    keys.select(col(keyCol)).distinct()
      .coalesce(1).write.mode("overwrite").parquet(chunk)
    val v = v0 + 1
    inheritProps(spark, path, v)
    writeList(spark, s"$path/manifest/v$v", chunksOf(spark, path, v0) :+ chunk)
    v
  }

  /** EXACTLY-ONCE streaming ingest commit: append microbatch `batchId`
    * unless the table's INGEST WATERMARK already covers it. The
    * watermark (max committed batch id, keyed per `queryId` so two
    * streams can share one table) lives in the version props and every
    * commit path — including rewrites — inherits it forward: this is
    * Iceberg/Delta's stamp-the-batch-id-in-the-snapshot-summary
    * discipline, and it is what a chunk-NAME guard cannot give, because
    * a compaction resets the chunk list and a post-compaction replay
    * would find no trace of the batch and recommit it. The watermark
    * props write lands with the commit's own manifest list (props
    * first, list = the commit point), so a crash at any point either
    * never advanced the version (recommit under a FRESH uid — the
    * previous attempt's data dir is never reused and its files are the
    * orphan sweep's) or advanced it with the watermark in place (skip).
    * Batch ids are per-query monotonic (the Structured Streaming
    * contract), so `batchId <= watermark` IS "already committed".
    * Returns the table version holding (or already covering) the batch.
    */
  def ingestBatch(
      batch: DataFrame, batchId: Long, path: String,
      statsCols: Seq[String] = Nil, queryId: String = "q"): Long = {
    val spark = batch.sparkSession
    val key = s"ingest.watermark.$queryId"
    val v0 = currentVersion(spark, path)
    val covered = propsOf(spark, path, v0).get(key).exists(_.toLong >= batchId) ||
      // Pre-watermark tables (no props generation): the legacy
      // chunk-name guard still recognizes their committed batches.
      (v0 >= 1 && chunksOf(spark, path, v0).exists(_.endsWith(s"/c-ingest-$batchId")))
    if (covered) v0
    else {
      val rand = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      commit(spark, path, batch, statsCols,
        uid = Some(s"ingest-$queryId-$batchId-$rand"),
        props = Map(key -> batchId.toString))
    }
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
    val claim = hpath(s"$path/manifest/.claim-v$v")
    val slot = hpath(s"$path/manifest/v$v")
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

  /** Scrub an ORPHANED props file from a freshly claimed slot. The
    * single-writer [[commit]] path writes props BEFORE its manifest list
    * (list = commit point), so a writer that crashed between the two
    * leaves `p-v$v` with no `v$v` — harmless alone ([[propsOf]] walks
    * past absent LISTS, but reads the latest PRESENT props file), yet
    * poisonous if an optimistic writer later fills slot v and crashes
    * before its own [[inheritProps]]: the published v would permanently
    * carry the dead writer's props, and a crashed-ingest watermark
    * resurfacing that way makes a replayed [[ingestBatch]] skip (= drop)
    * its batch. The claim makes this writer the slot's sole owner, so
    * deleting the orphan here races nobody whose commit can still land:
    * any props file at a claimed-but-unpublished slot belongs to a
    * writer whose commit never happened.
    *
    * ONE window survives the claim argument: a claimant paused longer
    * than staleClaimMs between winning the claim and arriving here can
    * have had its claim BROKEN, the slot published by a second writer,
    * and that writer's props inherited — deleting now would hit a LIVE
    * props file. Hence the delete re-verifies the slot is still absent
    * immediately first (a published v$v means our claim is dead; we
    * must touch nothing — publishStaged will then refuse our rename by
    * the owner-marker check). The residual instants-wide TOCTOU between
    * the existence probe and the delete is benign TODAY only because
    * both optimistic commit paths write overlay-free inherited props
    * ([[inheritProps]] copies v-1's map verbatim, and [[propsOf]]'s
    * walk-back to v-1 reconstructs the identical map when p-v$v is
    * missing) — if an optimistic path ever writes NEW keys into its
    * props, replace this probe with an owner-fenced props protocol
    * (stage under the writer uid and publish by rename, like the lists).
    */
  private def clearOrphanProps(
      f: org.apache.hadoop.fs.FileSystem, path: String, v: Long): Unit =
    try {
      if (!f.exists(hpath(s"$path/manifest/v$v")))
        f.delete(hpath(s"$path/manifest/props/p-v$v"), true)
    } catch { case _: java.io.IOException => () }

  /** Publish a staged manifest list into version slot `v` — the VERIFIED
    * commit point. The staged directory carries an `_owner-<uid>` marker
    * (parquet readers ignore `_`-prefixed files); after the rename the
    * marker must sit at the slot's TOP LEVEL, which proves the rename was
    * a true move and not the local filesystem's silent mv-INTO-existing-
    * destination (the failure mode when a paused writer's stale claim was
    * broken and a new winner already filled the slot: the paused writer's
    * rename then NESTS its staged dir inside the live slot, and a naive
    * reader of the slot would see both lists). Returns true iff this
    * writer's staged list IS the slot; on any failure the slot is left
    * exactly as the other winner published it (a nested pollution dir is
    * removed by ITS OWN deterministic name) and the staged copy is gone.
    */
  private[graft] def publishStaged(
      f: org.apache.hadoop.fs.FileSystem,
      staged: String,
      slot: String,
      uid: String): Boolean = {
    val stagedP = hpath(staged)
    val marker = s"_owner-$uid"
    f.create(hpath(s"$staged/$marker"), true).close()
    val renamed =
      try f.rename(stagedP, hpath(slot))
      catch { case _: java.io.IOException => false }
    if (renamed && f.exists(hpath(s"$slot/$marker"))) true
    else {
      // Either the rename failed outright, or it "succeeded" by nesting
      // us inside a slot someone else owns — undo precisely our debris.
      val nested = hpath(s"$slot/${stagedP.getName}")
      if (f.exists(nested)) f.delete(nested, true)
      if (f.exists(stagedP)) f.delete(stagedP, true)
      false
    }
  }

  /** Multi-writer APPEND commit under optimistic concurrency. Data
    * files and the delta chunk write first under writer-unique immutable
    * paths — no coordination, an abandoned attempt's files are exactly
    * what [[removeOrphans]] reclaims. The commit point is an atomic
    * exclusive CLAIM of the next version slot ([[claimSlot]]'s mkdir
    * CAS) followed by a VERIFIED rename of the staged manifest list into
    * the slot ([[publishStaged]] — the rename result is checked and the
    * owner marker re-read, so a failed or nested rename can never report
    * the batch as committed). A loser deletes its staged copy, REBASES
    * on the new current version, and retries: appends commute, so a
    * rebase is just `new base's chunks + this chunk` — an O(commits)
    * list rewrite, no data or chunk movement; contrast
    * [[commitRewriteOptimistic]], where a lost race is a real conflict.
    * Returns the committed version.
    */
  def commitOptimistic(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      maxAttempts: Int = 8,
      staleClaimMs: Long = 600000L): Long = {
    val f = fs(spark)
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    batch.write.mode("overwrite").parquet(s"$path/data/batch-$uid")
    val newFiles = spark.read.parquet(s"$path/data/batch-$uid").inputFiles.toSeq
    // The delta chunk is base-independent: written once, reused verbatim
    // by every rebase attempt.
    val chunk = writeChunk(spark, path, uid, newFiles)
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(spark, path)
      val v = base + 1
      val prev = if (base == 0) Seq.empty[String] else chunksOf(spark, path, base)
      val staged = s"$path/manifest/.staged-$uid-$v"
      writeList(spark, staged, prev :+ chunk)
      if (claimSlot(f, path, v, staleClaimMs)) {
        clearOrphanProps(f, path, v)
        val published = publishStaged(f, staged, s"$path/manifest/v$v", uid)
        // Claim bookkeeping: if we published, release our claim; if the
        // publish failed despite a won claim (broken-stale-claim race —
        // the slot was already someone else's), the marker for a live
        // slot is dead weight either way.
        f.delete(hpath(s"$path/manifest/.claim-v$v"), true)
        // Props inherit AFTER the verified publish (single winner per
        // slot — no overwrite race). A crash in this window loses only
        // inheritance for v, and the next commit re-inherits from v-1's
        // still-present props; ingest watermarks go through the
        // single-writer [[commit]] path, never this one.
        if (published) { inheritProps(spark, path, v); return v }
      } else {
        // Lost the race for slot v. The winner may not have renamed yet
        // (its slot is claimed but not visible): give it a beat so the
        // rebase reads the NEW manifest rather than spinning on the old.
        f.delete(hpath(staged), true)
        val deadline = System.currentTimeMillis() + 10000L
        while (!f.exists(hpath(s"$path/manifest/v$v")) &&
          f.exists(hpath(s"$path/manifest/.claim-v$v")) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50L)
      }
      attempt += 1
    }
    // Give up cleanly: reclaim our own batch and chunk so the failed
    // attempt leaves no orphans, then surface the contention to the caller.
    f.delete(hpath(s"$path/data/batch-$uid"), true)
    f.delete(hpath(chunk), true)
    throw new java.util.ConcurrentModificationException(
      s"commitOptimistic: lost $maxAttempts version races on $path")
  }

  /** Multi-writer REWRITE commit (compaction under concurrency). A
    * rewrite plans against a specific base: it replaces exactly the
    * file set it read, so a commit that lands AFTER someone else's
    * means silently dropping their rows — the one thing a table format
    * must never do. Hence serializable semantics, not retry: stage the
    * manifest list, attempt the verified slot publish for
    * `plannedBase + 1` ONCE, and on a lost race throw
    * `ConcurrentModificationException` — the caller re-plans the
    * compaction against the new current version (Iceberg's RewriteFiles
    * validation failure). Returns the committed version.
    */
  def commitRewriteOptimistic(
      spark: SparkSession,
      path: String,
      rewritten: DataFrame,
      plannedBase: Long,
      staleClaimMs: Long = 600000L): Long = {
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
    val chunk = writeChunk(spark, path, uid, newFiles)
    val staged = s"$path/manifest/.staged-$uid-$v"
    writeList(spark, staged, Seq(chunk))
    val won = claimSlot(f, path, v, staleClaimMs) && {
      clearOrphanProps(f, path, v)
      val published = publishStaged(f, staged, s"$path/manifest/v$v", uid)
      f.delete(hpath(s"$path/manifest/.claim-v$v"), true)
      published
    }
    if (won) { inheritProps(spark, path, v); v }
    else {
      f.delete(hpath(staged), true)
      f.delete(hpath(s"$path/data/batch-$uid"), true)
      f.delete(hpath(chunk), true)
      conflict()
    }
  }

  /** Replace the current file set wholesale (compaction / rewrite
    * commit): `rewritten` is laid down as the new version's data files
    * and the new manifest list references ONLY its fresh chunk. Old
    * versions keep their own chunks and files — time travel across a
    * compaction is exact.
    */
  def commitRewrite(
      spark: SparkSession, path: String, rewritten: DataFrame,
      statsCols: Seq[String] = Nil): Long = {
    val v = currentVersion(spark, path) + 1
    val dataDir = s"$path/data/batch-$v"
    rewritten.write.mode("overwrite").parquet(dataDir)
    val chunk =
      if (statsCols.isEmpty)
        writeChunk(spark, path, s"v$v", spark.read.parquet(dataDir).inputFiles.toSeq)
      else writeStatsChunk(spark, path, s"v$v", dataDir, statsCols)
    // A rewrite resets the chunk list but must NOT reset the table's
    // props — the ingest watermark surviving compaction is what keeps
    // exactly-once exactly-once.
    inheritProps(spark, path, v)
    writeList(spark, s"$path/manifest/v$v", Seq(chunk))
    v
  }

  /** CLUSTERING COMPACTION through the snapshot format (Iceberg
    * `rewrite_data_files` with a sort order / Delta OPTIMIZE ZORDER BY):
    * rewrite the current version range-clustered on `clusterCols` (one
    * column = range sort; two = the h5 Morton z-curve, locality in both)
    * and commit with fresh per-file stats. Content is byte-for-byte the
    * same multiset — what changes is WHERE rows sit: after N streaming
    * appends each spanning the full key range, every file's min/max
    * covers everything and [[readAsOfPruned]] can skip NOTHING; after
    * clustering, files are tight, disjoint key ranges and a point/range
    * predicate prunes to O(matching) files (spec-pinned: pruning goes
    * from vacuous to selective across this call, answers identical).
    * Stats-driven skipping and clustering are two halves of ONE design —
    * either alone is dead weight, together scan cost tracks query
    * selectivity instead of table size. Old versions keep their chunks;
    * time travel across the compaction is exact, and the superseded
    * files are [[expire]]'s to reclaim. Single-writer; under concurrency
    * use [[commitRewriteOptimistic]] with the same clustered frame.
    */
  def compactClustered(
      spark: SparkSession, path: String, clusterCols: Seq[String],
      nFiles: Int = 16): Long = {
    require(clusterCols.nonEmpty && clusterCols.size <= 2,
      "cluster on one column (range) or two (z-curve)")
    // mergeSchema: compaction REWRITES the current version, so on a
    // schema-evolved table (h14) the read must reconcile generations —
    // an un-merged read infers the schema from an arbitrary footer and
    // would silently drop the post-evolution column from the rewritten
    // snapshot (permanent loss in the new current version).
    val cur = readAsOf(spark, path, currentVersion(spark, path), mergeSchema = true)
    val keyed =
      if (clusterCols.size == 1) cur.withColumn("_ck", col(clusterCols.head))
      else cur.withColumn("_ck",
        Layout.zValue(col(clusterCols.head), col(clusterCols(1))))
    val clustered = keyed
      .repartitionByRange(nFiles, col("_ck"))
      .sortWithinPartitions("_ck")
      .drop("_ck")
    commitRewrite(spark, path, clustered, statsCols = clusterCols)
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
    * The reclaim set is derived from MANIFEST ALGEBRA alone — first at
    * the CHUNK tier (doomed chunks = expired lists' chunks ∖ retained
    * lists' chunks, an O(commits) driver set difference), then a
    * distributed anti-join over only the affected chunks' entries —
    * never from listing the data tree; deletion fans out to the
    * executors. De-listed chunks are reclaimed along with their files;
    * stray files no manifest ever referenced (a crashed write's
    * leftovers) are the orphan sweep's job, as in Iceberg.
    */
  def expire(spark: SparkSession, path: String, keepFrom: Long): Int = {
    import spark.implicits._
    val f = fs(spark)
    val latest = currentVersion(spark, path)
    require(keepFrom >= 1 && keepFrom <= latest, s"keepFrom $keepFrom out of [1, $latest]")
    val present: Seq[Long] = f
      .listStatus(hpath(s"$path/manifest"))
      .map(_.getPath.getName).filter(_.startsWith("v")).map(_.drop(1).toLong)
      .sorted.toSeq
    val expiredVs = present.filter(_ < keepFrom)
    val deleted =
      if (expiredVs.isEmpty) 0
      else {
        // Chunk-tier algebra: a chunk referenced by ANY retained version
        // survives with all its entries; only chunks referenced
        // exclusively by expired versions can carry doomed files.
        val retainedChunks = present.filter(_ >= keepFrom)
          .flatMap(v => chunksOf(spark, path, v)).distinct
        val doomedChunks = expiredVs
          .flatMap(v => chunksOf(spark, path, v)).distinct
          .filterNot(retainedChunks.toSet)
        // File reference-counting runs over DATA chunks only; a doomed
        // DELETE chunk carries no file entries — its directory is
        // reclaimed with the rest below.
        val doomedData = splitChunks(doomedChunks)._1
        val retainedData = splitChunks(retainedChunks)._1
        if (doomedData.isEmpty) { doomedChunks.foreach(c => f.delete(hpath(c), true)); 0 }
        else {
          // File-tier anti-join (a Spark job over manifest entries, the
          // driver never holds either file list): a doomed chunk's file
          // could in principle be relisted by a retained chunk — keep the
          // reference count exact rather than assuming chunk disjointness.
          // Manifests store Spark `inputFiles` URIs; both sides normalize
          // to the scheme-free URI path (file:/// vs file:/).
          val normPath = udf((s: String) => new java.net.URI(s).getPath)
          def entries(chunks: Seq[String]): DataFrame =
            readChunks(spark, chunks)
              .select(normPath(col("file")).as("file")).distinct()
          val doomed =
            if (retainedData.isEmpty) entries(doomedData)
            else entries(doomedData)
              .join(entries(retainedData), Seq("file"), "left_anti")
          val n = org.apache.spark.sql.graft.GraftInternals
            .distributedDelete(doomed.as[String])
          doomedChunks.foreach(c => f.delete(hpath(c), true))
          n
        }
      }
    expiredVs.foreach(v => f.delete(hpath(s"$path/manifest/v$v"), true))
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
    * directory names, the O(commits) chunk paths and the delete count.
    * Files younger than `graceMs` are spared (an in-flight commit writes
    * data before its manifest — the standard orphan-sweep race guard).
    * A crashed optimistic writer's OTHER leftovers go in the same pass:
    * staged lists that never published, claim markers whose slot never
    * materialized, and delta chunks no present version references.
    * Returns data files deleted.
    */
  def removeOrphans(spark: SparkSession, path: String, graceMs: Long = 3600000L): Int = {
    import spark.implicits._
    val f = fs(spark)
    val dataDir = hpath(s"$path/data")
    val manifestDir = hpath(s"$path/manifest")
    if (!f.exists(dataDir) || !f.exists(manifestDir)) return 0
    val batchDirs = f.listStatus(dataDir).map(_.getPath.toString).toSeq
    if (batchDirs.isEmpty) return 0
    val present = f.listStatus(manifestDir)
      .map(_.getPath.getName).filter(_.startsWith("v")).map(_.drop(1).toLong).toSeq
    if (present.isEmpty) return 0
    val liveChunks = present.flatMap(v => chunksOf(spark, path, v)).distinct
    val liveData = splitChunks(liveChunks)._1
    val normPath = udf((s: String) => new java.net.URI(s).getPath)
    val referenced = readChunks(spark, liveData)
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
    // A crashed optimistic writer's manifest debris: a staged list that
    // never won (or never attempted) its slot publish, a claim marker
    // whose slot never materialized, or a delta chunk no present version
    // references. O(writers + commits) entries, driver-handled.
    f.listStatus(manifestDir)
      .filter { s =>
        val nm = s.getPath.getName
        s.getModificationTime < cutoff &&
          (nm.startsWith(".staged-") ||
            (nm.startsWith(".claim-") &&
              !f.exists(hpath(s"$path/manifest/${nm.stripPrefix(".claim-")}"))))
      }
      .foreach(s => f.delete(s.getPath, true))
    val live = liveChunks.map(c => hpath(c).getName).toSet
    Seq(s"$path/manifest/chunks", s"$path/manifest/deletes").map(hpath)
      .filter(f.exists).foreach { d =>
        f.listStatus(d)
          .filter(s => s.getModificationTime < cutoff && !live(s.getPath.getName))
          .foreach(s => f.delete(s.getPath, true))
      }
    n
  }

  /** Commit-order decomposition for merge-on-read reads (the cheap
    * sequence-number semantics): a delete chunk applies only to data
    * chunks listed BEFORE it, so data appended after a delete — a
    * re-insert of a deleted key — is never anti-joined against it.
    * Data chunks group into SEGMENTS by the set of deletes committed
    * after them (#outstanding-deletes + 1 segments at most, and
    * exactly one — the whole list, no anti-join — on the common
    * delete-free version). Returns (segmentDataChunks,
    * applicableDeleteChunks) pairs in commit order.
    */
  private def deleteScopedSegments(
      chunks: Seq[String]): Seq[(Seq[String], Seq[String])] = {
    val idx = chunks.zipWithIndex
    val dels = idx.filter(_._1.contains("/deletes/"))
    val datas = idx.filterNot(_._1.contains("/deletes/"))
    if (dels.isEmpty) Seq((chunks, Nil))
    else datas.groupBy { case (_, i) => dels.count(_._2 > i) }
      .toSeq.sortBy(-_._1)
      .map { case (nAfter, ds) =>
        (ds.map(_._1), dels.takeRight(nAfter).map(_._1)) }
  }

  /** Union of per-segment scans with each segment's own delete set
    * anti-joined — shared by [[readAsOf]] and [[readAsOfPruned]].
    * `scanOf` maps a segment's data chunks to its (possibly pruned)
    * scan, or None when the segment contributes no files.
    */
  private def scopedUnion(
      spark: SparkSession,
      chunks: Seq[String],
      mergeSchema: Boolean)(
      scanOf: Seq[String] => Option[DataFrame]): Option[DataFrame] = {
    val parts = deleteScopedSegments(chunks).flatMap { case (dcs, dels) =>
      if (dcs.isEmpty) None
      else scanOf(dcs).map { scan =>
        if (dels.isEmpty) scan
        else {
          val d = readChunks(spark, dels).distinct()
          scan.join(d, d.columns.toSeq, "left_anti")
        }
      }
    }
    if (parts.isEmpty) None
    else if (parts.size == 1) Some(parts.head)
    else Some(parts.reduce((a, b) =>
      a.unionByName(b, allowMissingColumns = mergeSchema)))
  }

  /** Time travel: the table exactly as of version `v` — a scan of
    * precisely the files version v's chunks list. No directory listing
    * of the data tree ever happens (at 100 TB the listing is the
    * latency), and no later commit can change what this returns. The
    * driver materializes the file paths HERE because the scan needs
    * them — never on the commit path. Outstanding merge-on-read deletes
    * apply scoped by commit order ([[deleteScopedSegments]]).
    */
  def readAsOf(
      spark: SparkSession, path: String, v: Long,
      mergeSchema: Boolean = false): DataFrame = {
    import spark.implicits._
    // mergeSchema = the SCHEMA-EVOLUTION read: commits are immutable, so
    // a column added mid-history exists only in newer files — footer
    // reconciliation surfaces it across the whole snapshot with NULLs
    // for pre-evolution rows (additive evolution, the only kind an
    // immutable-file format can express without rewriting history).
    def scanOf(dcs: Seq[String]): Option[DataFrame] = {
      val files = readChunks(spark, dcs).select("file").as[String].collect()
      if (files.isEmpty) None
      else if (mergeSchema)
        Some(spark.read.option("mergeSchema", "true").parquet(files.toIndexedSeq: _*))
      else Some(spark.read.parquet(files.toIndexedSeq: _*))
    }
    scopedUnion(spark, chunksOf(spark, path, v), mergeSchema)(scanOf)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: snapshot v$v of $path is empty or missing"))
  }

  /** Scan PLANNING against the manifest stats: the files of version `v`
    * whose `[min_col, max_col]` bounds can intersect `[lo, hi]`, plus
    * every file with unknown bounds (stats-less chunk generation or an
    * all-NULL column) — pruning must be a SUPERSET guarantee, never a
    * filter. Returns (survivors, total) so callers can assert the skip
    * actually happened. The decision runs over the manifest RELATION
    * (O(table-files) manifest rows, zero data files opened); only the
    * surviving paths reach the driver — the same seam [[readAsOf]]
    * already owns.
    */
  private[graft] def pruneFiles(
      spark: SparkSession, path: String, v: Long,
      column: String, lo: Long, hi: Long): (Seq[String], Long) =
    pruneFilesOf(spark, splitChunks(chunksOf(spark, path, v))._1, column, lo, hi)

  private def pruneFilesOf(
      spark: SparkSession, dataChunks: Seq[String],
      column: String, lo: Long, hi: Long): (Seq[String], Long) = {
    import spark.implicits._
    val ents = readChunks(spark, dataChunks)
    val total = ents.count()
    val (mn, mx) = (s"min_$column", s"max_$column")
    val survivors =
      if (!ents.columns.contains(mn) || !ents.columns.contains(mx)) ents
      else ents.filter(col(mn).isNull || col(mx).isNull ||
        (col(mx) >= lo && col(mn) <= hi))
    (survivors.select("file").as[String].collect().toSeq, total)
  }

  /** Time travel with DATA SKIPPING (Iceberg scan planning): read version
    * `v` opening ONLY the files whose manifest stats admit rows with
    * `column ∈ [lo, hi]`. File granularity means the result is a SUPERSET
    * of the matching rows — the caller still applies the row predicate,
    * which Spark then ALSO pushes into the surviving parquet footers
    * (two-tier skipping: manifest prunes whole files without opening
    * them; footers prune row groups inside survivors). On a time-ordered
    * ingest (the universal fact-table layout) a narrow time predicate
    * prunes all but the matching commits' files — the scan cost becomes
    * O(matching data), not O(table), which is the entire point of
    * keeping stats in the manifest tier.
    */
  def readAsOfPruned(
      spark: SparkSession, path: String, v: Long,
      column: String, lo: Long, hi: Long): DataFrame = {
    // A pruned scan is still a READ of version v: outstanding
    // merge-on-read deletes apply here too, scoped by commit order like
    // the full read — pruning runs per segment so attribution is free.
    def scanOf(dcs: Seq[String]): Option[DataFrame] = {
      val (files, _) = pruneFilesOf(spark, dcs, column, lo, hi)
      if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
    }
    scopedUnion(spark, chunksOf(spark, path, v), mergeSchema = false)(scanOf)
      .getOrElse(readAsOf(spark, path, v).filter(lit(false)))
  }

  /** Copy-on-write MERGE INTO the current snapshot (the Delta/Iceberg
    * MERGE semantics: source rows REPLACE matched target rows by
    * `keyCol`, unmatched source rows INSERT, and rows the source flags
    * via `deleteCol` DELETE their target key). What makes this a table-
    * format operation rather than a full rewrite:
    *
    *   - **file-level pruning**: only CANDIDATE files — those whose
    *     manifest `min_/max_<keyCol>` bounds intersect the source's key
    *     range (one probe aggregate over the source; stats-less files are
    *     conservatively candidates) — are read, anti-joined against the
    *     source keys, and rewritten. A file no source key can touch is
    *     NEVER opened and its bytes never move; on a key-clustered table
    *     a point-ish merge rewrites O(touched files), not O(table);
    *   - **chunk-level manifest rewrite** (Iceberg's per-manifest
    *     rewrite): an affected chunk is replaced by a survivor chunk
    *     listing its non-candidate entries (stats preserved, O(chunk)
    *     rows); untouched chunks are INHERITED by path. Manifest cost is
    *     O(affected-chunk entries + batch), never O(table-files), and
    *     the driver holds only chunk paths + candidate file paths;
    *   - the merged output commits as a fresh data batch + stats chunk,
    *     so the NEXT merge prunes against it too. Old versions keep
    *     their chunks — time travel across a merge is exact, and expire's
    *     file-level reference counting already handles files shared
    *     between an original chunk and its survivor rewrite.
    *
    * Single-writer commit (the [[commit]] fast path); under concurrency
    * a merge is a rewrite — route the final publish through
    * [[commitRewriteOptimistic]]'s planned-base conflict semantics.
    * Source keys must be unique (one MERGE action per key — the ambiguity
    * every MERGE implementation rejects). Returns the committed version.
    *
    * Reference behavior: the loader's idempotent re-ingest updates
    * existing entities in place and inserts the new ones
    * (mysql2neo4j.py's MERGE-per-node loads, as one batch commit).
    */
  def mergeInto(
      spark: SparkSession,
      path: String,
      source: DataFrame,
      keyCol: String,
      deleteCol: Option[String] = None,
      statsCols: Seq[String] = Nil): Long = {
    import spark.implicits._
    val v0 = currentVersion(spark, path)
    require(v0 >= 1, s"mergeInto: no committed snapshot at $path")
    require(deletesOf(spark, path, v0).isEmpty,
      "mergeInto: outstanding merge-on-read deletes — compact the table " +
        "to resolve them before a copy-on-write merge (candidate files " +
        "would be rewritten without their delete set applied)")
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)

    // Source rows that survive into the table (updates + inserts) vs ALL
    // source keys (updates, inserts AND deletes — every matched target
    // row drops; only non-deleted source rows come back).
    val outRows = deleteCol.map(dc => source.filter(!col(dc)).drop(dc)).getOrElse(source)
    val srcKeys = source.select(col(keyCol)).distinct()

    // Probe: the source's key envelope (two driver scalars, cost
    // independent of the table) drives file-level candidate selection.
    val b = source.agg(
      min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long")).head()
    require(!b.isNullAt(0), "mergeInto: empty source")
    val (lo, hi) = (b.getLong(0), b.getLong(1))

    // Candidate planning is ONE Spark job over the union of every
    // chunk's entries (chunk provenance recovered from the entry file's
    // parent directory) — never a per-chunk driver loop, so planning a
    // merge against a table with thousands of commits costs one manifest
    // scan, not thousands of tiny jobs. Stats-less generations surface
    // as NULL bounds after mergeSchema and are conservatively candidates.
    val (mn, mx) = (s"min_$keyCol", s"max_$keyCol")
    val chunkList = chunksOf(spark, path, v0)
    val allEnts = readChunks(spark, chunkList)
    val isCand: org.apache.spark.sql.Column =
      if (!(allEnts.columns.contains(mn) && allEnts.columns.contains(mx))) lit(true)
      else col(mn).isNull || col(mx).isNull || (col(mx) >= lo && col(mn) <= hi)
    val planned = allEnts
      .withColumn("chunk",
        regexp_extract(input_file_name(), "^(.*/c-[^/]+)/", 1))
      .filter(isCand)
      .select(col("chunk"), col("file"))
      .collect()
    val candFiles = planned.map(_.getString(1)).toVector
    // Chunk identity across path-rendering differences (file:/ vs
    // file:///) goes through the chunk's unique c-<uid> directory name.
    val affectedNames = planned.map(r => hpath(r.getString(0)).getName).toSet
    val (affected, untouched) =
      chunkList.partition(c => affectedNames(hpath(c).getName))
    // Affected chunks are re-listed without their candidates (Iceberg's
    // per-manifest rewrite): O(affected-chunk entries) total, survivors
    // keep their stats rows, a chunk whose files are all candidates is
    // simply superseded.
    val survivorChunks = affected.zipWithIndex.flatMap { case (c, i) =>
      val ents = spark.read.parquet(c)
      // A stats-less chunk in a mixed-generation table: every file is a
      // candidate (NULL bounds), no survivors — superseded wholesale.
      if (!(ents.columns.contains(mn) && ents.columns.contains(mx))) None
      else {
        val surv = ents.filter(!(col(mn).isNull || col(mx).isNull ||
          (col(mx) >= lo && col(mn) <= hi)))
        if (surv.head(1).isEmpty) None
        else {
          val sc = s"$path/manifest/chunks/c-$uid-s$i"
          surv.coalesce(1).write.mode("overwrite").parquet(sc)
          Some(sc)
        }
      }
    }

    // Row-level COW over ONLY the candidate files: keep their unmatched
    // rows, splice in the surviving source rows. One distributed job;
    // untouched files are never opened.
    // mergeSchema: a schema-evolved table's candidate files span
    // generations — footer reconciliation keeps the post-evolution
    // columns (NULL for old rows) instead of inheriting whichever
    // footer Spark samples first; a source missing those columns still
    // fails loudly at the unionByName below.
    val merged =
      if (candFiles.isEmpty) outRows
      else spark.read.option("mergeSchema", "true").parquet(candFiles: _*)
        .join(srcKeys, Seq(keyCol), "left_anti")
        .unionByName(outRows)
    val v = v0 + 1
    val dataDir = s"$path/data/batch-$uid"
    merged.write.mode("overwrite").parquet(dataDir)
    val newChunk =
      if (statsCols.isEmpty)
        writeChunk(spark, path, uid, spark.read.parquet(dataDir).inputFiles.toSeq)
      else writeStatsChunk(spark, path, uid, dataDir, statsCols)
    inheritProps(spark, path, v)
    writeList(spark, s"$path/manifest/v$v", untouched ++ survivorChunks :+ newChunk)
    v
  }

  /** INCREMENTAL read: exactly the rows ADDED between versions `fromV`
    * (exclusive) and `toV` (inclusive) — the CHUNK-LIST set difference,
    * so the consumer of a snapshot table never rescans history
    * (Iceberg's incremental scan / Delta's change feed for the
    * append-only case). Exact because chunks are immutable and append
    * commits only ADD a chunk: the list difference IS the delta, an
    * O(commits) driver set difference that then opens ONLY the delta
    * chunks — at 10⁶-file tables neither version's file list is ever
    * read, much less materialized. A rewrite commit (compaction) breaks
    * the append precondition by design — its list replaces the chunk
    * set — so consumers pin their cursor to pre-compaction versions or
    * resync, the same contract real table formats document.
    */
  def readBetween(spark: SparkSession, path: String, fromV: Long, toV: Long): DataFrame = {
    import spark.implicits._
    require(fromV < toV, s"fromV $fromV must precede toV $toV")
    val upto = chunksOf(spark, path, toV)
    val base = if (fromV == 0) Set.empty[String] else chunksOf(spark, path, fromV).toSet
    // Appends only: a delete chunk in the diff is a merge-on-read
    // retraction, which the append contract (like a rewrite) excludes —
    // the incremental scan streams ADDED rows, exactly Iceberg's
    // incremental append scan; consumers needing retractions read the
    // delete chunks as their own change feed.
    val freshChunks = splitChunks(upto.filterNot(base))._1
    val fresh: IndexedSeq[String] =
      if (freshChunks.isEmpty) IndexedSeq.empty
      else readChunks(spark, freshChunks).select("file").as[String].collect().toIndexedSeq
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
        f.delete(hpath(base), true)
      }
      val ev = Tables(spark, dir).events
        .select(col("event_id"), col("event_type"),
          expr("ts DIV 86400000000000").cast("long").as("day"))
      val days = ev.agg(min("day"), max("day")).head()
      val (lo, hi) = (days.getLong(0), days.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * (hi - lo) / 3
      // Day-cut ingest batches carry day AND key stats in their chunks:
      // the time-ordered layout every fact table has, which is exactly
      // what makes h12's manifest pruning and h13's merge candidate
      // selection representative.
      val stats = Seq("day", "event_id")
      commit(spark, base, ev.filter(col("day") <= cut1), stats)
      commit(spark, base, ev.filter(col("day") > cut1 && col("day") <= cut2), stats)
      commit(spark, base, ev.filter(col("day") > cut2), stats)
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    base
  }

  /** The staged table's day cuts, re-derived the way [[staged]] derived
    * them (one probe aggregate over the raw table — the oracle recomputes
    * the identical integer arithmetic).
    */
  private def dayCuts(spark: SparkSession, dir: String): (Long, Long, Long, Long) = {
    val ev = Tables(spark, dir).events
      .select(expr("ts DIV 86400000000000").cast("long").as("day"))
    val days = ev.agg(min("day"), max("day")).head()
    val (lo, hi) = (days.getLong(0), days.getLong(1))
    (lo, hi, lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
  }

  /** h12: DATA SKIPPING on the correctness gate — the last ingest
    * window's aggregate answered through [[readAsOfPruned]], which plans
    * the scan off the manifest's per-file day bounds (here: batches 1-2's
    * files pruned without being opened — at a million-file table this is
    * the difference between a planned scan and reading everything). The
    * row predicate is still applied (pruning is file-granular, a superset
    * guarantee); the oracle re-derives the same day window from raw rows,
    * so a prune that drops a byte too much hash-mismatches, and the
    * FormatsSpec pins that files were actually skipped.
    */
  def h12StatsPrune(spark: SparkSession, dir: String): DataFrame = {
    val base = staged(spark, dir)
    val (_, hi, _, cut2) = dayCuts(spark, dir)
    readAsOfPruned(spark, base, 3L, "day", cut2 + 1, hi)
      .filter(col("day") > cut2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
  }

  /** h13: MERGE INTO on the correctness gate — one batch carrying all
    * three MERGE actions against the staged snapshot table (updates:
    * every event_id ≡ 0 mod 97 re-typed 'merged'; inserts: 500 fresh ids
    * past the max; deletes: event_id ≡ 0 mod 89 and not already an
    * update), committed copy-on-write, then the FINAL table state
    * aggregated per type with a sum-of-ids checksum. The oracle rebuilds
    * the expected final state from the raw table with set algebra, so a
    * merge that loses a kept row, resurrects a deleted key, double-
    * applies an update, or drops an untouched file's rows fails the
    * hash. Re-running the merge commits a new version but the final
    * state is IDEMPOTENT (same source ⇒ same table), which is what lets
    * the gate and the bench share one staged table.
    */
  /** h14: SCHEMA EVOLUTION through the snapshot format — the additive
    * column-add every long-lived table eventually needs, without
    * rewriting a byte of history: batch 1 commits the old shape, batch 2
    * commits with a new `value_milli` column (e1's exact milli-unit
    * discipline — a double sum would flap the hash), and the
    * mergeSchema read reconciles the generations with NULLs for
    * pre-evolution rows. The aggregate sums the new column with
    * coalesce-to-zero, so the gate fails if evolution drops the column,
    * backfills the wrong rows, or loses a row across the schema
    * boundary; the oracle recomputes from raw rows with the same
    * even/odd split. Its own staging dir (the h10 table's day-cut
    * contract stays untouched).
    */
  def h14SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val base = f"/tmp/graft_snapshots/${spark.sparkContext.applicationId}/" +
      f"${dir.hashCode}%08x_${new java.io.File(dir).getName}/events_evolved"
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000).cast("long").as("value_milli"))
    if (currentVersion(spark, base) != 2) {
      // A partial staging (interrupted between the two commits) would
      // double-commit batch 1 on resume — restage from scratch instead.
      if (currentVersion(spark, base) > 0) fs(spark).delete(hpath(base), true)
      commit(spark, base, ev.filter(col("event_id") % 2 === 0).drop("value_milli"),
        statsCols = Seq("event_id"))
      commit(spark, base, ev.filter(col("event_id") % 2 =!= 0),
        statsCols = Seq("event_id"))
    }
    readAsOf(spark, base, 2L, mergeSchema = true)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(col("value_milli"), lit(0L))).as("sum_value_milli"))
  }

  /** h15: MERGE-ON-READ deletes on the correctness gate — one data
    * commit, then two accumulated delete commits (event_id ≡ 0 mod 37,
    * then mod 41) that move ZERO data bytes, read back through the
    * anti-join path. The oracle recomputes the surviving rows from the
    * raw table, so a delete that leaks a row, over-deletes, or is lost
    * by the read path hash-mismatches; the sum-of-ids checksum makes
    * the gate membership-exact. Own staging dir; restaged from scratch
    * if a previous run left a partial history.
    */
  def h15MorDelete(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = f"/tmp/graft_snapshots/${spark.sparkContext.applicationId}/" +
      f"${dir.hashCode}%08x_${new java.io.File(dir).getName}/events_mor"
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"),
        expr("ts DIV 86400000000000").cast("long").as("day"))
    if (currentVersion(spark, base) != 3) {
      if (currentVersion(spark, base) > 0) fs(spark).delete(hpath(base), true)
      commit(spark, base, ev, statsCols = Seq("event_id", "day"))
      deleteByKey(spark, base,
        ev.filter(col("event_id") % 37 === 0).select("event_id"), "event_id")
      deleteByKey(spark, base,
        ev.filter(col("event_id") % 41 === 0).select("event_id"), "event_id")
    }
    readAsOf(spark, base, 3L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        sum(col("event_id")).as("sum_ids"))
  }

  def h13MergeInto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = staged(spark, dir)
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("event_type"),
        expr("ts DIV 86400000000000").cast("long").as("day"))
    val b = ev.agg(max("event_id"), min("day")).head()
    val (maxId, loDay) = (b.getLong(0), b.getLong(1))
    val updates = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id"), lit("merged").as("event_type"), col("day"),
        lit(false).as("_deleted"))
    val inserts = spark.range(1, 501)
      .select((lit(maxId) + col("id")).as("event_id"),
        lit("inserted").as("event_type"), lit(loDay).as("day"),
        lit(false).as("_deleted"))
    val deletes = ev.filter(col("event_id") % 89 === 0 && col("event_id") % 97 =!= 0)
      .select(col("event_id"), col("event_type"), col("day"),
        lit(true).as("_deleted"))
    val source = updates.unionByName(inserts).unionByName(deletes)
    val v = mergeInto(spark, base, source, "event_id",
      deleteCol = Some("_deleted"), statsCols = Seq("day", "event_id"))
    readAsOf(spark, base, v)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"),
        sum(col("event_id")).as("sum_ids"))
  }

  /** h11: the INCREMENTAL-consumption contract on the correctness gate —
    * the delta between snapshots v1 and v3 of the staged table (i.e.
    * batches 2 and 3, never batch 1, never a rescan of v1's files)
    * aggregated per event type. The oracle re-derives "everything after
    * the first day cut" from the raw table, so the gate fails if the
    * chunk-list set difference reads a byte too much or too little.
    */
  def h11IncrementalRead(spark: SparkSession, dir: String): DataFrame = {
    val base = staged(spark, dir)
    readBetween(spark, base, 1L, 3L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), min(col("day")).as("first_day"))
      .orderBy("event_type")
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
