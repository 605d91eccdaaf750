package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

/** Interchange-format specs: schema-first text ingest round-trips, and
  * partitioned parquet prunes at planning time.
  */
class FormatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private val tmp = java.nio.file.Files.createTempDirectory("graft-formats").toString

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-formats-test", master = "local[4]")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("jsonl round-trips the documents table under an explicit schema") {
    val docs = Tables(spark, dir).documents
    Formats.writeJsonl(docs, s"$tmp/docs_jsonl")
    val back = Formats.readJsonl(spark, s"$tmp/docs_jsonl", docs.schema)
    assert(back.schema === docs.schema)
    assert(back.count() === docs.count())
    val origSum = docs.agg(sum(length(col("text")))).head.getLong(0)
    assert(back.agg(sum(length(col("text")))).head.getLong(0) === origSum)
  }

  test("csv round-trips the nation table under an explicit schema") {
    val nation = Tables(spark, dir).nation
    Formats.writeCsv(nation, s"$tmp/nation_csv")
    val back = Formats.readCsv(spark, s"$tmp/nation_csv", nation.schema)
    assert(back.schema === nation.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ===
      nation.collect().map(_.toString).sorted.toSeq)
  }

  test("xml round-trips the nation table under an explicit schema") {
    val nation = Tables(spark, dir).nation
    Formats.writeXml(nation, s"$tmp/nation_xml", rowTag = "nation")
    val back = Formats.readXml(spark, s"$tmp/nation_xml", rowTag = "nation",
      schema = nation.schema)
    assert(back.schema === nation.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ===
      nation.collect().map(_.toString).sorted.toSeq)
  }

  test("compaction collapses a small-files dataset without changing its content") {
    val docs = Tables(spark, dir).documents
    docs.repartition(32).write.mode("overwrite").parquet(s"$tmp/docs_shattered")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/docs_shattered") === 32)
    Formats.compactParquet(spark, s"$tmp/docs_shattered", s"$tmp/docs_compacted")
    assert(parquetFiles(s"$tmp/docs_compacted") === 1) // well under one target block
    val before = docs.collect().map(_.toString).sorted.toSeq
    val after = spark.read.parquet(s"$tmp/docs_compacted").collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }

  test("orc round-trips with pushdown and pruning at the scan") {
    val docs = Tables(spark, dir).documents
    Formats.writeOrc(docs, s"$tmp/docs_orc")
    val back = Formats.readOrc(spark, s"$tmp/docs_orc")
      .filter(col("n_chars") >= 1000)
      .select("doc_id", "n_chars")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      s"expected the filter pushed to the ORC scan:\n$plan")
    assert(!plan.contains("text:string"), s"text should be pruned from the scan:\n$plan")
    assert(back.count() === docs.filter(col("n_chars") >= 1000).count())
  }

  test("avro round-trips values exactly and keeps the boundary-format posture") {
    val docs = Tables(spark, dir).documents
    Formats.writeAvro(docs, s"$tmp/docs_avro")
    val back = Formats.readAvro(spark, s"$tmp/docs_avro")
    // Self-describing: the reader recovers the schema (names + types)
    // from the container header, no inference pass.
    assert(back.schema.fieldNames.toSet === docs.schema.fieldNames.toSet)
    val before = docs.collect().map(_.toString).sorted.toSeq
    val after = back.collect().map(_.toString).sorted.toSeq
    assert(after === before)
    // Row-oriented: filters still evaluate correctly (post-read), and a
    // projection narrows the decoded schema even though bytes are row-major.
    val filtered = back.filter(col("n_chars") >= 1000).select("doc_id", "n_chars")
    assert(filtered.count() === docs.filter(col("n_chars") >= 1000).count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("text:string"),
      s"projection should narrow the avro read schema:\n$plan")
  }

  test("dynamic partition pruning fires when the partition filter only exists at runtime") {
    // The filter lives on the DIM side, so planning-time pruning can't
    // see it — the scan must carry a dynamicpruning subquery that prunes
    // partitions from the broadcast join's runtime keys. This is the
    // mechanism that keeps partitioned-fact ⋈ filtered-dim joins from
    // scanning the whole fact at 100 TB.
    val ss = spark
    import ss.implicits._
    val docs = Tables(spark, dir).documents
    Formats.writePartitioned(docs, s"$tmp/docs_by_lang_dpp", "lang")
    // The dim must be a real source (not a literal Seq, which the
    // optimizer folds into a filterless LocalRelation) so the selective
    // predicate survives to the pruning rule.
    Seq(("en", 1), ("de", 0), ("es", 0), ("fr", 0), ("zh", 0))
      .toDF("lang", "wanted")
      .write.mode("overwrite").parquet(s"$tmp/lang_dim_dpp")
    val dim = spark.read.parquet(s"$tmp/lang_dim_dpp")
    val joined = Formats.readPartitioned(spark, s"$tmp/docs_by_lang_dpp")
      .join(dim.filter(col("wanted") === 1), Seq("lang"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in:\n$plan")
    assert(joined.count() === docs.filter(col("lang") === "en").count())
  }

  test("partitioned parquet prunes non-matching partitions at planning time") {
    val docs = Tables(spark, dir).documents
    Formats.writePartitioned(docs, s"$tmp/docs_by_lang", "lang")
    val filtered = Formats.readPartitioned(spark, s"$tmp/docs_by_lang")
      .filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected a partition filter in:\n$plan")
    // planning-time pruning: only the en directory's files are scanned
    val scanned = filtered.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scanned.nonEmpty)
    scanned.foreach { f =>
      assert(f.inputRDDs().head.partitions.nonEmpty)
      assert(f.metadata.get("PartitionFilters").exists(_.contains("lang")))
    }
    assert(filtered.count() === docs.filter(col("lang") === "en").count())
  }

  test("snapshots: commits share files, history stays readable, commit is O(batch)") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_table"
    val b1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val b2 = Seq((4L, "d"), (5L, "e")).toDF("id", "v")
    val v1 = sources.Snapshots.commit(spark, p, b1)
    val files1 = sources.Snapshots.readAsOf(spark, p, v1).inputFiles.toSet
    val mt1 = files1.map { f =>
      f -> new java.io.File(new java.net.URI(f)).lastModified()
    }.toMap
    val v2 = sources.Snapshots.commit(spark, p, b2)
    val files2 = sources.Snapshots.readAsOf(spark, p, v2).inputFiles.toSet
    // The new snapshot LISTS v1's files rather than rewriting them: strict
    // superset, and every inherited file is byte-untouched on disk.
    assert(files1.subsetOf(files2) && files2.size > files1.size)
    mt1.foreach { case (f, t) =>
      assert(new java.io.File(new java.net.URI(f)).lastModified() === t,
        s"inherited file rewritten by commit $v2: $f")
    }
    // Time travel: v1 still answers exactly its own content after v2.
    assert(sources.Snapshots.readAsOf(spark, p, v1).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    assert(sources.Snapshots.readAsOf(spark, p, v2).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("snapshots: a compaction commit changes files, not content, and not history") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_compact"
    val v1 = sources.Snapshots.commit(spark, p,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(4))
    val v2 = sources.Snapshots.commit(spark, p,
      Seq((3L, "c")).toDF("id", "v").repartition(4))
    val before = sources.Snapshots.readAsOf(spark, p, v2)
    val v3 = sources.Snapshots.commitRewrite(spark, p, before.coalesce(1))
    val after = sources.Snapshots.readAsOf(spark, p, v3)
    // Content multiset identical, file count collapsed, file sets disjoint
    // (the rewrite is a NEW version's files — old snapshots keep theirs).
    assert(after.as[(Long, String)].collect().sorted
      === before.as[(Long, String)].collect().sorted)
    assert(after.inputFiles.length < before.inputFiles.length)
    assert(after.inputFiles.toSet.intersect(before.inputFiles.toSet).isEmpty)
    assert(sources.Snapshots.readAsOf(spark, p, v1).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b")))
  }

  test("snapshots: incremental read is exactly the manifest set difference") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_incr"
    val v1 = sources.Snapshots.commit(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = sources.Snapshots.commit(spark, p, Seq((3L, "c")).toDF("id", "v"))
    val v3 = sources.Snapshots.commit(spark, p, Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
    assert(sources.Snapshots.readBetween(spark, p, v1, v3).as[(Long, String)].collect().sorted
      === Array((3L, "c"), (4L, "d"), (5L, "e")))
    assert(sources.Snapshots.readBetween(spark, p, v2, v3).as[(Long, String)].collect().sorted
      === Array((4L, "d"), (5L, "e")))
    // The delta never re-reads base files.
    val baseFiles = sources.Snapshots.readAsOf(spark, p, v1).inputFiles.toSet
    val deltaFiles = sources.Snapshots.readBetween(spark, p, v1, v3).inputFiles.toSet
    assert(baseFiles.intersect(deltaFiles).isEmpty)
    // fromV = 0 is a full read; identical-version diff is empty but
    // schema-correct.
    assert(sources.Snapshots.readBetween(spark, p, 0L, v2).count() === 3)
    val empty = sources.Snapshots.readBetween(spark, p, v3 - 1, v3)
      .filter(lit(false)) // exercise a transform over the schema
    assert(empty.columns.toSeq === Seq("id", "v"))
  }

  test("snapshots: expiry is reference-counted — forward-shared files survive, orphans go") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_expire"
    val v1 = sources.Snapshots.commit(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = sources.Snapshots.commit(spark, p, Seq((3L, "c")).toDF("id", "v"))
    val v1files = sources.Snapshots.readAsOf(spark, p, v1).inputFiles.toSet
    // Expiring v1 while v2 still LISTS v1's files must delete nothing:
    // the files are shared forward, only the v1 manifest goes.
    assert(sources.Snapshots.expire(spark, p, keepFrom = v2) === 0)
    assert(sources.Snapshots.readAsOf(spark, p, v2).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    intercept[Exception] { sources.Snapshots.readAsOf(spark, p, v1) }
    // A compaction rewrite makes v1/v2's data files unreferenced; expiring
    // to the rewrite reclaims them all and the live table is untouched.
    val v3 = sources.Snapshots.commitRewrite(
      spark, p, sources.Snapshots.readAsOf(spark, p, v2).coalesce(1))
    val deleted = sources.Snapshots.expire(spark, p, keepFrom = v3)
    assert(deleted >= v1files.size, s"rewrite-orphaned files must be reclaimed: $deleted")
    assert(sources.Snapshots.readAsOf(spark, p, v3).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    v1files.foreach { f =>
      assert(!new java.io.File(new java.net.URI(f)).exists(), s"orphan survived expiry: $f")
    }
  }

  test("snapshots: orphan sweep reclaims only unreferenced files, respects the grace window") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_orphans"
    val v1 = sources.Snapshots.commit(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = sources.Snapshots.commit(spark, p, Seq((3L, "c")).toDF("id", "v"))
    // A crashed write's leftovers: a stray parquet inside a batch dir and
    // one in its own abandoned dir — no manifest has ever listed them.
    Seq((99L, "stray")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$p/data/batch-99-aborted")
    val strayFiles = spark.read.parquet(s"$p/data/batch-99-aborted").inputFiles.toSet
    assert(strayFiles.nonEmpty)
    // Grace window: files younger than graceMs are an in-flight commit's
    // — a sweep with a 1h grace must spare everything just written.
    assert(sources.Snapshots.removeOrphans(spark, p) === 0)
    // Grace 0: exactly the strays go; every referenced file survives and
    // both snapshots read back intact.
    val deleted = sources.Snapshots.removeOrphans(spark, p, graceMs = 0L)
    assert(deleted === strayFiles.size, s"expected ${strayFiles.size} orphans reclaimed, got $deleted")
    strayFiles.foreach { f =>
      assert(!new java.io.File(new java.net.URI(f)).exists(), s"stray survived the sweep: $f")
    }
    assert(sources.Snapshots.readAsOf(spark, p, v1).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b")))
    assert(sources.Snapshots.readAsOf(spark, p, v2).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    // Idempotent: a second sweep finds nothing.
    assert(sources.Snapshots.removeOrphans(spark, p, graceMs = 0L) === 0)
  }

  test("snapshots: two-tier manifests — commit writes O(batch) entries, chunks are shared") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_tier"
    (1 to 4).foreach { i =>
      sources.Snapshots.commit(spark, p,
        Seq((i.toLong, "x"), (i + 10L, "y")).toDF("id", "v").repartition(2))
    }
    def list(v: Int): Seq[String] =
      spark.read.parquet(s"$p/manifest/v$v").select("chunk").as[String].collect().toSeq
    // The version manifest is a LIST OF CHUNKS — one row per commit, not
    // one per file: the commit path never rewrites the table's file list.
    assert(list(4).length === 4 && list(1).length === 1)
    // Inherited history is REFERENCED, byte-shared: v4's list carries v1's
    // chunk verbatim (no relisting of v1's entries anywhere in commit 4).
    assert(list(4).contains(list(1).head))
    // The newest chunk holds exactly the newest batch's files — the
    // O(batch) guarantee at the entry tier.
    val newChunk = (list(4).toSet -- list(3).toSet).head
    val entries = spark.read.parquet(newChunk).as[String].collect()
    assert(entries.length === spark.read.parquet(s"$p/data/batch-4").inputFiles.length)
    assert(entries.forall(_.contains("batch-4")))
    // The union of chunks still reads the whole table.
    assert(sources.Snapshots.readAsOf(spark, p, 4L).count() === 8L)
    // A rewrite's list is a single fresh chunk, and expiring history to it
    // reclaims the de-listed chunks along with their files.
    val v5 = sources.Snapshots.commitRewrite(
      spark, p, sources.Snapshots.readAsOf(spark, p, 4L).coalesce(1))
    assert(list(5).length === 1)
    sources.Snapshots.expire(spark, p, keepFrom = v5)
    val chunksLeft = new java.io.File(s"$p/manifest/chunks").listFiles().map(_.getName).toSet
    assert(chunksLeft === list(5).map(c => new java.io.File(c).getName).toSet,
      s"de-listed chunks must be reclaimed by expiry, got $chunksLeft")
    assert(sources.Snapshots.readAsOf(spark, p, 5L).count() === 8L)
  }

  test("snapshots: slot publish is verified — a nested rename never reports committed") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_publish"
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    sources.Snapshots.commit(spark, p, Seq((1L, "a")).toDF("id", "v"))
    sources.Snapshots.commit(spark, p, Seq((2L, "b")).toDF("id", "v"))
    // The ADVICE hazard: a paused writer whose stale claim was broken
    // wakes and renames its staged list into slot v2 — which a new winner
    // already filled. On the local FS that rename "succeeds" by NESTING
    // the source inside the destination; publish must detect it via the
    // owner marker, report failure, and leave the slot byte-exact.
    val staged = s"$p/manifest/.staged-deadbeef-2"
    Seq("bogus-chunk").toDF("chunk").coalesce(1).write.parquet(staged)
    assert(!sources.Snapshots.publishStaged(f, staged, s"$p/manifest/v2", "deadbeef"))
    // No pollution: the nested debris is gone and the slot still answers
    // exactly the real winner's manifest (one chunk per commit, 2 rows).
    assert(!new java.io.File(s"$p/manifest/v2/.staged-deadbeef-2").exists())
    assert(spark.read.parquet(s"$p/manifest/v2").count() === 2L)
    assert(sources.Snapshots.readAsOf(spark, p, 2L).count() === 2L)
    // And a publish into a FREE slot lands with the marker at top level —
    // the positive half of the verification.
    val chunks2 = spark.read.parquet(s"$p/manifest/v2").select("chunk").as[String].collect().toSeq
    val staged3 = s"$p/manifest/.staged-cafe-3"
    chunks2.toDF("chunk").coalesce(1).write.parquet(staged3)
    assert(sources.Snapshots.publishStaged(f, staged3, s"$p/manifest/v3", "cafe"))
    assert(new java.io.File(s"$p/manifest/v3/_owner-cafe").exists())
    assert(sources.Snapshots.readAsOf(spark, p, 3L).count() === 2L)
  }

  test("snapshots: optimistic multi-writer commits — every racer lands, stale rewrite aborts") {
    val ss = spark
    import ss.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val p = s"$tmp/snap_optimistic"
    // 8 genuinely concurrent appenders racing for version slots: every
    // one must land exactly once (versions 1..8, no slot skipped), and
    // every batch must survive — a lost race REBASES, never drops.
    val n = 8
    val racers = (1 to n).map { i =>
      Future(sources.Snapshots.commitOptimistic(
        spark, p, Seq((i.toLong, s"w$i")).toDF("id", "v"), maxAttempts = 32))
    }
    val versions = racers.map(Await.result(_, 5.minutes)).sorted
    assert(versions === (1L to n.toLong))
    assert(sources.Snapshots.readAsOf(spark, p, n.toLong)
      .as[(Long, String)].collect().sorted === (1 to n).map(i => (i.toLong, s"w$i")))
    // Snapshot isolation held through the races: version k reads exactly
    // k single-row batches.
    (1 to n).foreach { k =>
      assert(sources.Snapshots.readAsOf(spark, p, k.toLong).count() === k.toLong)
    }
    // A rewrite planned against a stale base must ABORT (committing it
    // would silently drop the concurrent append), not retry.
    val stale = sources.Snapshots.currentVersion(spark, p)
    val planned = sources.Snapshots.readAsOf(spark, p, stale)
      .filter(col("id") =!= 3L) // "compaction" that drops one row
    sources.Snapshots.commitOptimistic(spark, p, Seq((99L, "concurrent")).toDF("id", "v"))
    intercept[java.util.ConcurrentModificationException] {
      sources.Snapshots.commitRewriteOptimistic(spark, p, planned, plannedBase = stale)
    }
    // The concurrent append survived the aborted rewrite; a re-planned
    // rewrite against the CURRENT version commits.
    val cur = sources.Snapshots.currentVersion(spark, p)
    assert(sources.Snapshots.readAsOf(spark, p, cur)
      .filter(col("v") === "concurrent").count() === 1L)
    val replanned = sources.Snapshots.readAsOf(spark, p, cur).filter(col("id") =!= 3L)
    val vNew = sources.Snapshots.commitRewriteOptimistic(spark, p, replanned, plannedBase = cur)
    assert(vNew === cur + 1)
    val after = sources.Snapshots.readAsOf(spark, p, vNew).as[(Long, String)].collect().sorted
    assert(!after.exists(_._1 == 3L) && after.exists(_._2 == "concurrent"))
    // Time travel across the whole contended history is intact.
    assert(sources.Snapshots.readAsOf(spark, p, n.toLong).count() === n.toLong)
  }

  test("upsert-by-key: MERGE semantics — keep-newest, auto-create, idempotent replay") {
    val ss = spark
    import ss.implicits._
    val path = s"$tmp/dim_person"
    def snapshot(): Seq[(Long, String, Long)] =
      spark.read.parquet(path).as[(Long, String, Long)].collect().sortBy(_._1).toSeq

    // Batch 1 auto-creates the table (MERGE-on-first-sight) and resolves
    // an in-batch duplicate key to its newest version.
    val b1 = Seq((1L, "alice-v1", 10L), (2L, "bob-v1", 10L), (2L, "bob-v2", 11L))
      .toDF("id", "name", "version")
    sources.Upsert.applyBatch(spark, path, b1, Seq("id"), "version")
    assert(snapshot() === Seq((1L, "alice-v1", 10L), (2L, "bob-v2", 11L)))

    // Batch 2: newer version wins, stale version loses, new key inserts.
    val b2 = Seq((1L, "alice-v2", 20L), (2L, "bob-stale", 5L), (3L, "carol-v1", 20L))
      .toDF("id", "name", "version")
    sources.Upsert.applyBatch(spark, path, b2, Seq("id"), "version")
    val after = Seq((1L, "alice-v2", 20L), (2L, "bob-v2", 11L), (3L, "carol-v1", 20L))
    assert(snapshot() === after)

    // Replay the same batch: bit-identical table (the MERGE idempotence
    // the reference's loader relies on; equal-version ties go to incoming,
    // which carries the same values).
    sources.Upsert.applyBatch(spark, path, b2, Seq("id"), "version")
    assert(snapshot() === after)

    // The keep-one window must plan as a per-task top-1, not a full
    // per-key sort materialization.
    val merged = sources.Upsert.upsertByKey(
      spark.read.parquet(path), b2, Seq("id"), "version")
    val plan = merged.queryExecution.executedPlan
    assert(plan.toString.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("schema evolution: appended files with a new column merge; old rows read null") {
    val ss = spark
    import ss.implicits._
    val path = s"$tmp/evolving"
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(path)
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(path)
    val merged = Formats.readEvolved(spark, path)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "lang", "text"))
    val byId = merged.collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("lang"))).toMap
    assert(byId === Map(1L -> None, 2L -> None, 3L -> Some("en")))
  }

  test("scd2 history view: intervals chain, exactly one open row per key") {
    val ss = spark
    import ss.implicits._
    val hist = Seq(
      (1L, "alice-v0", 0L), (1L, "alice-v2", 2L), (1L, "alice-v5", 5L),
      (2L, "bob-v1", 1L)).toDF("id", "name", "version")
    val rows = sources.Upsert.scd2(hist, Seq("id"), "version")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("version")) ->
        (Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
          r.getAs[Int]("is_current")))
      .toMap
    assert(rows === Map(
      (1L, 0L) -> (Some(2L), 0), (1L, 2L) -> (Some(5L), 0),
      (1L, 5L) -> (None, 1), (2L, 1L) -> (None, 1)))
  }

  test("upsert-by-key: randomized batch replay matches a sequential MERGE fold") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(42)
    val path = s"$tmp/dim_rand"
    // Reference MERGE: id -> (version, name); newest version wins, the
    // incoming batch wins at equal version — folded batch by batch.
    var ref = Map.empty[Long, (Long, String)]
    (1 to 5).foreach { b =>
      // Distinct (id, version) per batch so the fold is well-defined
      // (conflicting same-key-same-version writes are only
      // hash-deterministic, not model-predictable).
      val gen = scala.collection.mutable.Map.empty[(Long, Long), String]
      (1 to 30).foreach { i =>
        val id = rng.nextInt(10).toLong
        val v = rng.nextInt(20).toLong
        gen((id, v)) = s"b$b-$id-$v-$i"
      }
      val batch = gen.toSeq.map { case ((id, v), n) => (id, n, v) }
      sources.Upsert.applyBatch(spark, path, batch.toDF("id", "name", "version"),
        Seq("id"), "version")
      batch.groupBy(_._1).foreach { case (id, rows) =>
        val (bid, bname, bv) = rows.maxBy(r => r._3)
        ref.get(id) match {
          case Some((rv, _)) if rv > bv => // stored row is strictly newer
          case _ => ref += id -> ((bv, bname))
        }
      }
      val got = spark.read.parquet(path).as[(Long, String, Long)].collect()
        .map { case (id, n, v) => id -> ((v, n)) }.toMap
      assert(got === ref, s"divergence after batch $b")
    }
  }

  test("binaryFile ingest: crawl files == blob column, glob + length pushed to listing") {
    import graft.multimodal.Media
    // Materialize 40 media payloads as FILES (the crawl-on-disk form)...
    val blobs = Tables(spark, dir).documents
      .limit(40)
      .select(col("doc_id"), Media.payload(col("doc_id"), col("text")).as("payload"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val crawl = java.nio.file.Paths.get(tmp, "crawl")
    java.nio.file.Files.createDirectories(crawl.resolve("sub"))
    blobs.foreach { case (id, bytes) =>
      val at = if (id % 2 == 0) crawl else crawl.resolve("sub") // exercise recursion
      java.nio.file.Files.write(at.resolve(s"doc_$id.bin"), bytes)
    }
    java.nio.file.Files.write(crawl.resolve("MANIFEST.txt"),
      "not media".getBytes("UTF-8")) // must be excluded by the glob, never opened
    // ...read them back through the binaryFile source.
    val files = Formats.readBinaryFiles(spark, crawl.toString, glob = "*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content"))
    // The metadata predicates reach the file index: both the glob and the
    // length guard are listing-time, so excluded files are never read.
    val scan = files.queryExecution.executedPlan.toString
    assert(scan.contains("LessThanOrEqual(length"),
      s"length guard should push to the binaryFile index:\n$scan")
    // Same bytes whether the payload arrives as a file or a blob column:
    // the media operators are source-agnostic downstream of this row.
    val viaFiles = files.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(viaFiles.keySet === blobs.map(_._1).toSet)
    blobs.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(viaFiles(id), bytes), s"doc $id bytes differ")
    }
    // And the oversized-exclusion guard actually excludes.
    val none = Formats.readBinaryFiles(spark, crawl.toString, glob = "*.bin", maxLength = 1L)
    assert(none.count() === 0L)
  }

  test("dynamic partition overwrite replaces only the republished partition") {
    val ss = spark
    import ss.implicits._
    val out = s"$tmp/dynover"
    Seq((1L, "a", 10L), (2L, "a", 11L), (3L, "b", 12L), (4L, "c", 13L))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(out)
    def files(p: String): Set[(String, Long)] =
      new java.io.File(s"$out/part=$p").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length)).toSet
    val aBefore = files("a")
    val bBefore = files("b")
    // Republish ONLY partition c (a retraction batch): dynamic mode must
    // leave a and b byte-untouched and fully replace c (no doubled rows).
    Formats.overwritePartitions(
      Seq((9L, "c", 99L)).toDF("id", "part", "v"), out, "part")
    assert(files("a") === aBefore && files("b") === bBefore,
      "sibling partitions must not churn under a dynamic overwrite")
    val got = Formats.readPartitioned(spark, out)
      .select(col("id"), col("part"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "a", 10L), (2L, "a", 11L), (3L, "b", 12L), (9L, "c", 99L)))
  }

  test("snapshots: manifest stats prune files at plan time; unknown bounds are superset-safe") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_prune"
    def batch(lo: Long, hi: Long): org.apache.spark.sql.DataFrame =
      ss.range(lo, hi + 1).select(col("id"), (col("id") * 2).as("v"))
    sources.Snapshots.commit(spark, p, batch(1, 10), Seq("id"))
    sources.Snapshots.commit(spark, p, batch(100, 110), Seq("id"))
    val v3 = sources.Snapshots.commit(spark, p, batch(200, 210), Seq("id"))
    // Planning off the manifest bounds keeps only the middle commit's
    // files — whole files skipped without being opened.
    val (surv, total) = sources.Snapshots.pruneFiles(spark, p, v3, "id", 100L, 110L)
    assert(surv.nonEmpty && surv.size < total,
      s"expected a real skip, got ${surv.size}/$total files")
    // Pruned read + the row predicate == unpruned read + the predicate.
    val pruned = sources.Snapshots.readAsOfPruned(spark, p, v3, "id", 100L, 110L)
      .filter(col("id").between(100L, 110L))
    val full = sources.Snapshots.readAsOf(spark, p, v3)
      .filter(col("id").between(100L, 110L))
    assert(pruned.as[(Long, Long)].collect().sorted === full.as[(Long, Long)].collect().sorted)
    // A stats-less (legacy) chunk's files have UNKNOWN bounds: they must
    // always survive pruning — file skipping is a superset guarantee.
    val v4 = sources.Snapshots.commit(spark, p, batch(300, 310))
    val legacyFiles = sources.Snapshots.readBetween(spark, p, v3, v4).inputFiles.toSet
    val (surv2, _) = sources.Snapshots.pruneFiles(spark, p, v4, "id", 100L, 110L)
    assert(legacyFiles.subsetOf(surv2.toSet),
      "stats-less files must be conservatively kept by the pruner")
    // And a pruning column no chunk carries stats for disables skipping
    // entirely rather than guessing.
    val (surv3, total3) = sources.Snapshots.pruneFiles(spark, p, v4, "v", 0L, 1L)
    assert(surv3.size.toLong === total3)
  }

  test("snapshots: merge rewrites only key-intersecting files; untouched bytes never move") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_merge"
    val v1 = sources.Snapshots.commit(spark, p,
      ss.range(1, 7).select(col("id"), lit("old").as("v")), Seq("id"))
    val v2 = sources.Snapshots.commit(spark, p,
      ss.range(100, 106).select(col("id"), lit("old").as("v")), Seq("id"))
    val lowFiles = sources.Snapshots.readBetween(spark, p, 0L, v1).inputFiles.toSet
    val highFiles = sources.Snapshots.readBetween(spark, p, v1, v2).inputFiles.toSet
    val lowMtimes = lowFiles.map { f =>
      f -> new java.io.File(new java.net.URI(f)).lastModified()
    }.toMap
    // One batch, all three MERGE actions, keys confined to the high range.
    val source = Seq(
      (101L, "upd", false), (108L, "ins", false), (100L, "old", true)
    ).toDF("id", "v", "_del")
    val v3 = sources.Snapshots.mergeInto(spark, p, source, "id",
      deleteCol = Some("_del"), statsCols = Seq("id"))
    val after = sources.Snapshots.readAsOf(spark, p, v3)
    val got = after.as[(Long, String)].collect().toSet
    val expected = (1L to 6L).map(i => (i, "old")).toSet ++
      Set((101L, "upd"), (108L, "ins")) ++
      Seq(102L, 103L, 104L, 105L).map(i => (i, "old"))
    assert(got === expected)
    // The low-range files were inherited by path and never rewritten;
    // every high-range (candidate) file is gone from the new version.
    val files3 = after.inputFiles.toSet
    assert(lowFiles.subsetOf(files3), "untouched files must be inherited, not rewritten")
    assert(files3.intersect(highFiles).isEmpty, "candidate files must be superseded")
    lowMtimes.foreach { case (f, t) =>
      assert(new java.io.File(new java.net.URI(f)).lastModified() === t,
        s"untouched file rewritten by merge: $f")
    }
    // Time travel across the merge is exact.
    assert(sources.Snapshots.readAsOf(spark, p, v2).as[(Long, String)].collect().toSet
      === ((1L to 6L) ++ (100L to 105L)).map(i => (i, "old")).toSet)
    // The merge is idempotent: the same source applied again commits a
    // new version with the identical final state.
    val v4 = sources.Snapshots.mergeInto(spark, p, source, "id",
      deleteCol = Some("_del"), statsCols = Seq("id"))
    assert(sources.Snapshots.readAsOf(spark, p, v4).as[(Long, String)].collect().toSet
      === expected)
  }

  test("snapshots: clustering compaction turns vacuous pruning selective; content identical") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_cluster"
    // Three appends, EACH spanning the full key range (interleaved ids,
    // one file per batch): every file's min/max covers everything, so
    // stats pruning can skip nothing — the post-ingest state every
    // streaming table decays into.
    def b(off: Long) = ss.range(0, 300).filter(col("id") % 3 === off)
      .select(col("id"), (col("id") * 7).as("v")).coalesce(1)
    (0L to 2L).foreach(i => sources.Snapshots.commit(spark, p, b(i), Seq("id")))
    val v3 = sources.Snapshots.currentVersion(spark, p)
    val before = sources.Snapshots.readAsOf(spark, p, v3)
      .as[(Long, Long)].collect().sorted
    val (s0, t0) = sources.Snapshots.pruneFiles(spark, p, v3, "id", 100L, 110L)
    assert(s0.size.toLong === t0,
      "interleaved appends: every file overlaps the range — pruning is vacuous")
    // Cluster-compact on the key: same rows, tight disjoint file ranges.
    val v4 = sources.Snapshots.compactClustered(spark, p, Seq("id"), nFiles = 6)
    val after = sources.Snapshots.readAsOf(spark, p, v4)
      .as[(Long, Long)].collect().sorted
    assert(after === before, "compaction must not change content")
    val (s1, t1) = sources.Snapshots.pruneFiles(spark, p, v4, "id", 100L, 110L)
    assert(t1 >= 6L && s1.size <= 2,
      s"clustered table must prune to O(matching) files, kept ${s1.size}/$t1")
    assert(sources.Snapshots.readAsOfPruned(spark, p, v4, "id", 100L, 110L)
      .filter(col("id").between(100L, 110L)).count() === 11L)
    // Time travel across the compaction is exact.
    assert(sources.Snapshots.readAsOf(spark, p, v3).as[(Long, Long)].collect().sorted
      === before)
  }

  test("snapshots: additive schema evolution — old files read the new column as null") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_evolve"
    val v1 = sources.Snapshots.commit(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = sources.Snapshots.commit(spark, p,
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "extra"))
    val evolved = sources.Snapshots.readAsOf(spark, p, v2, mergeSchema = true)
    assert(evolved.columns.toSeq === Seq("id", "v", "extra"))
    val got = evolved.select(col("id"), coalesce(col("extra"), lit(-1L)))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, -1L), (2L, -1L), (3L, 30L), (4L, 40L)))
    // The pre-evolution snapshot stays readable in its ORIGINAL shape.
    assert(sources.Snapshots.readAsOf(spark, p, v1).columns.toSeq === Seq("id", "v"))
  }

  test("snapshots: merge-on-read deletes move no data, accumulate, and compact away") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_mor"
    val v1 = sources.Snapshots.commit(spark, p,
      ss.range(1, 11).select(col("id"), (col("id") * 3).as("v")), Seq("id"))
    val files1 = sources.Snapshots.readAsOf(spark, p, v1).inputFiles.toSet
    val mt1 = files1.map { f =>
      f -> new java.io.File(new java.net.URI(f)).lastModified()
    }.toMap
    // Two accumulated delete commits: no data file is touched or dropped
    // from the manifest — only the key sets land.
    val v2 = sources.Snapshots.deleteByKey(spark, p, Seq(2L, 4L).toDF("id"), "id")
    val v3 = sources.Snapshots.deleteByKey(spark, p, Seq(7L).toDF("id"), "id")
    val after = sources.Snapshots.readAsOf(spark, p, v3)
    assert(after.select("id").as[Long].collect().toSet
      === Set(1L, 3L, 5L, 6L, 8L, 9L, 10L))
    // inputFiles also lists the delete chunks (the anti-join's build
    // side is itself a parquet scan) — the DATA file set must be
    // exactly v1's.
    assert(after.inputFiles.toSet.filter(_.contains("/data/")) === files1,
      "deletes must not change the data file set")
    mt1.foreach { case (f, t) =>
      assert(new java.io.File(new java.net.URI(f)).lastModified() === t,
        s"data file rewritten by a merge-on-read delete: $f")
    }
    // Time travel: v1 still has every row, v2 only the first delete.
    assert(sources.Snapshots.readAsOf(spark, p, v1).count() === 10L)
    assert(sources.Snapshots.readAsOf(spark, p, v2).count() === 8L)
    // The pruned read applies deletes too.
    assert(sources.Snapshots.readAsOfPruned(spark, p, v3, "id", 1L, 5L)
      .filter(col("id").between(1L, 5L)).select("id").as[Long].collect().toSet
      === Set(1L, 3L, 5L))
    // Guard rails: a different delete key and a COW merge both refuse
    // while deletes are outstanding.
    intercept[IllegalArgumentException] {
      sources.Snapshots.deleteByKey(spark, p, Seq(9L).toDF("v"), "v")
    }
    intercept[IllegalArgumentException] {
      sources.Snapshots.mergeInto(spark, p,
        Seq((1L, 99L)).toDF("id", "v"), "id", statsCols = Seq("id"))
    }
    // Compaction reads THROUGH the delete set and discharges the debt:
    // same answers, and the table accepts a new-key delete again.
    val v4 = sources.Snapshots.compactClustered(spark, p, Seq("id"), nFiles = 2)
    assert(sources.Snapshots.readAsOf(spark, p, v4).select("id").as[Long].collect().toSet
      === Set(1L, 3L, 5L, 6L, 8L, 9L, 10L))
    val v5 = sources.Snapshots.deleteByKey(spark, p, Seq(9L).toDF("id"), "id")
    assert(sources.Snapshots.readAsOf(spark, p, v5).count() === 6L)
  }

  test("snapshots: merge splits a mixed-range chunk — survivor entries stay referenced") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_merge_split"
    // ONE commit whose files split by key range (range partitioning), so
    // the merge must rewrite the chunk's manifest: candidates out,
    // survivors re-listed, survivor FILES untouched on disk.
    val both = ss.range(1, 11).select(col("id"), lit("old").as("v"))
      .unionByName(ss.range(200, 211).select(col("id"), lit("old").as("v")))
      .repartitionByRange(2, col("id"))
    val v1 = sources.Snapshots.commit(spark, p, both, Seq("id"))
    val filesBefore = sources.Snapshots.readAsOf(spark, p, v1).inputFiles.toSet
    assert(filesBefore.size >= 2)
    val source = Seq((205L, "upd", false)).toDF("id", "v", "_del")
    val v2 = sources.Snapshots.mergeInto(spark, p, source, "id",
      deleteCol = Some("_del"), statsCols = Seq("id"))
    val after = sources.Snapshots.readAsOf(spark, p, v2)
    assert(after.filter(col("id") === 205L).as[(Long, String)].head() === ((205L, "upd")))
    assert(after.count() === 21L)
    // The low-range file survived INSIDE the rewritten chunk's manifest.
    val files2 = after.inputFiles.toSet
    val survived = filesBefore.intersect(files2)
    assert(survived.nonEmpty, "non-candidate files of the split chunk must stay referenced")
    assert(filesBefore.diff(files2).nonEmpty, "candidate files must be superseded")
    // A stats-less table still merges correctly — every file is
    // conservatively a candidate (full COW), answers identical.
    val p2 = s"$tmp/snap_merge_legacy"
    sources.Snapshots.commit(spark, p2, ss.range(1, 6).select(col("id"), lit("old").as("v")))
    val v = sources.Snapshots.mergeInto(spark, p2,
      Seq((3L, "upd", false)).toDF("id", "v", "_del"), "id", deleteCol = Some("_del"))
    assert(sources.Snapshots.readAsOf(spark, p2, v).as[(Long, String)].collect().toSet
      === Set((1L, "old"), (2L, "old"), (3L, "upd"), (4L, "old"), (5L, "old")))
  }

  test("snapshots: ingest watermark survives compaction and keeps replays exactly-once") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_wm"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    assert(sources.Snapshots.ingestBatch(b0, 0L, p) === 1L)
    assert(sources.Snapshots.ingestBatch(b1, 1L, p) === 2L)
    // Compaction resets the chunk list — a chunk-name replay guard
    // would forget the batches here; the watermark must not.
    val v3 = sources.Snapshots.compactClustered(spark, p, Seq("id"), nFiles = 1)
    val files3 = sources.Snapshots.readAsOf(spark, p, v3).inputFiles.toSet
    // A restart replay of batch 1 AFTER the compaction is a no-op: no
    // recommit, no new version, no data dir overwritten.
    assert(sources.Snapshots.ingestBatch(b1, 1L, p) === v3,
      "post-compaction replay must be recognized as committed")
    assert(sources.Snapshots.currentVersion(spark, p) === v3)
    assert(sources.Snapshots.readAsOf(spark, p, v3).count() === 3L,
      "replay must not duplicate rows")
    assert(sources.Snapshots.readAsOf(spark, p, v3).inputFiles.toSet === files3)
    // A genuinely new batch id still commits.
    assert(sources.Snapshots.ingestBatch(Seq((4L, "d")).toDF("id", "v"), 2L, p) === v3 + 1)
    // Two streams sharing the table: a SECOND query's batch 1 is not
    // confused with the first query's (per-query watermark keys).
    val vq2 = sources.Snapshots.ingestBatch(
      Seq((9L, "z")).toDF("id", "v"), 1L, p, queryId = "q2")
    assert(vq2 === v3 + 2, "a second query's batch ids are independent")
    assert(sources.Snapshots.readAsOf(spark, p, vq2).count() === 5L)
    // And ITS replay is a no-op too.
    assert(sources.Snapshots.ingestBatch(
      Seq((9L, "z")).toDF("id", "v"), 1L, p, queryId = "q2") === vq2)
    assert(sources.Snapshots.readAsOf(spark, p, vq2).count() === 5L)
  }

  test("snapshots: deletes scope by commit order — a re-inserted key survives the read") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_mor_scope"
    val v1 = sources.Snapshots.commit(spark, p,
      ss.range(1, 6).select(col("id"), lit("old").as("v")), Seq("id"))
    val v2 = sources.Snapshots.deleteByKey(spark, p, Seq(3L).toDF("id"), "id")
    // Re-insert the deleted key AFTER the delete (the streamed
    // re-insert case): the delete must not reach forward to it.
    val v3 = sources.Snapshots.commit(spark, p,
      Seq((3L, "new"), (6L, "new")).toDF("id", "v"), Seq("id"))
    val got = sources.Snapshots.readAsOf(spark, p, v3)
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "old"), (2L, "old"), (4L, "old"), (5L, "old"),
      (3L, "new"), (6L, "new")),
      s"re-inserted key must survive, old copy must stay deleted: $got")
    // The pruned read scopes identically.
    assert(sources.Snapshots.readAsOfPruned(spark, p, v3, "id", 3L, 3L)
      .filter(col("id") === 3L).as[(Long, String)].collect().toSet
      === Set((3L, "new")))
    // A LATER delete of the same key covers both generations.
    val v4 = sources.Snapshots.deleteByKey(spark, p, Seq(3L).toDF("id"), "id")
    assert(sources.Snapshots.readAsOf(spark, p, v4).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 4L, 5L, 6L))
    // Time travel: v2 sees the delete, v1 the full original.
    assert(sources.Snapshots.readAsOf(spark, p, v2).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 4L, 5L))
    assert(sources.Snapshots.readAsOf(spark, p, v1).count() === 5L)
  }

  test("snapshots: compaction preserves an evolved schema (mergeSchema rewrite)") {
    val ss = spark
    import ss.implicits._
    val p = s"$tmp/snap_evolve_compact"
    sources.Snapshots.commit(spark, p, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    sources.Snapshots.commit(spark, p,
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "extra"))
    val v3 = sources.Snapshots.compactClustered(spark, p, Seq("id"), nFiles = 1)
    val after = sources.Snapshots.readAsOf(spark, p, v3, mergeSchema = true)
    assert(after.columns.contains("extra"),
      "compacting an evolved table must not drop the post-evolution column")
    assert(after.select("id", "extra").as[(Long, Option[Long])].collect().toSet
      === Set((1L, None), (2L, None), (3L, Some(30L)), (4L, Some(40L))),
      "evolved values and null backfill must survive the rewrite")
  }
}
