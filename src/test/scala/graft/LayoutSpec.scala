package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

/** The z-order layout's actual value proposition, measured: a 2-d box
  * predicate over the Morton-clustered layout must read a small curve
  * segment (row groups pruned by parquet min/max on BOTH dimensions),
  * while the same predicate over a 1-d sorted layout reads the whole
  * stripe of the leading dimension.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.create("graft-layout-test", master = "local[4]")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 256×256 grid with a payload wide enough that 64 KB row groups hold
    * only a few hundred rows — so row-group pruning is observable at
    * test scale.
    */
  private def grid: DataFrame =
    spark.range(0, 1 << 16).select(
      (col("id") % 256).as("a"),
      (col("id") / 256).cast("long").as("b"),
      // Incompressible payload (unique high-entropy strings defeat
      // dictionary/RLE), so the on-disk row-group row count actually
      // tracks the configured block size.
      concat(md5(col("id").cast("string")), md5((col("id") + 1000000).cast("string"))).as("pl"))

  /** Rows the scan node emitted for `box` over `path` — i.e. rows
    * surviving parquet row-group pruning (record-level filtering is off,
    * so this measures exactly how many row groups were decoded).
    */
  private def scanRows(path: String): (Long, Long) = {
    val df = spark.read.parquet(path)
      .filter(col("a").between(64, 95) && col("b").between(64, 95))
    // collect() through df's own queryExecution so the scan-node metrics
    // below belong to the executed plan (a count() would execute a
    // different, freshly-planned query).
    val n = df.collect().length.toLong
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail(s"no parquet scan in:\n$plan"))
    (n, scan.metrics("numOutputRows").value)
  }

  test("zValue matches a bit-by-bit reference interleave") {
    val got = grid.select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def ref(a: Long, b: Long): Long =
      (0 until 21).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    got.foreach { case ((a, b), z) => assert(z === ref(a, b), s"($a,$b)") }
    // The curve property the layout depends on: an aligned power-of-two
    // box is one contiguous z-interval.
    val boxZ = (for (a <- 64L to 95L; b <- 64L to 95L) yield ref(a, b)).sorted
    assert(boxZ.last - boxZ.head === boxZ.size - 1, "aligned box is not z-contiguous")
  }

  test("2-d box over the z-ordered layout prunes row groups the 1-d layout must read") {
    Layout.writeZOrdered(grid, "a", "b", s"$tmp/z", nFiles = 8, rowGroupBytes = 16L * 1024)
    grid
      .repartitionByRange(8, col("a"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite")
      .option("parquet.block.size", 16L * 1024)
      .option("parquet.page.size", 2L * 1024)
      .parquet(s"$tmp/linear")
    val (nZ, readZ) = scanRows(s"$tmp/z")
    val (nL, readL) = scanRows(s"$tmp/linear")
    assert(nZ === 32L * 32 && nL === nZ, "both layouts must return the exact box")
    assert(readZ < readL / 3,
      s"z-order read $readZ rows vs linear $readL — no pruning advantage")
    assert(readL < (1L << 16), "sanity: even the linear layout prunes the a-stripe")
  }

  test("compaction bin-packs the shattered table, preserves content exactly, and re-runs as a no-op") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val path = s"$tmp/shattered"
    docs.repartition(32).write.mode("overwrite").parquet(path)
    def files() = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = docs.collect().map(_.toString).sorted
    assert(files() === 32)
    val bytes = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val rep = graft.sources.Layout.compact(spark, path, targetBytes = bytes / 4 + 1)
    assert(rep.filesBefore === 32 && rep.filesAfter === 4)
    assert(files() === 4, "on-disk layout must match the report")
    val after = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(after === before, "compaction must not change the row multiset")
    assert(rep.rows === before.length.toLong)
    // Idempotent maintenance loop: already-compacted input is a no-op.
    val rep2 = graft.sources.Layout.compact(spark, path, targetBytes = bytes / 4 + 1)
    assert(rep2.filesBefore === rep2.filesAfter)
    assert(files() === 4)
    // Empty leaf dir (fresh partition): skipped with a zero report, no read.
    val empty = s"$tmp/empty-part"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    val rep3 = graft.sources.Layout.compact(spark, empty, targetBytes = 1024)
    assert(rep3 === graft.sources.Layout.CompactionReport(0, 0, 0L, 0L))
  }
}
