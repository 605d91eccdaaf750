package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.util.SerializableConfiguration

/** Small bridges to `private[spark]` runtime plumbing that executor-side
  * file maintenance needs. Lives under `org.apache.spark.sql` so the
  * standard third-party-extension access rules apply (the
  * VectorExpressions / RoaringAggregates packaging rationale): nothing
  * here touches internals beyond what a custom data source would.
  */
object GraftInternals {

  /** Delete every path in `paths` from its owning FileSystem,
    * DISTRIBUTED: each task opens its own client from the session's
    * Hadoop configuration (serialized via the same
    * [[SerializableConfiguration]] wrapper Spark's own datasources
    * ship to tasks) and reclaims its partition's files. The driver
    * never materializes the path list — only per-partition delete
    * counts come back. Returns the number of files actually deleted
    * (a path already gone counts zero, so replays are idempotent).
    */
  /** Recursively list every file under each directory in `dirs`,
    * DISTRIBUTED: directories fan out over tasks, each task walks its
    * subtrees with its own FileSystem client. Returns (path, mtimeMs)
    * rows — at 10⁶-file tables the listing is itself a dataset, and the
    * driver holds only the top-level directory names it was given.
    */
  def distributedListing(
      spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): Dataset[(String, Long)] = {
    val hconf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    import spark.implicits._
    spark.createDataset(dirs).repartition(math.max(1, math.min(dirs.size, 64)))
      .flatMap { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(hconf.value)
        val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
        if (fs.exists(p)) {
          val it = fs.listFiles(p, true)
          while (it.hasNext) {
            val st = it.next()
            out += ((st.getPath.toUri.getPath, st.getModificationTime))
          }
        }
        out
      }
  }

  def distributedDelete(paths: Dataset[String]): Int = {
    val spark = paths.sparkSession
    val hconf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    paths.mapPartitions { it =>
      var n = 0
      var fsCache: org.apache.hadoop.fs.FileSystem = null
      it.foreach { s =>
        val p = new org.apache.hadoop.fs.Path(s)
        if (fsCache == null) fsCache = p.getFileSystem(hconf.value)
        if (fsCache.delete(p, false)) n += 1
      }
      Iterator.single(n)
    }.collect().sum
  }
}
