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
