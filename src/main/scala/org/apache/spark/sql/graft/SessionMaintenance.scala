package org.apache.spark.sql.graft

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.BroadcastBlockId

/** Storage-level session hygiene that needs `private[spark]` surface
  * (BlockManagerMaster), hence this package.
  *
  * Broadcast variables created by broadcast joins are normally reclaimed
  * by the ContextCleaner only after the driver GC collects the plan
  * objects referencing them — which in a long-lived session is lazy and
  * unpredictable: across a 47-query bench the blocks accumulate
  * monotonically (every broadcast dim, bitmap and plane set of every
  * preceding query) and the eventual cleanup can land mid-query as GC /
  * storage-memory pressure. Dropping the blocks explicitly between
  * queries keeps the storage footprint per-query, the same contract
  * [[graft.GraftSession.releaseCaches]] gives cached RDDs.
  */
object SessionMaintenance {

  /** Remove every broadcast block from this application's block managers.
    *
    * Safe between queries: a finished query's broadcasts are never
    * re-read, and the ContextCleaner's own later removal of the same ids
    * is idempotent. Must NOT be called while a query that may still probe
    * a broadcast is executing.
    */
  def dropBroadcastBlocks(spark: SparkSession): Unit = {
    val master = SparkEnv.get.blockManager.master
    val ids = master.getMatchingBlockIds(_.isBroadcast, askStorageEndpoints = true)
    ids.iterator
      .collect { case BroadcastBlockId(id, _) => id }
      .toSet[Long]
      .foreach(id => master.removeBroadcast(id, removeFromMaster = true, blocking = false))
  }
}
