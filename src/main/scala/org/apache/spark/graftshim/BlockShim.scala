package org.apache.spark.graftshim

import org.apache.spark.SparkContext
import org.apache.spark.storage.{BroadcastBlockId, RDDBlockId}

/**
 * Bridge to the private[spark] block-manager surface: lets the bench ask
 * "are any RDD blocks still stored?" — which covers both Dataset-cache
 * partitions AND the GC-tracked blocks that `localCheckpoint(eager = true)`
 * creates. `spark.catalog.clearCache()` only empties the CacheManager; a
 * checkpoint block lives until its RDD object is garbage-collected and the
 * ContextCleaner drains its reference queue, so a measurement harness needs
 * this signal to know when the storage pool is actually empty.
 */
object BlockShim {
  /** Number of RDD blocks currently held by any block manager. Asks the
   *  storage endpoints directly (not the master's cached view) so a block
   *  dropped a moment ago doesn't read as still present. */
  /** RDD blocks plus BROADCAST blocks. Broadcast pieces are the other
   *  GC-tracked block class: every broadcast join leaves torrent pieces in
   *  the storage pool until the Broadcast object is collected and the
   *  ContextCleaner drains it — across a 30-query sweep that is hundreds
   *  of blocks of storage-pool pressure landing on whichever query
   *  happens to run when the JVM finally collects. (An RDD-only variant
   *  existed through round 7; it is gone because counting only RDD blocks
   *  was exactly the drain bug — don't reintroduce it.) */
  def gcTrackedBlockCount(sc: SparkContext): Int =
    sc.env.blockManager.master
      .getMatchingBlockIds(
        id => id.isInstanceOf[RDDBlockId] || id.isInstanceOf[BroadcastBlockId],
        askStorageEndpoints = true)
      .size
}
