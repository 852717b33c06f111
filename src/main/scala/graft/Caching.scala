package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for frames the library persists internally.
  *
  * Several operators persist an intermediate because it feeds multiple
  * plan branches (MinHash signatures, inverted shingle index, bucketed
  * embeddings, the parsed-events frame, per-channel scores, the tensor
  * pivot). Those frames must live until the caller's terminal action —
  * the library cannot unpersist them itself without re-triggering the
  * scans the persist exists to avoid. So the contract is:
  *
  *   1. library code registers every internal persist via [[persisted]];
  *   2. the CALLER invokes [[release]] once after the terminal action
  *      (collect/write) of the query it built.
  *
  * [[Verify]] and [[Bench]] do this after every query; a long-lived
  * session that skips release merely falls back to LRU eviction (the
  * pre-registry behavior), it never gets wrong results. Thread-safe.
  */
object Caching {

  private val tracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for [[release]]. */
  def persisted(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Unpersist every frame registered since the last release.
    * Non-blocking: executors drop the blocks asynchronously. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently-registered (unreleased) frames. */
  def trackedCount: Int = synchronized(tracked.size)
}
