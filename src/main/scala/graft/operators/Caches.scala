package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Ownership for operator-internal `persist()` calls (SURVEY §5 rule: every
  * persist has an owner that unpersists).
  *
  * Operators like MinHash-LSH persist a staging frame that the *returned*
  * (lazy) DataFrame reads several times — the operator cannot unpersist
  * before the caller's action runs, so it can never be the releasing owner
  * itself. Every internal persist is therefore registered here, and the
  * consumer releases it once the result is materialized: Bench/Verify call
  * `releaseAll()` between gate queries, specs call it in teardown, and a
  * library user does the same after collecting/writing a result. Weak
  * references keep the registry from pinning DataFrames (and through them
  * SparkSessions) that the caller has already dropped.
  */
object Caches {

  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[java.lang.ref.WeakReference[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for `releaseAll`. */
  private[graft] def owned(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(new java.lang.ref.WeakReference(df))
    df
  }


  /** Unpersist every registered frame (non-blocking) and clear the registry.
    * Safe to call at any time: results already materialized stay correct
    * (the cache is an optimization, never a semantic dependency). */
  def releaseAll(): Unit = {
    var ref = live.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) {
        try df.unpersist(false)
        catch { case _: Throwable => () } // session already stopped — nothing to release
      }
      ref = live.poll()
    }
  }
}
