package graft

import org.apache.spark.sql.DataFrame

/** Explicit lifecycle for operator-internal `cache()` calls.
  *
  * The dedup family caches shared scans (hashed shingles, simhash
  * signatures) and the connected-components fixpoint result — reuse
  * within one operator invocation is the point, but a returned cached
  * frame with no owner leaks one in-memory relation per call. Every
  * operator cache is therefore created through [[cached]], and the two
  * entrypoint mains (Verify, Bench) call [[clear]] between queries so
  * no relation outlives the query that built it. Library users embed
  * the same call at their own batch boundaries.
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val cleanups = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Cache `df` and register it for the next [[clear]]. */
  def cached(df: DataFrame): DataFrame = synchronized {
    df.cache()
    frames += df
    df
  }

  /** Register a cleanup thunk to run at the next [[clear]] — for
    * materializations `DataFrame.unpersist` cannot reach (e.g. the
    * RDD behind a checkpointed frame, which the cache manager does
    * not track). Must be idempotent and non-throwing.
    */
  def onClear(f: () => Unit): Unit = synchronized { cleanups += f }

  /** Unpersist (non-blocking) every registered frame and run every
    * registered cleanup. Idempotent: frames already unpersisted by
    * their operator are a no-op.
    */
  def clear(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
    cleanups.foreach(f => f())
    cleanups.clear()
  }
}
