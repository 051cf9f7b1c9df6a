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

  /** Cache `df` and register it for the next [[clear]]. */
  def cached(df: DataFrame): DataFrame = synchronized {
    df.cache()
    frames += df
    df
  }

  /** Unpersist (non-blocking) every registered frame. Idempotent:
    * frames already unpersisted by their operator are a no-op.
    */
  def clear(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }
}
