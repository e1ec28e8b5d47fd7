package graft

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal caches so harnesses can release them
  * per query without nuking the whole catalog cache.
  *
  * Operators that read an intermediate more than once (dedup signature
  * tables, IVF cell assignments) persist it via [[cached]]. Bench warms
  * the BASE table scans once for the whole run (a buffer pool, the same
  * advantage the DuckDB oracle gets from the OS page cache) but must
  * drop each query's own intermediates between timed samples —
  * otherwise min-of-2 would time a cache read, not the operator.
  * `spark.catalog.clearCache()` can't make that distinction; this
  * registry can.
  */
object CacheScope {
  private val tracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` and remember it for the next [[flush]]. */
  def cached(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.cache()
  }

  /** Unpersist every tracked intermediate (blocking, so a bench sample
    * never overlaps the previous sample's eviction I/O).
    */
  def flush(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = true))
    tracked.clear()
  }

  /** Like [[flush]], but hands the flushed frames back to the caller.
    * The bench's statement-cached samples use this: the frames a query
    * registered at construct time are re-`cache()`d before each cached
    * sample and unpersisted right after, so every sample rebuilds the
    * operator's internal caches (paying the build work the designed
    * plan pays) and never reads a previous sample's leftovers.
    */
  def drain(): Seq[DataFrame] = synchronized {
    val out = tracked.toList
    tracked.foreach(_.unpersist(blocking = true))
    tracked.clear()
    out
  }
}
