package graft.encode

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side LRU of ANALYZED parquet relations keyed by
  * (path, store version) — the path-read analog of Spark's own
  * catalog-table FileIndex caching (guide §6: repeated listings of the
  * same table are pure overhead; `filesourcePartitionFileCacheSize`
  * exists for exactly this).
  *
  * Every `spark.read.parquet(path)` pays a fresh driver file listing
  * plus a footer/schema read (often a tiny Spark job of its own); the
  * store/index probe paths re-open the same store, index and offsets
  * relations several times PER QUERY, so those jobs dominated the
  * probe latencies (r6 measurement: 9-22 driver-blocking jobs per
  * store query, most of them ~18 ms listing/footer jobs).
  *
  * This caches ONLY the relation (file listing + schema) — never any
  * computed result. Invalidation mirrors QueryCache: the key embeds the
  * committed snapshot version when the store has one, else the max
  * child mtime; in-process mutation paths call `invalidate` explicitly
  * (wired through QueryCache.invalidate/clear).
  */
object RelCache {

  private val MAX_ENTRIES = 128

  private val lru = new java.util.LinkedHashMap[(String, Long), DataFrame](32, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[(String, Long), DataFrame]): Boolean =
      size() > MAX_ENTRIES
  }

  /** Cached analyzed relation for `path` at its current version, or
    * open-and-cache via `open` (which must read exactly `path`'s
    * current content). An entry bound to a different (e.g. stopped and
    * rebuilt) SparkSession is evicted, never served — a DataFrame is
    * session-bound, unlike the coordinate cache's plain arrays.
    */
  def parquet(spark: SparkSession, path: String)(open: => DataFrame): DataFrame = {
    val k = (path, QueryCache.version(spark, path))
    lru.synchronized {
      val hit = lru.get(k)
      if (hit != null) {
        if ((hit.sparkSession eq spark) && !spark.sparkContext.isStopped) return hit
        lru.remove(k); ()
      }
    }
    val df = open
    lru.synchronized { lru.put(k, df); () }
    df
  }

  def invalidate(path: String): Unit = lru.synchronized {
    val it = lru.keySet().iterator()
    while (it.hasNext) if (it.next()._1.startsWith(path)) it.remove()
  }

  def clear(): Unit = lru.synchronized(lru.clear())
}
