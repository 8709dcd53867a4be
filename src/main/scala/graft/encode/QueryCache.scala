package graft.encode

import org.apache.spark.sql.SparkSession

/** Driver-side LRU of zone-candidate coordinates per (store version,
  * predicate) — the analog of the reference's compressed result-
  * coordinate cache (python-blosc2 indexing.py:86-110). A repeated
  * probe with the same predicate skips the metadata scan entirely.
  *
  * Invalidation is by STORE VERSION, not explicit hooks: the version is
  * the max modification time over the store's direct children (shard
  * partition dirs, `_manifest`, `_index`, ...) — one cheap driver
  * listStatus, no Spark job. Every mutation path (CoW partition
  * overwrite, manifest refresh, index rebuild) touches at least one
  * direct child dir, so a stale entry can never be served after a
  * mutation; an unrelated version bump merely costs a recompute.
  *
  * Only candidate sets small enough for the pushed-keys path are cached
  * (≤ MAX_PUSHDOWN_KEYS coordinates, ≈16 bytes each) — the cache is
  * bounded by MAX_ENTRIES × that, a few MB of driver heap.
  */
object QueryCache {

  private val MAX_ENTRIES = 256

  private val lru = new java.util.LinkedHashMap[String, Array[(Int, Int, Long)]](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Array[(Int, Int, Long)]]): Boolean =
      size() > MAX_ENTRIES
  }

  // observability for specs + tuning
  val hits = new java.util.concurrent.atomic.AtomicLong
  val misses = new java.util.concurrent.atomic.AtomicLong

  def version(spark: SparkSession, storeDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return -1L
    val children = fs.listStatus(p)
    if (children.isEmpty) fs.getFileStatus(p).getModificationTime
    else children.map(_.getModificationTime).max
  }

  def key(spark: SparkSession, storeDir: String, parts: String*): String =
    s"$storeDir@${version(spark, storeDir)}|${parts.mkString("|")}"

  /** Cached coordinates for `k`, or compute-and-cache. `compute` may
    * return null to signal "too large to cache" (cached as absent).
    */
  def getOrCompute(k: String)(compute: => Array[(Int, Int, Long)]): Array[(Int, Int, Long)] = {
    val cached = lru.synchronized(lru.get(k))
    if (cached != null) { hits.incrementAndGet(); return cached }
    misses.incrementAndGet()
    val v = compute
    if (v != null) lru.synchronized { lru.put(k, v); () }
    v
  }

  def clear(): Unit = lru.synchronized(lru.clear())
}
