package graft.encode

import org.apache.spark.sql.SparkSession

/** Driver-side LRU of zone-candidate coordinates per (store version,
  * predicate) — the analog of the reference's compressed result-
  * coordinate cache (python-blosc2 indexing.py:86-110). A repeated
  * probe with the same predicate skips the metadata scan entirely.
  *
  * Invalidation is belt-and-braces:
  *  - EXPLICIT: every in-process mutation path (CoW rewrites via
  *    Lineage.dropDerived, resumable encode) calls `invalidate` — the
  *    authoritative signal for the driver that performed the mutation;
  *  - VERSIONED: for snapshot-enabled stores the cache key embeds the
  *    COMMITTED `Snapshots` listing version — bumped by every CoW
  *    mutation in any process, so an out-of-process commit can never
  *    serve a stale candidate set, object stores included. Stores that
  *    have never been mutated (no `_snapshots/`) fall back to the max
  *    child mtime (one driver listStatus, no Spark job); the mtime
  *    caveat — object stores with synthetic constant-mtime directory
  *    entries, coarse mtime granularity — applies only to that
  *    fallback, where cross-process writers should call
  *    `invalidate`/`clear` or enable snapshots.
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
    // Snapshot-enabled stores have an AUTHORITATIVE version: the
    // committed listing number, bumped by every CoW mutation in ANY
    // process — immune to object stores whose synthetic directory
    // entries keep constant mtimes. The mtime probe below remains only
    // for never-snapshotted directories.
    Snapshots.currentVersion(spark, storeDir) match {
      case Some(v) => return v
      case None =>
    }
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return -1L
    val children = fs.listStatus(p)
    if (children.isEmpty) fs.getFileStatus(p).getModificationTime
    else children.map(_.getModificationTime).max
  }

  def key(spark: SparkSession, storeDir: String, parts: String*): String =
    s"$storeDir@${version(spark, storeDir)}|${parts.mkString("|")}"

  /** Sentinel for a NEGATIVE entry: "this predicate's candidate set is
    * too large to push/cache" — cached so repeated non-selective probes
    * do not re-pay the limit-collect metadata scan just to re-learn it.
    */
  private val TOO_LARGE = new Array[(Int, Int, Long)](0)

  /** Cached coordinates for `k`, or compute-and-cache. `compute`
    * returns null to signal "too large" — the verdict itself is cached
    * (as a sentinel) and null is returned to this and future callers.
    */
  def getOrCompute(k: String)(compute: => Array[(Int, Int, Long)]): Array[(Int, Int, Long)] = {
    val cached = lru.synchronized(lru.get(k))
    if (cached != null) {
      hits.incrementAndGet()
      return if (cached eq TOO_LARGE) null else cached
    }
    misses.incrementAndGet()
    val v = compute
    lru.synchronized { lru.put(k, if (v == null) TOO_LARGE else v); () }
    v
  }

  /** Drop every entry of `storeDir` (any version) — called by
    * in-process mutation paths.
    */
  def invalidate(storeDir: String): Unit = {
    lru.synchronized {
      val it = lru.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(storeDir + "@")) it.remove()
    }
    RelCache.invalidate(storeDir)
  }

  def clear(): Unit = {
    lru.synchronized(lru.clear())
    RelCache.clear()
  }
}
