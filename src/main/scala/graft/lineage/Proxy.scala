package graft.lineage

import graft.encode.{StoreLayout, TableCodec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Compressed cache of a SLOW source — the reference's Proxy container
  * (python-blosc2 proxy.py:206: on-demand fetch of a remote/expensive
  * array, cached in a local compressed container).
  *
  * Spark-native shape: the first access ENCODES the source into a graft
  * store at `cacheDir` (so the cache is this engine's compressed
  * format: ~3.5× smaller than raw, survives the session, shareable by
  * other drivers, and every later read gets column pruning + zone
  * pruning over it — none of which `persist(DISK_ONLY)`'s session-local
  * lz4 block cache provides). Later accesses decode from the store and
  * NEVER evaluate the source again (spec-asserted by an evaluation
  * counter). The fill is `Lineage.encodeResumable`, so a crashed fill
  * resumes instead of re-fetching completed shards — the proxy
  * property that matters when the source is a rate-limited remote.
  */
object Proxy {

  private def markerPath(cacheDir: String) =
    new org.apache.hadoop.fs.Path(s"$cacheDir/_proxy_complete")

  def isFilled(spark: org.apache.spark.sql.SparkSession, cacheDir: String): Boolean = {
    val p = markerPath(cacheDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The proxied table: decode from the cache, filling it from
    * `source` first iff absent (or `refresh`). `source` is by-name —
    * a hit never constructs it.
    */
  def through(spark: org.apache.spark.sql.SparkSession, cacheDir: String,
              schema: StructType, idCols: Seq[String],
              nShards: Int = 64, nBatches: Int = 4, refresh: Boolean = false)
             (source: => DataFrame): DataFrame = {
    val fs = markerPath(cacheDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (refresh && fs.exists(new org.apache.hadoop.fs.Path(cacheDir))) {
      fs.delete(new org.apache.hadoop.fs.Path(cacheDir), true)
      graft.encode.QueryCache.invalidate(cacheDir)
    }
    if (!isFilled(spark, cacheDir)) {
      Lineage.encodeResumable(spark, source, cacheDir, idCols,
        nShards = nShards, nBatches = nBatches)
      val out = fs.create(markerPath(cacheDir), true)
      out.write("ok".getBytes("UTF-8"))
      out.close()
    }
    TableCodec.decode(StoreLayout.readBlocks(spark, cacheDir), schema)
  }
}
