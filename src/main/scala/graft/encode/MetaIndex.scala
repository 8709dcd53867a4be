package graft.encode

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.charset.StandardCharsets.UTF_8

/** Zone-map query path over the encoded store: prune chunks by their
  * per-column min/max metadata BEFORE touching any payload, then decode
  * only surviving chunks and apply the exact predicate.
  *
  * This is the Spark-native analog of the reference's SUMMARY segment
  * indexes (python-blosc2 indexing.py:44-57) and its candidate-chunk
  * pruning (`_prune_chunks`, lazyexpr.py:1737-1744): the pruning
  * predicate is an ordinary filter on tiny metadata columns (payloads
  * of pruned chunks are never decoded), so at 100 TB a selective point
  * query reads metadata plus only the matching chunks.
  *
  * Zone-key semantics (must match ColBuilder): string keys compare in
  * UTF-8 byte order; numeric keys compare numerically via the recorded
  * column type; an empty minKey/maxKey means unbounded (e.g. values
  * longer than TableCodec.ZONE_KEY_MAX are never zone-keyed).
  */
object MetaIndex {

  private def strCmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  /** zone [minKey,maxKey] of `c` intersects the query range [lo,hi]? */
  private def intersects(c: EncodedCol, lo: String, hi: String): Boolean = {
    val numeric = c.dt == "bigint" || c.dt == "int" || c.dt == "double"
    if (c.minKey.isEmpty && c.maxKey.isEmpty) return true
    if (numeric) {
      val minV = if (c.minKey.isEmpty) Double.NegativeInfinity else c.minKey.toDouble
      val maxV = if (c.maxKey.isEmpty) Double.PositiveInfinity else c.maxKey.toDouble
      !(maxV < lo.toDouble || minV > hi.toDouble)
    } else {
      val aboveLo = c.maxKey.isEmpty || strCmp(c.maxKey, lo) >= 0
      val belowHi = c.minKey.isEmpty || strCmp(c.minKey, hi) <= 0
      aboveLo && belowHi
    }
  }

  /** Chunks whose zone intersects [lo, hi] on `colName`. */
  def candidateBlocks(blocks: Dataset[EncodedBlock], colName: String,
                      lo: String, hi: String): Dataset[EncodedBlock] = {
    implicit val enc: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
    blocks.filter { b =>
      b.cols.find(_.name == colName).forall(c => intersects(c, lo, hi))
    }
  }

  /** Point/range lookup: metadata prune → decode survivors → exact filter. */
  def lookup(blocks: Dataset[EncodedBlock], schema: StructType,
             colName: String, lo: String, hi: String): DataFrame = {
    val pruned = candidateBlocks(blocks, colName, lo, hi)
    val dt = schema(colName).dataType
    TableCodec.decode(pruned, schema)
      .filter(col(colName) >= lit(lo).cast(dt) && col(colName) <= lit(hi).cast(dt))
  }

  /** Pruning stats for a predicate: (candidate chunks, total chunks). */
  def pruningStats(blocks: Dataset[EncodedBlock], colName: String,
                   lo: String, hi: String): (Long, Long) = {
    val total = blocks.count()
    val cand = candidateBlocks(blocks, colName, lo, hi).count()
    (cand, total)
  }
}
