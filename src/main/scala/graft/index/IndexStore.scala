package graft.index

import graft.encode.{MetaIndex, StoreLayout, TableCodec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.InternalRowShim
import org.apache.spark.sql.types._

/** Persistent secondary indexes over the encoded block store — the
  * Spark-native analog of the reference's largest query subsystem
  * (python-blosc2 indexing.py:4019 `create_index`, FULL/BUCKET/SUMMARY
  * kinds; SUMMARY is our zone map, graft.encode.MetaIndex).
  *
  * FULL index: one row per (key, chunk, position), range-partitioned
  * and sorted by key, stored as parquet under `<store>/_index/full/<col>`.
  * A range probe reads the index with the key predicate pushed into the
  * scan (row-group stats skip non-intersecting groups), groups the
  * surviving positions per chunk, fetches ONLY those chunks (pushed
  * chunk keys), and gathers rows by position — never decoding a chunk
  * the index did not name. Serves point/range lookups and index-ordered
  * scans (reference: sort_by served from a FULL index, ctable.py:11812).
  *
  * BUCKET index: one row per (hash bucket, chunk) — chunk-granular,
  * tiny, for equality probes on high-cardinality columns where a FULL
  * index is not worth its bytes (reference BUCKET kind).
  *
  * Scale notes: with the v2 store layout the index build reads ONLY the
  * indexed column's bytes (parquet leaf pruning — asserted in
  * StoreLayoutSpec); the build itself is one shuffle (range partition
  * of narrow (key, pos) rows); probes read O(log) row groups of the
  * index + O(selected) chunks of the store. Gathered positions flow
  * through a broadcast (bounded by Planner.MAX_GATHER_ROWS — beyond
  * that a scan wins anyway, see Planner).
  */
object IndexStore {

  def fullPath(storeDir: String, colName: String) = s"$storeDir/_index/full/$colName"
  def bucketPath(storeDir: String, colName: String) = s"$storeDir/_index/bucket/$colName"
  def offsetsPath(storeDir: String) = s"$storeDir/_offsets"

  final case class LongEntry(key: Long, shard: Int, partId: Int, chunkId: Long, pos: Int)
  final case class StrEntry(key: String, shard: Int, partId: Int, chunkId: Long, pos: Int)
  final case class DblEntry(key: Double, shard: Int, partId: Int, chunkId: Long, pos: Int)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
  def hasFull(spark: SparkSession, storeDir: String, colName: String): Boolean =
    exists(spark, fullPath(storeDir, colName))
  def hasBucket(spark: SparkSession, storeDir: String, colName: String): Boolean =
    exists(spark, bucketPath(storeDir, colName))

  /** Build (or rebuild) the FULL index for `colName`. One pass over the
    * store reading ONLY the indexed column (v2 layout → sibling
    * columns' payload pages are never read); NULL keys are not indexed
    * (IS NULL probes fall back to scan, standard semantics).
    */
  def createFull(spark: SparkSession, storeDir: String, schema: StructType, colName: String): Unit = {
    import graft.codecs.{BinVec, DoubleVec, LongVec}
    StoreLayout.requireNoBatch(graft.encode.Snapshots.storeDf(spark, storeDir).schema, "createFull")
    val blocks = StoreLayout.readBlocks(spark, storeDir, Seq(colName))
    val out = fullPath(storeDir, colName)
    val dt = MetaIndex.flatOf(schema)(colName).dataType

    def entries[T: scala.reflect.ClassTag](f: (graft.codecs.ColVec, graft.encode.EncodedBlock) => Iterator[T]) =
      blocks.rdd.flatMap { b =>
        val c = b.cols.find(_.name == colName)
          .getOrElse(throw new IllegalArgumentException(s"no column $colName in block"))
        f(TableCodec.decodeColumn(c), b)
      }

    val entriesDf = dt match {
      case StringType =>
        val rdd = entries { (vec, b) =>
          val v = vec.asInstanceOf[BinVec]
          Iterator.range(0, v.n).filter(v.isValid).map(i =>
            StrEntry(new String(v.values(i), java.nio.charset.StandardCharsets.UTF_8), b.shard, b.partId, b.chunkId, i))
        }
        spark.createDataset(rdd)(org.apache.spark.sql.Encoders.product[StrEntry]).toDF()
      case DoubleType | FloatType =>
        val rdd = entries { (vec, b) =>
          val v = vec.asInstanceOf[DoubleVec]
          Iterator.range(0, v.n).filter(v.isValid).map(i =>
            DblEntry(v.values(i), b.shard, b.partId, b.chunkId, i))
        }
        spark.createDataset(rdd)(org.apache.spark.sql.Encoders.product[DblEntry]).toDF()
      case _ => // every long-backed type (int/long/ts/date/bool/short/byte/dec<=18)
        val rdd = entries { (vec, b) =>
          val v = vec.asInstanceOf[LongVec]
          Iterator.range(0, v.n).filter(v.isValid).map(i =>
            LongEntry(v.values(i), b.shard, b.partId, b.chunkId, i))
        }
        spark.createDataset(rdd)(org.apache.spark.sql.Encoders.product[LongEntry]).toDF()
    }
    // RANK-MATERIALIZED index (the reference's FULL "rank" index,
    // RELEASE_NOTES.md:196-203): range-partition + FULL-tuple sort (a
    // total order — ties of equal keys land in one range partition and
    // break on the unique physical tuple), then a global rank in
    // partition-major order. Row-group stats on `rank` turn any sorted
    // window [offset, offset+k) into a PUSHED range read — deep
    // sorted_slice reads O(window) index bytes at any depth, no sort,
    // Long offsets. zipWithIndex's extra count job reads the persisted
    // sorted entries, not the store.
    val sorted = entriesDf.repartitionByRange(col("key"))
      .sortWithinPartitions("key", "shard", "partId", "chunkId", "pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ranked = sorted.rdd.zipWithIndex().map { case (r, rank) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rank)
      }
      spark.createDataFrame(ranked, StructType(sorted.schema.fields :+
          StructField("rank", LongType, nullable = false)))
        .write.mode("overwrite").parquet(out)
      graft.encode.QueryCache.invalidate(out) // rebuilt index: drop its cached relation
    } finally { sorted.unpersist(); () }
  }

  /** Build the BUCKET index: distinct (bucket, chunk) pairs, reading
    * only the indexed column's bytes.
    */
  def createBucket(spark: SparkSession, storeDir: String, schema: StructType,
                   colName: String, nBuckets: Int = 1 << 14): Unit = {
    import graft.codecs.{BinVec, LongVec}
    StoreLayout.requireNoBatch(graft.encode.Snapshots.storeDf(spark, storeDir).schema, "createBucket")
    val blocks = StoreLayout.readBlocks(spark, storeDir, Seq(colName))
    val rdd = blocks.rdd.flatMap { b =>
      val c = b.cols.find(_.name == colName).get
      val vec = TableCodec.decodeColumn(c)
      val buckets = scala.collection.mutable.BitSet()
      vec match {
        case v: BinVec =>
          var i = 0
          while (i < v.n) { if (v.isValid(i)) buckets += bucketOfBytes(v.values(i), nBuckets); i += 1 }
        case v: LongVec =>
          var i = 0
          while (i < v.n) { if (v.isValid(i)) buckets += bucketOfLong(v.values(i), nBuckets); i += 1 }
        case v => throw new IllegalArgumentException(s"bucket index on ${v.getClass.getSimpleName}")
      }
      buckets.iterator.map(bk => (bk, b.shard, b.partId, b.chunkId))
    }
    spark.createDataset(rdd)(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt, org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt, org.apache.spark.sql.Encoders.scalaLong))
      .toDF("bucket", "shard", "partId", "chunkId")
      .repartitionByRange(col("bucket")).sortWithinPartitions("bucket")
      .write.mode("overwrite").parquet(bucketPath(storeDir, colName))
    graft.encode.QueryCache.invalidate(bucketPath(storeDir, colName))
  }

  def bucketOfBytes(v: Array[Byte], nBuckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.bytesHash(v, 0x9747b28c), nBuckets)
  def bucketOfLong(v: Long, nBuckets: Int): Int =
    math.floorMod(graft.corpus.Corpus.mix(v).toInt, nBuckets)

  /** Read the FULL index for a key range with the predicate pushed into
    * the parquet scan. `lo`/`hi` in the index key domain (long for
    * long-backed columns, raw string, double).
    */
  /** The FULL index relation, served from the version-keyed RelCache
    * (repeated probes re-opened the index parquet — and re-paid its
    * listing/footer jobs — on every call).
    */
  private def fullIndexDf(spark: SparkSession, storeDir: String, colName: String): DataFrame = {
    val p = fullPath(storeDir, colName)
    graft.encode.RelCache.parquet(spark, p)(spark.read.parquet(p))
  }

  def readFullRange(spark: SparkSession, storeDir: String, schema: StructType,
                    colName: String, lo: String, hi: String): DataFrame = {
    val idx = fullIndexDf(spark, storeDir, colName)
    MetaIndex.flatOf(schema)(colName).dataType match {
      case StringType => idx.filter(col("key") >= lo && col("key") <= hi)
      case DoubleType | FloatType => idx.filter(col("key") >= lo.toDouble && col("key") <= hi.toDouble)
      case _ => idx.filter(col("key") >= lo.toLong && col("key") <= hi.toLong)
    }
  }

  /** Index-served range lookup: probe the FULL index, fetch only the
    * named chunks, gather only the named positions. Returns rows of
    * `schema`. Caller (Planner) bounds the gather size.
    */
  def rangeGather(spark: SparkSession, storeDir: String, schema: StructType,
                  colName: String, lo: String, hi: String): DataFrame = {
    val hits = readFullRange(spark, storeDir, schema, colName, lo, hi)
      .select("shard", "partId", "chunkId", "pos").collect()
    val byChunk: Map[(Int, Int, Long), Array[Int]] =
      hits.groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .map { case (k, rs) => k -> rs.map(_.getInt(3)).sorted }
    gather(spark, storeDir, schema, byChunk)
  }

  /** Equality probe through the BUCKET index: decode only chunks whose
    * bucket set contains the probe's bucket, then exact-filter. `value`
    * is in the zone-key domain (raw string, or the long domain — micros
    * / epoch days / unscaled decimal — for long-backed columns), the
    * SAME domain the index build hashed, and the exact filter
    * reconstructs the typed literal from that domain (a plain
    * string-cast would NULL out timestamps/dates/decimals and silently
    * return zero rows).
    */
  def bucketProbe(spark: SparkSession, storeDir: String, schema: StructType,
                  colName: String, value: String, nBuckets: Int = 1 << 14): DataFrame = {
    val bk = MetaIndex.flatOf(schema)(colName).dataType match {
      case StringType => bucketOfBytes(value.getBytes(java.nio.charset.StandardCharsets.UTF_8), nBuckets)
      case DoubleType | FloatType =>
        throw new IllegalArgumentException("bucket index does not cover floating-point columns")
      case _ => bucketOfLong(value.toLong, nBuckets)
    }
    val bp = bucketPath(storeDir, colName)
    val chunks = graft.encode.RelCache.parquet(spark, bp)(spark.read.parquet(bp))
      .filter(col("bucket") === bk) // pushed → row-group skip
      .select("shard", "partId", "chunkId").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val blocks = StoreLayout.readBlocksByKeys(spark, storeDir, chunks, TableCodec.encodedNames(schema))
    TableCodec.decode(blocks, schema).filter(MetaIndex.exactEq(schema, colName, value))
  }

  /** Decode the given chunks and emit only the given positions.
    * Operates on the FLAT (encoded) schema — struct columns are
    * gathered as dotted leaves and reassembled at the end.
    */
  def gather(spark: SparkSession, storeDir: String, schema: StructType,
             posByChunk: Map[(Int, Int, Long), Array[Int]]): DataFrame = {
    val flat = MetaIndex.flatOf(schema)
    val names = flat.fieldNames
    val dts = flat.fields.map(_.dataType)
    val blocks = StoreLayout.readBlocksByKeys(spark, storeDir, posByChunk.keys.toSeq, names.toSeq)
    val bc = spark.sparkContext.broadcast(posByChunk)
    val rdd = blocks.rdd.mapPartitions { it =>
      // reused mutable row — safe: createDataFrame's scan copies per row
      val row = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(dts.toIndexedSeq)
      it.flatMap { b =>
        bc.value.get((b.shard, b.partId, b.chunkId)) match {
          case Some(positions) => TableCodec.rowsOfBlock(b, names, dts, withShard = false, positions = positions, reuseRow = row)
          case None => Iterator.empty
        }
      }
    }
    val df = InternalRowShim.createDataFrame(spark, rdd, flat)
    if (flat eq schema) df else graft.encode.Nested.reassemble(df, schema)
  }

  /** Persist running row offsets per chunk — a tiny metadata table
    * (shard, partId, chunkId, nRows, startOff) beside the manifest, so
    * positional reads never collect the full chunk listing to the
    * driver (at 100 TB that listing is ~3M rows). Built lazily on first
    * slice, dropped by CoW mutations (Lineage.dropDerived).
    *
    * The running sum is DISTRIBUTED: per-shard totals (one tiny agg,
    * O(nShards) rows to the driver) prefix-summed into per-shard bases,
    * then a shard-partitioned window adds the within-shard prefix — no
    * single task ever sees more than one shard's chunk rows (an
    * unpartitioned global window at 100 TB / 32 MiB chunks would be
    * one ~3M-row task).
    */
  def refreshOffsets(spark: SparkSession, storeDir: String): Unit = {
    val meta = graft.encode.Snapshots.storeDf(spark, storeDir)
      .select("shard", "partId", "chunkId", "nRows")
    val totals = meta.groupBy("shard")
      .agg(sum(col("nRows").cast("long")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = totals.map { case (s, t) => val b = acc; acc += t; (s, b) }
    val baseDf = spark.createDataFrame(bases.toSeq).toDF("shard", "shardBase")
    val w = Window.partitionBy("shard").orderBy("partId", "chunkId")
      .rowsBetween(Window.unboundedPreceding, -1)
    meta
      .withColumn("inShard", coalesce(sum(col("nRows").cast("long")).over(w), lit(0L)))
      .join(broadcast(baseDf), Seq("shard"))
      .withColumn("startOff", col("shardBase") + col("inShard"))
      .select("shard", "partId", "chunkId", "nRows", "startOff")
      .write.mode("overwrite").parquet(offsetsPath(storeDir))
    graft.encode.QueryCache.invalidate(offsetsPath(storeDir))
  }

  /** Chunks overlapping global row range [start, start+count) in
    * (shard, partId, chunkId) order — O(overlap) rows collected, via a
    * pushed range filter on the offsets table.
    */
  def overlapChunks(spark: SparkSession, storeDir: String,
                    start: Long, count: Long): Array[(Int, Int, Long, Int, Long)] = {
    if (!exists(spark, offsetsPath(storeDir))) refreshOffsets(spark, storeDir)
    val op = offsetsPath(storeDir)
    graft.encode.RelCache.parquet(spark, op)(spark.read.parquet(op))
      .filter(col("startOff") < start + count && col("startOff") + col("nRows") > start)
      .select("shard", "partId", "chunkId", "nRows", "startOff")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
  }

  /** Positional slice / take over the store (the reference's
    * `__getitem__`/take/head/tail row addressing): global row positions
    * in (shard, partId, chunkId) order — the store's input order. Only
    * chunks overlapping [start, start+count) reach the driver (offsets
    * table) or the decoder (pushed chunk keys + positional gather).
    */
  def slice(spark: SparkSession, storeDir: String, schema: StructType,
            start: Long, count: Long): DataFrame = {
    StoreLayout.requireNoBatch(graft.encode.Snapshots.storeDf(spark, storeDir).schema, "slice")
    val posByChunk = overlapChunks(spark, storeDir, start, count).map {
      case (shard, partId, chunkId, n, off) =>
        val lo = math.max(start, off)
        val hi = math.min(start + count, off + n)
        (shard, partId, chunkId) -> Array.range((lo - off).toInt, (hi - off).toInt)
    }.toMap
    gather(spark, storeDir, schema, posByChunk)
  }

  /** Resume token of a keyset-paginated sorted read: the LAST emitted
    * index entry ((key in its zone-domain string form) + the physical
    * tie-break). Opaque to callers; serialize as its fields.
    */
  final case class SortCursor(key: String, shard: Int, partId: Int, chunkId: Long, pos: Int)

  /** Keyset-paginated sorted read — the SCALABLE deep-window path
    * (sortedSlice's offset+limit plan re-sorts the prefix every call
    * and caps at Int offsets; a cursor probe reads O(log) index row
    * groups no matter how deep the page is, reference iter_sorted
    * streaming, ctable.py:11812). Emits the next k index-order rows
    * STRICTLY AFTER `after` (None = from the start) plus the cursor to
    * continue from, or None when exhausted. Rows inside the page are
    * NOT ordered (gather emits in chunk order) — callers re-sort the
    * k-row page, exactly as with sortedTopK.
    */
  def sortedPage(spark: SparkSession, storeDir: String, schema: StructType,
                 colName: String, after: Option[SortCursor], k: Int,
                 ascending: Boolean = true): (DataFrame, Option[SortCursor]) = {
    require(k > 0, s"page size $k")
    val idx = fullIndexDf(spark, storeDir, colName)
    val keyLit: String => org.apache.spark.sql.Column = MetaIndex.flatOf(schema)(colName).dataType match {
      case StringType => v => lit(v)
      case DoubleType | FloatType => v => lit(v.toDouble)
      case _ => v => lit(v.toLong)
    }
    val resumed = after match {
      case None => idx
      case Some(c) =>
        // the loose key bound is PUSHABLE (row-group stats skip whole
        // index regions); the exact strictly-after tuple compare
        // refines the survivors post-scan
        val loose = if (ascending) col("key") >= keyLit(c.key) else col("key") <= keyLit(c.key)
        val keyAdvances = if (ascending) col("key") > keyLit(c.key) else col("key") < keyLit(c.key)
        val tieBreak = col("key") === keyLit(c.key) &&
          struct(col("shard"), col("partId"), col("chunkId"), col("pos")) >
            struct(lit(c.shard), lit(c.partId), lit(c.chunkId), lit(c.pos))
        idx.filter(loose && (keyAdvances || tieBreak))
    }
    val ordered = if (ascending)
      resumed.orderBy(col("key"), col("shard"), col("partId"), col("chunkId"), col("pos"))
    else resumed.orderBy(col("key").desc, col("shard"), col("partId"), col("chunkId"), col("pos"))
    val win = ordered.limit(k).collect()
    if (win.isEmpty) return (gather(spark, storeDir, schema, Map.empty), None)
    val last = win.last
    val keyStr = MetaIndex.flatOf(schema)(colName).dataType match {
      case StringType => last.getString(0)
      case DoubleType | FloatType => last.getDouble(0).toString
      case _ => last.getLong(0).toString
    }
    val next = SortCursor(keyStr, last.getInt(1), last.getInt(2), last.getLong(3), last.getInt(4))
    val byChunk = win.groupBy(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
      .map { case (kk, rs) => kk -> rs.map(_.getInt(4)).sorted }
    (gather(spark, storeDir, schema, byChunk), if (win.length < k) None else Some(next))
  }

  /** Index-ordered top-k (the reference serves sort_by from a FULL
    * index, ctable.py:11812): order the NARROW (key, chunk, pos) index
    * rows — TakeOrderedAndProject on 30-byte rows, not wide ones — then
    * gather exactly k rows from the store.
    */
  def sortedTopK(spark: SparkSession, storeDir: String, schema: StructType,
                 colName: String, k: Int, ascending: Boolean = true): DataFrame =
    sortedSlice(spark, storeDir, schema, colName, 0L, k, ascending)

  /** Arbitrary window [offset, offset+k) of the index order (the
    * reference's sorted_slice window read, ctable.py:11840-11960):
    * offset+limit run on the NARROW index rows (Spark's offset/limit
    * pushes into the sort — no wide row is ever ordered), then exactly
    * k rows are gathered from the store.
    */
  def sortedSlice(spark: SparkSession, storeDir: String, schema: StructType,
                  colName: String, offset: Long, k: Int, ascending: Boolean = true): DataFrame = {
    require(offset >= 0 && k >= 0, s"bad window [$offset, ${offset + k})")
    val idx = fullIndexDf(spark, storeDir, colName)
    if (k == 0) return gather(spark, storeDir, schema, Map.empty)
    if (ascending && idx.columns.contains("rank")) {
      // rank-materialized index: the window is a PUSHED rank-range read
      // — row-group stats skip everything outside [offset, offset+k),
      // so a deep window reads O(window) index bytes at ANY depth (no
      // sort, no Int offset bound). Descending windows keep the sort
      // plan below (rank reversal would flip the tie-break order and
      // the oracle's row selection under ties); deep descending reads
      // page with the keyset cursor (sortedPage ascending=false).
      val win = idx.filter(col("rank") >= offset && col("rank") < offset + k)
        .select("shard", "partId", "chunkId", "pos").collect()
      val byChunk = win.groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .map { case (kk, rs) => kk -> rs.map(_.getInt(3)).sorted }
      return gather(spark, storeDir, schema, byChunk)
    }
    // Dataset.offset is Int-typed; a silent .toInt wrap would read the
    // wrong window. Deep windows (offset ~ rows at 100 TB) should page
    // through the FULL index with a key cursor instead of an offset.
    require(offset <= Int.MaxValue.toLong - k,
      s"sorted window offset $offset exceeds the offset+limit plan's Int range — " +
        "page with the keyset cursor (sortedPage) for deep windows")
    val ordered = if (ascending)
      idx.orderBy(col("key"), col("shard"), col("partId"), col("chunkId"), col("pos"))
    else idx.orderBy(col("key").desc, col("shard"), col("partId"), col("chunkId"), col("pos"))
    val win = ordered.offset(offset.toInt).limit(k)
      .select("shard", "partId", "chunkId", "pos").collect()
    val byChunk = win.groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .map { case (kk, rs) => kk -> rs.map(_.getInt(3)).sorted }
    gather(spark, storeDir, schema, byChunk)
  }
}

/** Cost-model query planner over the encoded store — the analog of the
  * reference's `plan_query` (python-blosc2 indexing.py:6956) with its
  * measured gather-vs-scan constants (ctable_indexing.py:238-242), plus
  * conjunctive multi-column planning (the reference's cross-column
  * index refinement, ctable_indexing.py:1514-1567).
  *
  * Paths, cheapest metadata first:
  *  - FULL-index gather: decode cost ∝ chunks the index names, plus a
  *    broadcast of the matching positions — wins when selective.
  *  - zone scan: decode cost ∝ chunks whose [min,max] intersects.
  *  - full scan: everything (zone keys unbounded / no index).
  *
  * For AND-of-predicates, zone candidate sets are intersected across
  * columns FIRST (metadata-only), then one FULL index (if present)
  * refines the surviving chunks to exact positions.
  */
object Planner {

  /** Above this many matching rows the gather's position broadcast and
    * row-at-a-time assembly lose to a streaming chunk scan (measured:
    * decode ~1.6 GB/s vs ~8M gathered rows/s/core on this container).
    */
  val MAX_GATHER_ROWS = 200000L

  /** A gather must touch meaningfully fewer chunks than the zone scan
    * to pay for its index probe (reference keeps the same shaped
    * constant, ctable_indexing.py:238-242).
    */
  val GATHER_CHUNK_ADVANTAGE = 0.75

  final case class Choice(path: String, estRows: Long, idxChunks: Long, zoneChunks: Long, totalChunks: Long)

  final case class Pred(colName: String, lo: String, hi: String)

  def plan(spark: SparkSession, storeDir: String, schema: StructType,
           colName: String, lo: String, hi: String): Choice = {
    val (zoneCand, total) = MetaIndex.pruningStats(spark, storeDir, colName, lo, hi)
    if (!IndexStore.hasFull(spark, storeDir, colName))
      return Choice("zone-scan", -1L, -1L, zoneCand, total)
    val idx = IndexStore.readFullRange(spark, storeDir, schema, colName, lo, hi)
      .groupBy("shard", "partId", "chunkId").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("chunks"), sum("n").as("rows")).head()
    val idxChunks = idx.getLong(0)
    val idxRows = if (idx.isNullAt(1)) 0L else idx.getLong(1)
    if (idxRows <= MAX_GATHER_ROWS && idxChunks <= (zoneCand * GATHER_CHUNK_ADVANTAGE).toLong + 1)
      Choice("index-gather", idxRows, idxChunks, zoneCand, total)
    else Choice("zone-scan", idxRows, idxChunks, zoneCand, total)
  }

  /** Execute a range query through the chosen path. Unlike calling
    * `plan` then `rangeGather`, this probes the FULL index ONCE: the
    * hit positions are collected (bounded by MAX_GATHER_ROWS+1) and
    * reused for both the cost decision and the gather — a planned probe
    * is 3 Spark jobs total (zone stats, index probe, gather), not 5.
    */
  def query(spark: SparkSession, storeDir: String, schema: StructType,
            colName: String, lo: String, hi: String): (DataFrame, Choice) = {
    val (zoneCand, total) = MetaIndex.pruningStats(spark, storeDir, colName, lo, hi)
    if (!IndexStore.hasFull(spark, storeDir, colName))
      return (MetaIndex.lookup(spark, storeDir, schema, colName, lo, hi),
        Choice("zone-scan", -1L, -1L, zoneCand, total))
    val hits = IndexStore.readFullRange(spark, storeDir, schema, colName, lo, hi)
      .select("shard", "partId", "chunkId", "pos")
      .limit(MAX_GATHER_ROWS.toInt + 1).collect()
    val overflow = hits.length > MAX_GATHER_ROWS
    val byChunk: Map[(Int, Int, Long), Array[Int]] =
      if (overflow) Map.empty
      else hits.groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .map { case (k, rs) => k -> rs.map(_.getInt(3)).sorted }
    val idxChunks = if (overflow) -1L else byChunk.size.toLong
    if (!overflow && idxChunks <= (zoneCand * GATHER_CHUNK_ADVANTAGE).toLong + 1)
      (IndexStore.gather(spark, storeDir, schema, byChunk),
        Choice("index-gather", hits.length.toLong, idxChunks, zoneCand, total))
    else
      (MetaIndex.lookup(spark, storeDir, schema, colName, lo, hi),
        Choice("zone-scan", if (overflow) -1L else hits.length.toLong, idxChunks, zoneCand, total))
  }

  /** Metadata-only intersection of zone candidate sets across the
    * predicates' columns (each set is a narrow chunk-key frame; the
    * joins never touch a payload leaf).
    */
  def candidatesAnd(spark: SparkSession, storeDir: String, preds: Seq[Pred]): DataFrame =
    MetaIndex.candidateKeysAnd(spark, storeDir, preds.map(p => (p.colName, p.lo, p.hi)))

  /** Plan an AND-of-range-predicates query: intersected zone chunk
    * count plus, per predicate, the single-column candidate count —
    * the evidence that cross-column intersection prunes harder than
    * any one column (asserted in IndexSpec).
    */
  def planAnd(spark: SparkSession, storeDir: String, preds: Seq[Pred]): (Long, Seq[Long]) = {
    val single = preds.map(p =>
      MetaIndex.candidateKeys(spark, storeDir, p.colName, p.lo, p.hi).count())
    (candidatesAnd(spark, storeDir, preds).count(), single)
  }

  /** Execute an AND-of-range-predicates query over the encoded store:
    * intersect zone candidates across columns, refine with one FULL
    * index when present (index rows restricted to surviving chunks →
    * positional gather), and exact-filter every predicate on the
    * decoded rows. Falls back to a candidate-chunk scan when the
    * refinement names too many rows for a gather.
    */
  def queryAnd(spark: SparkSession, storeDir: String, schema: StructType,
               preds: Seq[Pred]): DataFrame = {
    require(preds.nonEmpty, "queryAnd needs at least one predicate")
    val exactAll = preds.map(p => MetaIndex.exactRange(schema, p.colName, p.lo, p.hi)).reduce(_ && _)
    val cand = candidatesAnd(spark, storeDir, preds)
    val keys = cand.limit(MetaIndex.MAX_PUSHDOWN_KEYS + 1).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val pushable = keys.length <= MetaIndex.MAX_PUSHDOWN_KEYS

    val indexed = preds.find(p => IndexStore.hasFull(spark, storeDir, p.colName))
    indexed match {
      case Some(ip) if pushable =>
        val keySet = keys.toSet
        // bound the gather with ONE limited collect (not count + collect)
        val hits = IndexStore.readFullRange(spark, storeDir, schema, ip.colName, ip.lo, ip.hi)
          .select("shard", "partId", "chunkId", "pos")
          .filter(r => keySet.contains((r.getInt(0), r.getInt(1), r.getLong(2))))
          .limit(MAX_GATHER_ROWS.toInt + 1).collect()
        if (hits.length <= MAX_GATHER_ROWS) {
          val byChunk = hits
            .groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
            .map { case (k, rs) => k -> rs.map(_.getInt(3)).sorted }
          IndexStore.gather(spark, storeDir, schema, byChunk).filter(exactAll)
        } else
          TableCodec.decode(
            StoreLayout.readBlocksByKeys(spark, storeDir, keys.toSeq, TableCodec.encodedNames(schema)),
            schema).filter(exactAll)
      case _ =>
        val blocks =
          if (pushable)
            StoreLayout.readBlocksByKeys(spark, storeDir, keys.toSeq, TableCodec.encodedNames(schema))
          else {
            val df = graft.encode.Snapshots.storeDf(spark, storeDir)
            StoreLayout.assemble(
              df.join(cand, Seq("shard", "partId", "chunkId"), "left_semi"),
              TableCodec.encodedNames(schema).map(StoreLayout.fieldName))
          }
        TableCodec.decode(blocks, schema).filter(exactAll)
    }
  }
}
