package graft.encode

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Persisted layout of the encoded block store — v2: one parquet row per
  * chunk, ONE TOP-LEVEL PARQUET STRUCT COLUMN PER TABLE COLUMN.
  *
  * v1 packed all columns' payloads into a single `cols:
  * array<struct<..., payload>>` column, so parquet could not prune
  * sibling columns' payload pages: every single-column operation (dict
  * filter, index build, bucket probe) read every payload byte of the
  * store. v2 mirrors the reference's per-column containers
  * (python-blosc2 ctable.py:4108 `self._cols` — a dict of per-column
  * SChunks; one container's bytes per column) using parquet's own
  * columnar layout: each table column's chunk struct (`g_<name>`) is its
  * own set of leaf column chunks in the file, so a scan that selects
  * `g_lang` never reads a page of `g_text.payload`. Column-selective IO
  * is asserted byte-level in StoreLayoutSpec (SparkListenerTaskEnd
  * bytesRead).
  *
  * Full-width reads reassemble the in-flight `EncodedBlock` with a
  * narrow projection (`array(g_a, g_b, ...)`) — no shuffle, decode
  * stays a single mapPartitions stage.
  */
object StoreLayout {

  val KEY_COLS: Seq[String] = Seq("shard", "partId", "chunkId", "nRows")

  private val COL_STRUCT_FIELDS =
    Set("name", "dt", "plan", "nBytes", "cBytes", "minKey", "maxKey",
      "nNulls", "sumKey", "hist", "sha", "payload")

  /** Parquet field carrying column `name`'s chunks. The `g_` prefix
    * keeps user columns from colliding with the chunk-key columns.
    */
  def fieldName(colName: String): String =
    "g_" + colName.replaceAll("[^A-Za-z0-9_]", "_")

  /** Store fields that are per-column chunk structs (discovery for
    * callers that do not carry the table schema, e.g. verify/stats).
    */
  def storeColFields(schema: StructType): Seq[String] = schema.fields.collect {
    case StructField(n, st: StructType, _, _) if st.fieldNames.toSet == COL_STRUCT_FIELDS => n
  }.toSeq

  /** True if the store was written by a batch-partitioned streaming
    * sink (`batch=<id>` dirs): (shard, partId, chunkId) is then NOT
    * unique and keyed operations (indexes, gathers, slices) must refuse
    * it — see StreamingEncode.compact.
    */
  def hasBatchPartitions(schema: StructType): Boolean = schema.fieldNames.contains("batch")

  def requireNoBatch(schema: StructType, op: String): Unit =
    require(!hasBatchPartitions(schema),
      s"$op addresses chunks by (shard, partId, chunkId), which is not unique across " +
        "streaming batch= partitions — run StreamingEncode.compact first")

  /** Pivot in-flight blocks to the persisted layout. `names` must be
    * the encoded columns in block order (= the encoded DataFrame's
    * field order).
    */
  def toStoreRows(blocks: Dataset[EncodedBlock], names: Seq[String]): DataFrame = {
    val fns = names.map(fieldName)
    require(fns.distinct.size == fns.size,
      s"column names collide after parquet-field sanitization: $names")
    blocks.toDF().select(
      KEY_COLS.map(col) ++ names.zipWithIndex.map { case (n, i) =>
        col("cols").getItem(i).as(fieldName(n))
      }: _*)
  }

  /** Write blocks in the v2 layout, partitioned by lineage shard. */
  def write(blocks: Dataset[EncodedBlock], names: Seq[String], outDir: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    toStoreRows(blocks, names).write.mode(mode).partitionBy("shard").parquet(outDir)
    // an in-place (re)write must drop any cached relation/coordinates
    // of this dir — the mtime fallback cannot be trusted to tick
    QueryCache.invalidate(outDir)
  }

  /** Store rows with only `names`' struct columns in the scan schema —
    * parquet never reads sibling columns' payload pages. `names = null`
    * selects every chunk-struct column found in the store schema.
    */
  def readStoreRows(spark: SparkSession, storeDir: String, names: Seq[String] = null): DataFrame = {
    val df = Snapshots.storeDf(spark, storeDir)
    val sel = Option(names).map(_.map(fieldName)).getOrElse(storeColFields(df.schema))
    df.select(KEY_COLS.map(col) ++ sel.map(col): _*)
  }

  /** Reassemble `EncodedBlock`s from v2 store rows (narrow projection,
    * no shuffle). `fieldCols` are store field names (g_*).
    */
  def assemble(df: DataFrame, fieldCols: Seq[String]): Dataset[EncodedBlock] = {
    implicit val enc: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
    df.select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
      array(fieldCols.map(col): _*).as("cols")).as[EncodedBlock]
  }

  /** Blocks carrying only `names`' columns (column-selective IO);
    * `names = null` → all columns, `shards` → partition-dir pruning.
    */
  def readBlocks(spark: SparkSession, storeDir: String, names: Seq[String] = null,
                 shards: Option[Seq[Int]] = None): Dataset[EncodedBlock] = {
    val df = Snapshots.storeDf(spark, storeDir)
    val fields = Option(names).map(_.map(fieldName)).getOrElse(storeColFields(df.schema))
    val filtered = shards match {
      case Some(s) => df.filter(col("shard").isin(s.map(Integer.valueOf): _*))
      case None => df
    }
    assemble(filtered, fields)
  }

  /** Blocks of a PINNED snapshot version — a reader holding this
    * Dataset keeps seeing that version's files regardless of concurrent
    * CoW commits (until a vacuum reaps them). See Snapshots.
    */
  def readBlocksAt(spark: SparkSession, storeDir: String, version: Long): Dataset[EncodedBlock] = {
    val df = Snapshots.storeDfAt(spark, storeDir, version)
    assemble(df, storeColFields(df.schema))
  }

  /** Read exactly these chunks with the key predicate pushed into the
    * parquet scan (shard → partition-dir pruning, partId/chunkId →
    * row-group stats), carrying only `names`' columns.
    */
  def readBlocksByKeys(spark: SparkSession, storeDir: String, keys: Seq[(Int, Int, Long)],
                       names: Seq[String] = null): Dataset[EncodedBlock] = {
    val df = Snapshots.storeDf(spark, storeDir)
    requireNoBatch(df.schema, "readBlocksByKeys")
    val fields = Option(names).map(_.map(fieldName)).getOrElse(storeColFields(df.schema))
    val filtered =
      if (keys.isEmpty) df.filter(lit(false))
      else df.filter(keys.map { case (s, p, c) =>
        col("shard") === s && col("partId") === p && col("chunkId") === c
      }.reduce(_ || _))
    assemble(filtered, fields)
  }

  /** Decode-free physical recluster — the reference's `reorder_offsets`
    * (python-blosc2 schunk.py:1055: permute chunks WITHOUT
    * recompressing them), Spark-native: chunk ROWS are re-sorted within
    * each shard by `colName`'s zone key and rewritten as new files. No
    * payload byte is decoded or re-encoded (the codec never runs — the
    * rewrite moves opaque struct rows), and chunk identities
    * (shard, partId, chunkId) are positions-in-name only, NOT file
    * positions, so FULL/BUCKET indexes and the offsets table stay
    * VALID across the recluster. Committed as a snapshot version
    * (readers pin the old file set; vacuum reaps it).
    *
    * Why: after many appends a shard's files interleave key ranges;
    * clustering chunks by zone key packs a range probe's candidate
    * chunks into few row groups, so the pushed chunk-key predicate
    * skips more pages.
    */
  def recluster(spark: SparkSession, storeDir: String, schema: StructType, colName: String): Unit = {
    val df = Snapshots.storeDf(spark, storeDir)
    requireNoBatch(df.schema, "recluster")
    val f = fieldName(colName)
    val numeric = graft.encode.MetaIndex.flatOf(schema)(colName).dataType match {
      case org.apache.spark.sql.types.StringType => false
      case _ => true
    }
    val key = if (numeric)
      org.apache.spark.sql.functions.when(col(s"$f.minKey") === "", lit(null))
        .otherwise(col(s"$f.minKey").cast("double"))
    else col(s"$f.minKey")
    commitRewrite(spark, storeDir,
      df.repartition(col("shard")).sortWithinPartitions(col("shard"), key), "recluster")
  }

  /** Multi-column decode-free recluster: chunks re-ordered by the
    * Z-ORDER (Morton) interleaving of their zone-key bin ranks — the
    * lakehouse Z-ORDER idea (Delta `OPTIMIZE ZORDER BY`, Iceberg
    * sort-order z-order; all public) lifted to the CHUNK-METADATA
    * layer: no row is touched, no payload decoded. `recluster(col)`
    * packs one column's probe candidates into adjacent row groups but
    * scatters every other column's; Z-order gives each of 2-4 columns
    * partial locality, so multi-column box probes (Planner.queryAnd)
    * touch fewer row groups of the store file.
    *
    * Ranks come from approximate quantile bin edges over the chunk
    * zone minKeys — a metadata-only pass; the driver holds
    * O(bins × cols) doubles — so skewed key distributions still spread
    * across all bins (a linear min/max scale would collapse them).
    * Strings rank by their first-8-byte big-endian value (zero-padded,
    * so prefix order is preserved across lengths). The per-chunk bin
    * lookup + bit interleave runs as a scala closure over METADATA
    * rows (#chunks, not #rows — not a payload hot path).
    *
    * Same guarantees as [[recluster]]: chunk identities are names →
    * FULL/BUCKET indexes and offsets stay valid; snapshot-committed;
    * sha multiset unchanged (spec-asserted).
    */
  def reclusterZOrder(spark: SparkSession, storeDir: String, schema: StructType,
                      colNames: Seq[String]): Unit = {
    require(colNames.size >= 2 && colNames.size <= 4,
      s"zorder takes 2-4 columns, got ${colNames.size} (one column → recluster)")
    val df = Snapshots.storeDf(spark, storeDir)
    requireNoBatch(df.schema, "reclusterZOrder")
    // bins beyond the chunk count are empty weight in the quantile
    // sketch (65k cut points for a 200-chunk store is waste); rank
    // resolution only needs ~one bin per chunk
    val nChunks = df.count()
    val maxBits = colNames.size match { case 2 => 16; case 3 => 10; case _ => 8 }
    var bits = 1
    while (bits < maxBits && (1L << bits) < nChunks) bits += 1
    val nBins = 1 << bits

    def keyCol(c: String): org.apache.spark.sql.Column = {
      val f = fieldName(c)
      graft.encode.MetaIndex.flatOf(schema)(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          // first 8 bytes, zero-padded, as an unsigned big-endian value:
          // preserves lexicographic prefix order across value lengths
          expr(s"CAST(conv(hex(rpad(CAST($f.minKey AS BINARY), 8, x'00')), 16, 10) AS DOUBLE)")
        case _ =>
          when(col(s"$f.minKey") === "", lit(null)).otherwise(col(s"$f.minKey").cast("double"))
      }
    }

    val zkNames = colNames.indices.map(i => s"_zk$i")
    val withKeys = df.select(
      df.columns.map(col) ++ colNames.zipWithIndex.map { case (c, i) => keyCol(c).as(s"_zk$i") }: _*)
    val edges: Array[Array[Double]] = withKeys.stat.approxQuantile(
      zkNames.toArray, (1 until nBins).map(_.toDouble / nBins).toArray, 1.0 / (4 * nBins))
    val bEdges = spark.sparkContext.broadcast(edges)
    val nCols = colNames.size
    val zOf = udf { ks: Seq[java.lang.Double] =>
      var z = 0L
      var c = 0
      while (c < ks.length) {
        val e = bEdges.value(c)
        val k = ks(c)
        val bin =
          if (k == null || e.isEmpty) 0L
          else {
            // lower bound: #edges strictly < k. (Arrays.binarySearch
            // lands ANYWHERE inside a duplicate-edge run — low-card
            // keys would then straddle bin boundaries nondeterministically)
            val kv = k.doubleValue()
            var lo = 0; var hi = e.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (e(mid) < kv) lo = mid + 1 else hi = mid
            }
            lo.toLong
          }
        var b = 0
        while (b < bits) { z |= ((bin >> b) & 1L) << (b * nCols + c); b += 1 }
        c += 1
      }
      z
    }
    val sorted = withKeys
      .withColumn("_z", zOf(array(zkNames.map(col): _*)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("_z"))
      .select(df.columns.map(col): _*) // back to the exact store schema
    commitRewrite(spark, storeDir, sorted, "reclusterZOrder")
  }

  /** CoW tail shared by the recluster variants: append the re-ordered
    * rows as new files, commit them as the next snapshot version
    * (readers pin the old set; vacuum reaps it).
    */
  private def commitRewrite(spark: SparkSession, storeDir: String,
                            sorted: DataFrame, op: String): Unit = {
    val before = Snapshots.ensureListing(spark, storeDir)
    val pre = Snapshots.dataFiles(spark, storeDir).toSet
    sorted.write.mode(SaveMode.Append).partitionBy("shard").parquet(storeDir)
    val added = Snapshots.dataFiles(spark, storeDir).filterNot(pre)
    require(added.nonEmpty || before.isEmpty, s"$op of $storeDir wrote no files")
    QueryCache.invalidate(storeDir)
    Snapshots.commit(spark, storeDir, added)
    ()
  }

  /** Per-chunk (nBytes, cBytes) totals across all columns — metadata
    * leaves only, payload pages never read.
    */
  def chunkStats(spark: SparkSession, storeDir: String): DataFrame = {
    val df = Snapshots.storeDf(spark, storeDir)
    val fields = storeColFields(df.schema)
    df.select(col("shard"), col("nRows"),
      fields.map(f => col(s"$f.nBytes")).reduce(_ + _).as("nBytes"),
      fields.map(f => col(s"$f.cBytes")).reduce(_ + _).as("cBytes"))
  }

  /** One row per (chunk, column) of codec bookkeeping (name, plan,
    * sizes) — metadata-only.
    */
  def colStats(spark: SparkSession, storeDir: String): DataFrame = {
    val df = Snapshots.storeDf(spark, storeDir)
    val fields = storeColFields(df.schema)
    df.select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
      explode(array(fields.map(f => struct(
        col(s"$f.name").as("col"), col(s"$f.plan").as("plan"),
        col(s"$f.nBytes").as("nBytes"), col(s"$f.cBytes").as("cBytes"))): _*)).as("c"))
      .select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        col("c.col").as("col"), col("c.plan").as("plan"),
        col("c.nBytes").as("nBytes"), col("c.cBytes").as("cBytes"))
  }
}
