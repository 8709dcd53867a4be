package graft.encode

import graft.lineage.Lineage
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zone-map query path over the encoded store: prune chunks by their
  * per-column min/max metadata BEFORE touching any payload, then decode
  * only surviving chunks and apply the exact predicate.
  *
  * This is the Spark-native analog of the reference's SUMMARY segment
  * indexes (python-blosc2 indexing.py:44-57) and its candidate-chunk
  * pruning (`_prune_chunks`, lazyexpr.py:1737-1744).
  *
  * Scale design: the prune pass reads the store parquet under an
  * EXPLICIT metadata-only schema — the `cols` struct is declared with
  * just (name, dt, minKey, maxKey), so the parquet reader never maps
  * the multi-MB `payload` (or `sha`) pages at all; a selective point
  * query over 100 TB reads O(chunks) tiny metadata rows. Survivor
  * chunks are then fetched with a pushable key predicate (shard is a
  * partition dir → directory pruning; partId/chunkId hit row-group
  * stats), and only those payloads are decoded.
  *
  * Zone-key semantics (must match ColBuilder): string keys compare in
  * UTF-8 byte order (Spark string compare is UTF8String binary order);
  * numeric/temporal keys compare numerically in their recorded integer
  * domain (micros for timestamps, days for dates, unscaled for long
  * decimals); an empty minKey/maxKey means unbounded.
  */
object MetaIndex {

  /** How many surviving chunk keys we are willing to push down as an
    * OR-of-ANDs scan predicate. Above this the query is not selective,
    * and the honest plan is a full scan + semi-join.
    */
  val MAX_PUSHDOWN_KEYS = 1024

  /** Schema for the metadata-only pass: note NO payload, NO sha. */
  private val metaReadSchema = StructType(Seq(
    StructField("shard", IntegerType),
    StructField("partId", IntegerType),
    StructField("chunkId", LongType),
    StructField("nRows", IntegerType),
    StructField("cols", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("dt", StringType),
      StructField("minKey", StringType),
      StructField("maxKey", StringType)))))))

  /** One row per (chunk, column) with zone bounds — payloads are never
    * in the scan's ReadSchema (asserted in MetaIndexSpec).
    */
  def zoneMeta(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.schema(metaReadSchema).parquet(storeDir)
      .select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        explode(col("cols")).as("c"))
      .select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        col("c.name").as("name"), col("c.dt").as("dt"),
        col("c.minKey").as("minKey"), col("c.maxKey").as("maxKey"))

  /** Column types whose zone keys compare numerically. */
  private val numericDts = Seq(
    "bigint", "int", "smallint", "tinyint", "boolean",
    "double", "float", "date", "timestamp", "timestamp_ntz")

  /** zone [minKey,maxKey] intersects [lo,hi]? (Catalyst expression over
    * the zoneMeta columns; dt-aware compare.)
    */
  def intersectsExpr(lo: String, hi: String): Column = {
    val unbounded = col("minKey") === "" && col("maxKey") === ""
    val isNum = col("dt").isin(numericDts: _*) || col("dt").startsWith("decimal")
    val minD = when(col("minKey") === "", lit(Double.NegativeInfinity)).otherwise(col("minKey").cast("double"))
    val maxD = when(col("maxKey") === "", lit(Double.PositiveInfinity)).otherwise(col("maxKey").cast("double"))
    val numHit = !(maxD < lit(lo).cast("double") || minD > lit(hi).cast("double"))
    val strHit = (col("maxKey") === "" || col("maxKey") >= lit(lo)) &&
      (col("minKey") === "" || col("minKey") <= lit(hi))
    unbounded || when(isNum, numHit).otherwise(strHit)
  }

  /** Chunk keys whose zone on `colName` intersects [lo, hi] — a
    * metadata-only query.
    */
  def candidateKeys(spark: SparkSession, storeDir: String, colName: String,
                    lo: String, hi: String): DataFrame =
    zoneMeta(spark, storeDir)
      .filter(col("name") === colName && intersectsExpr(lo, hi))
      .select("shard", "partId", "chunkId")

  /** Read only the surviving blocks. Few survivors → OR-of-ANDs pushed
    * into the parquet scan (shard prunes partition dirs, partId/chunkId
    * prune row groups, so pruned payload pages are never read);
    * many survivors → left-semi join (the query reads most of the store
    * anyway).
    */
  def readCandidates(spark: SparkSession, storeDir: String, colName: String,
                     lo: String, hi: String): Dataset[EncodedBlock] = {
    implicit val enc: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
    val keys = candidateKeys(spark, storeDir, colName, lo, hi)
    val collected = keys.limit(MAX_PUSHDOWN_KEYS + 1).collect()
    if (collected.length <= MAX_PUSHDOWN_KEYS)
      readBlocksByKeys(spark, storeDir,
        collected.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq)
    else
      spark.read.parquet(storeDir)
        .join(keys, Seq("shard", "partId", "chunkId"), "left_semi")
        .select("shard", "partId", "chunkId", "nRows", "cols").as[EncodedBlock]
  }

  /** Read exactly these chunks, with the key predicate pushed into the
    * parquet scan (shard → partition-dir pruning when the store is
    * partitioned; partId/chunkId → row-group stats).
    */
  def readBlocksByKeys(spark: SparkSession, storeDir: String,
                       keys: Seq[(Int, Int, Long)]): Dataset[EncodedBlock] = {
    implicit val enc: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
    val full = spark.read.parquet(storeDir)
    val filtered =
      if (keys.isEmpty) full.filter(lit(false))
      else full.filter(keys.map { case (s, p, c) =>
        col("shard") === s && col("partId") === p && col("chunkId") === c
      }.reduce(_ || _))
    filtered.select("shard", "partId", "chunkId", "nRows", "cols").as[EncodedBlock]
  }

  /** Point/range lookup over the encoded store: metadata prune → fetch
    * survivors (pushed keys) → decode → exact filter. `lo`/`hi` are in
    * the zone-key domain of the column (values for long/string columns,
    * micros for timestamps, days for dates).
    */
  def lookup(spark: SparkSession, storeDir: String, schema: StructType,
             colName: String, lo: String, hi: String): DataFrame = {
    val dt = schema(colName).dataType
    val exact = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType =>
        col(colName) >= lit(lo).cast(dt) && col(colName) <= lit(hi).cast(dt)
      case StringType =>
        col(colName) >= lit(lo) && col(colName) <= lit(hi)
      case TimestampType => // lo/hi are micros
        col(colName) >= timestamp_micros(lit(lo.toLong)) && col(colName) <= timestamp_micros(lit(hi.toLong))
      case DateType => // lo/hi are epoch days
        col(colName) >= date_from_unix_date(lit(lo.toInt)) && col(colName) <= date_from_unix_date(lit(hi.toInt))
      case t => throw new IllegalArgumentException(s"lookup on $t")
    }
    TableCodec.decode(readCandidates(spark, storeDir, colName, lo, hi), schema).filter(exact)
  }

  /** Pruning stats for a predicate: (candidate chunks, total chunks) —
    * computed entirely from metadata.
    */
  def pruningStats(spark: SparkSession, storeDir: String, colName: String,
                   lo: String, hi: String): (Long, Long) = {
    val meta = zoneMeta(spark, storeDir).filter(col("name") === colName).cache()
    try {
      val total = meta.count()
      val cand = meta.filter(intersectsExpr(lo, hi)).count()
      (cand, total)
    } finally meta.unpersist()
  }

  /** In-memory variant retained for Dataset-level pipelines (tests,
    * ad-hoc): prunes on the already-deserialized metadata. For stores
    * on disk prefer the storeDir API above, which never reads payloads.
    */
  def candidateBlocks(blocks: Dataset[EncodedBlock], colName: String,
                      lo: String, hi: String): Dataset[EncodedBlock] = {
    implicit val enc: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
    blocks.filter { b =>
      b.cols.find(_.name == colName).forall { c =>
        val numeric = numericDts.contains(c.dt) || c.dt.startsWith("decimal")
        if (c.minKey.isEmpty && c.maxKey.isEmpty) true
        else if (numeric) {
          val minV = if (c.minKey.isEmpty) Double.NegativeInfinity else c.minKey.toDouble
          val maxV = if (c.maxKey.isEmpty) Double.PositiveInfinity else c.maxKey.toDouble
          !(maxV < lo.toDouble || minV > hi.toDouble)
        } else {
          import java.nio.charset.StandardCharsets.UTF_8
          def cmp(a: String, b: String) = java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))
          (c.maxKey.isEmpty || cmp(c.maxKey, lo) >= 0) && (c.minKey.isEmpty || cmp(c.minKey, hi) <= 0)
        }
      }
    }
  }

  /** Convenience: build a store for `df` at `storeDir` (idempotent via
    * the lineage manifest) keyed by `idCols`.
    */
  def buildStore(spark: SparkSession, df: DataFrame, storeDir: String,
                 idCols: Seq[String], nShards: Int = 8, chunkRows: Int = 4096): Unit = {
    Lineage.encodeResumable(spark, df, storeDir, idCols,
      nShards = nShards, nBatches = 1, chunkRows = chunkRows)
    ()
  }
}
