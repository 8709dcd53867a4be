package graft.encode

import graft.lineage.Lineage
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
  * Scale design: with the v2 store layout (StoreLayout — one parquet
  * struct column per table column) the prune pass selects ONLY the
  * zone-metadata leaves (`g_<col>.minKey` etc.), so the parquet reader
  * never maps any payload page of ANY column; a selective point query
  * over 100 TB reads O(chunks) tiny metadata rows. Survivor chunks are
  * then fetched with a pushable key predicate (shard is a partition
  * dir → directory pruning; partId/chunkId hit row-group stats), and
  * only those payloads are decoded.
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

  /** One row per (chunk, column) with zone bounds — payload/sha leaves
    * are never in the scan's ReadSchema (asserted in MetaIndexSpec).
    */
  def zoneMeta(spark: SparkSession, storeDir: String): DataFrame = {
    val df = Snapshots.storeDf(spark, storeDir)
    val fields = StoreLayout.storeColFields(df.schema)
    df.select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        explode(array(fields.map(f => struct(
          col(s"$f.name").as("name"), col(s"$f.dt").as("dt"),
          col(s"$f.minKey").as("minKey"), col(s"$f.maxKey").as("maxKey"))): _*)).as("c"))
      .select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        col("c.name").as("name"), col("c.dt").as("dt"),
        col("c.minKey").as("minKey"), col("c.maxKey").as("maxKey"))
  }

  /** Zone metadata of ONE column — the common prune pass: four tiny
    * leaf columns of one struct in the scan, nothing else.
    */
  def zoneMetaFor(spark: SparkSession, storeDir: String, colName: String): DataFrame = {
    val f = StoreLayout.fieldName(colName)
    Snapshots.storeDf(spark, storeDir)
      .select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        col(s"$f.name").as("name"), col(s"$f.dt").as("dt"),
        col(s"$f.minKey").as("minKey"), col(s"$f.maxKey").as("maxKey"))
  }

  /** zoneMetaFor plus the per-chunk summary leaves (null count, exact
    * sum, bounded value histogram) — MetaAgg's scan. Still metadata
    * only: payload/sha never enter the ReadSchema.
    */
  def summaryMetaFor(spark: SparkSession, storeDir: String, colName: String): DataFrame = {
    val f = StoreLayout.fieldName(colName)
    Snapshots.storeDf(spark, storeDir)
      .select(col("shard"), col("partId"), col("chunkId"), col("nRows"),
        col(s"$f.name").as("name"), col(s"$f.dt").as("dt"),
        col(s"$f.minKey").as("minKey"), col(s"$f.maxKey").as("maxKey"),
        col(s"$f.nNulls").as("nNulls"), col(s"$f.sumKey").as("sumKey"),
        col(s"$f.hist").as("hist"))
  }

  /** Column types whose zone keys compare numerically. */
  private val numericDts = Seq(
    "bigint", "int", "smallint", "tinyint", "boolean",
    "double", "float", "date", "timestamp", "timestamp_ntz")

  /** zone [minKey,maxKey] intersects [lo,hi]? (Catalyst expression over
    * the zoneMeta columns; dt-aware compare.) Long keys are compared as
    * doubles: rounding is monotonic, so drift can only ADMIT extra
    * chunks near 2^53 boundaries (the exact post-decode filter removes
    * them), never wrongly prune.
    */
  def intersectsExpr(lo: String, hi: String): Column =
    intersectsExprOn(col("minKey"), col("maxKey"), col("dt"), lo, hi)

  /** Parameterized variant over arbitrary zone-leaf columns — lets a
    * MULTI-column candidate intersection run as one conjunctive filter
    * over a single store scan (each chunk row carries every column's
    * zone struct) instead of per-column scans joined back together.
    */
  def intersectsExprOn(minKey: Column, maxKey: Column, dt: Column,
                       lo: String, hi: String): Column = {
    val unbounded = minKey === "" && maxKey === ""
    val isNum = dt.isin(numericDts: _*) || dt.startsWith("decimal")
    val minD = when(minKey === "", lit(Double.NegativeInfinity)).otherwise(minKey.cast("double"))
    val maxD = when(maxKey === "", lit(Double.PositiveInfinity)).otherwise(maxKey.cast("double"))
    val numHit = !(maxD < lit(lo).cast("double") || minD > lit(hi).cast("double"))
    val strHit = (maxKey === "" || maxKey >= lit(lo)) &&
      (minKey === "" || minKey <= lit(hi))
    unbounded || when(isNum, numHit).otherwise(strHit)
  }

  /** One-sided variants for predicates with a single bound (x >= lo /
    * x <= hi): same dt-aware compare, the missing side unbounded.
    * Strict inequalities use the closed form — conservative (may admit
    * a boundary-only chunk; the exact filter removes it), never prunes
    * wrongly.
    */
  def intersectsLoExpr(lo: String): Column = {
    val unbounded = col("minKey") === "" && col("maxKey") === ""
    val isNum = col("dt").isin(numericDts: _*) || col("dt").startsWith("decimal")
    val maxD = when(col("maxKey") === "", lit(Double.PositiveInfinity)).otherwise(col("maxKey").cast("double"))
    val numHit = maxD >= lit(lo).cast("double")
    val strHit = col("maxKey") === "" || col("maxKey") >= lit(lo)
    unbounded || when(isNum, numHit).otherwise(strHit)
  }

  def intersectsHiExpr(hi: String): Column = {
    val unbounded = col("minKey") === "" && col("maxKey") === ""
    val isNum = col("dt").isin(numericDts: _*) || col("dt").startsWith("decimal")
    val minD = when(col("minKey") === "", lit(Double.NegativeInfinity)).otherwise(col("minKey").cast("double"))
    val numHit = minD <= lit(hi).cast("double")
    val strHit = col("minKey") === "" || col("minKey") <= lit(hi)
    unbounded || when(isNum, numHit).otherwise(strHit)
  }

  /** Chunk keys whose zone on `colName` intersects [lo, hi] — a
    * metadata-only query.
    */
  def candidateKeys(spark: SparkSession, storeDir: String, colName: String,
                    lo: String, hi: String): DataFrame =
    zoneMetaFor(spark, storeDir, colName)
      .filter(intersectsExpr(lo, hi))
      .select("shard", "partId", "chunkId")

  /** Chunk keys whose zones intersect EVERY (colName, lo, hi)
    * predicate — the multi-column candidate intersection as ONE scan
    * with a conjunctive filter. Row-identical to intersecting the
    * per-column [[candidateKeys]] sets (each chunk row holds all
    * columns' zone structs), but with no join and no extra scans —
    * at 100 TB this reads the chunk metadata once instead of once per
    * predicate column.
    */
  def candidateKeysAnd(spark: SparkSession, storeDir: String,
                       preds: Seq[(String, String, String)]): DataFrame = {
    val df = Snapshots.storeDf(spark, storeDir)
    val cond = preds.map { case (c, lo, hi) =>
      val f = StoreLayout.fieldName(c)
      intersectsExprOn(col(s"$f.minKey"), col(s"$f.maxKey"), col(s"$f.dt"), lo, hi)
    }.reduce(_ && _)
    df.filter(cond).select("shard", "partId", "chunkId")
  }

  /** Read only the surviving blocks. Few survivors → OR-of-ANDs pushed
    * into the parquet scan (shard prunes partition dirs, partId/chunkId
    * prune row groups, so pruned payload pages are never read);
    * many survivors → left-semi join (the query reads most of the store
    * anyway). `names` restricts the columns read (null = all).
    */
  def readCandidates(spark: SparkSession, storeDir: String, colName: String,
                     lo: String, hi: String, names: Seq[String] = null): Dataset[EncodedBlock] = {
    // repeated probes with the same predicate skip the metadata scan:
    // candidate coordinates come from the store-version-keyed LRU
    // (QueryCache — the reference's result-coordinate cache analog)
    val ck = QueryCache.key(spark, storeDir, "zone", colName, lo, hi)
    val coords = QueryCache.getOrCompute(ck) {
      val collected = candidateKeys(spark, storeDir, colName, lo, hi)
        .limit(MAX_PUSHDOWN_KEYS + 1).collect()
      if (collected.length <= MAX_PUSHDOWN_KEYS)
        collected.map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      else null // too many survivors to push or cache — semi-join path
    }
    if (coords != null)
      StoreLayout.readBlocksByKeys(spark, storeDir, coords.toSeq, names)
    else {
      val keys = candidateKeys(spark, storeDir, colName, lo, hi)
      val df = Snapshots.storeDf(spark, storeDir)
      val fields = Option(names).map(_.map(StoreLayout.fieldName))
        .getOrElse(StoreLayout.storeColFields(df.schema))
      StoreLayout.assemble(
        df.join(keys, Seq("shard", "partId", "chunkId"), "left_semi"), fields)
    }
  }

  /** Read exactly these chunks, with the key predicate pushed into the
    * parquet scan. Kept as the historical entry point; delegates to
    * StoreLayout.
    */
  def readBlocksByKeys(spark: SparkSession, storeDir: String,
                       keys: Seq[(Int, Int, Long)], names: Seq[String] = null): Dataset[EncodedBlock] =
    StoreLayout.readBlocksByKeys(spark, storeDir, keys, names)

  /** Exact range predicate on the ORIGINAL column for bounds given in
    * the zone-key domain (values for long/string columns, micros for
    * timestamps, days for dates, unscaled for decimals).
    */
  /** The encoded (flat) view of `schema`: struct columns become dotted
    * leaves — the namespace predicates, indexes, and store reads
    * actually address.
    */
  def flatOf(schema: StructType): StructType =
    if (Nested.hasNested(schema)) Nested.flatSchema(schema) else schema

  def exactRange(schema: StructType, colName: String, lo: String, hi: String): Column = {
    def bound(v: String): Column = domainLit(flatOf(schema)(colName).dataType, v)
    col(colName) >= bound(lo) && col(colName) <= bound(hi)
  }

  /** Exact equality predicate in the same zone-key domain. */
  def exactEq(schema: StructType, colName: String, value: String): Column =
    col(colName) === domainLit(flatOf(schema)(colName).dataType, value)

  /** A literal of `dt` from its zone-key-domain string form. */
  def domainLit(dt: DataType, v: String): Column = dt match {
    case StringType => lit(v)
    case LongType | IntegerType | ShortType | ByteType => lit(v.toLong).cast(dt)
    case DoubleType | FloatType => lit(v.toDouble).cast(dt)
    case BooleanType => lit(v.toLong != 0L)
    case TimestampType | TimestampNTZType => timestamp_micros(lit(v.toLong)).cast(dt)
    case DateType => date_from_unix_date(lit(v.toInt))
    case d: DecimalType => // v is the unscaled integer
      lit(new java.math.BigDecimal(new java.math.BigInteger(v), d.scale)).cast(d)
    case t => throw new IllegalArgumentException(s"range/eq probe on $t")
  }

  /** Point/range lookup over the encoded store: metadata prune → fetch
    * survivors (pushed keys) → decode → exact filter. `lo`/`hi` are in
    * the zone-key domain of the column.
    */
  def lookup(spark: SparkSession, storeDir: String, schema: StructType,
             colName: String, lo: String, hi: String): DataFrame =
    TableCodec.decode(
      readCandidates(spark, storeDir, colName, lo, hi, TableCodec.encodedNames(schema)), schema)
      .filter(exactRange(schema, colName, lo, hi))

  /** Pruning stats for a predicate: (candidate chunks, total chunks) —
    * computed entirely from metadata.
    */
  def pruningStats(spark: SparkSession, storeDir: String, colName: String,
                   lo: String, hi: String): (Long, Long) = {
    // both counts in ONE aggregate job — a planner probe should not pay
    // two driver round-trips for one metadata scan
    val row = zoneMetaFor(spark, storeDir, colName)
      .agg(count(lit(1)).as("total"),
        coalesce(sum(intersectsExpr(lo, hi).cast("long")), lit(0L)).as("cand"))
      .head()
    (row.getLong(1), row.getLong(0))
  }

  /** In-memory variant retained for Dataset-level pipelines (tests,
    * ad-hoc): prunes on the already-deserialized metadata. For stores
    * on disk prefer the storeDir API above, which never reads payloads.
    */
  def candidateBlocks(blocks: Dataset[EncodedBlock], colName: String,
                      lo: String, hi: String): Dataset[EncodedBlock] = {
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
