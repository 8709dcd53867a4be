package graft.encode

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decode-free aggregate pushdown over the encoded store.
  *
  * COUNT comes from chunk metadata alone (the manifest's per-chunk
  * `nRows`); MIN/MAX come from the zone bounds of every chunk whose
  * bounds are defined, with a single-column decode fallback for the
  * rare UNBOUNDED chunks (`""` bounds: NaN-bearing double chunks,
  * string keys over the zone-key length cap, all-null chunks). The
  * common case reads O(chunks) tiny metadata rows and ZERO payload
  * bytes (spec-asserted byte-level) — the same trick parquet's
  * aggregate pushdown plays with footer statistics, and the aggregate
  * analog of the reference's SUMMARY segment accumulators
  * (python-blosc2 indexing.py:44-57, column summary min/max built at
  * write time). At 100 TB this serves `min/max/count` without mapping
  * a single payload page.
  *
  * Zone-key exactness (why the bounds can be RETURNED, not just used
  * to prune): ColBuilder writes keys with `Long.toString` /
  * `Double.toString` (lossless round-trips) and drops — never
  * truncates — over-long string keys, so a non-empty bound IS the
  * exact column min/max of that chunk's non-null values.
  */
object MetaAgg {

  /** Exact row count from chunk metadata (one store row per chunk). */
  def count(spark: SparkSession, storeDir: String): Long = {
    val df = Snapshots.storeDf(spark, storeDir)
    val n = df.agg(sum(col("nRows"))).head()
    if (n.isNullAt(0)) 0L else n.getLong(0)
  }

  /** Exact COUNT(col) — non-null count — from chunk metadata alone
    * (per-chunk `nNulls` is recorded for every builder type, so this
    * never decodes and never falls back).
    */
  def countNonNull(spark: SparkSession, storeDir: String, colName: String): Long = {
    val meta = MetaIndex.summaryMetaFor(spark, storeDir, colName)
    val n = meta.agg(sum(col("nRows").cast("bigint") - col("nNulls"))).head()
    if (n.isNullAt(0)) 0L else n.getLong(0)
  }

  /** Exact SUM(col) for an integral-domain column, served from the
    * per-chunk `sumKey` accumulators: zero payload bytes unless a chunk
    * recorded an undefined sum (its running Long overflowed), in which
    * case ONLY those chunks' one column is decoded and folded in.
    * Narrow decimals sum in their unscaled domain (the zone domain —
    * rescale with the column's scale). None = no non-null values.
    * Float/double are rejected: a float sum is order-dependent, so no
    * stored partial could be served as THE exact answer — decode
    * instead. Throws if the exact total exceeds Long range.
    */
  def sumLong(spark: SparkSession, storeDir: String, schema: StructType,
              colName: String): Option[Long] = {
    val dt = MetaIndex.flatOf(schema)(colName).dataType
    val scale = dt match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType => 0
      case d: DecimalType if d.precision <= 18 => d.scale
      case other => throw new IllegalArgumentException(
        s"sumLong: $colName is $other — exact sum pushdown is integral-domain only")
    }
    val meta = MetaIndex.summaryMetaFor(spark, storeDir, colName)
    val fallbackE = col("sumKey") === "" && col("nNulls") < col("nRows")
    val agg = meta.agg(
      sum(when(col("sumKey") =!= "", col("sumKey").cast(DecimalType(38, 0)))).as("s"),
      sum(col("nRows").cast("bigint") - col("nNulls")).as("nn"),
      sum(when(fallbackE, 1L).otherwise(0L)).as("nfb")).head()
    val nonNull = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    if (nonNull == 0L) return None
    var total: BigInt =
      if (agg.isNullAt(0)) BigInt(0)
      else BigInt(agg.getDecimal(0).toBigIntegerExact) // sum of decimal(38,0) — no fraction
    if (agg.getLong(2) > 0L) {
      val decoded = decodeOneColumn(spark, storeDir, schema, colName, meta.filter(fallbackE))
      val v = dt match {
        case BooleanType => when(col(colName), 1L).otherwise(0L).cast(DecimalType(38, 0))
        case d: DecimalType => col(colName).cast(DecimalType(38, d.scale))
        case _ => col(colName).cast(DecimalType(38, 0))
      }
      val r = decoded.agg(sum(v)).head()
      // fold in the decoded partial in the UNSCALED (zone) domain —
      // setScale(scale) pins the representation so unscaledValue is the
      // exact integer sumKey would have recorded
      if (!r.isNullAt(0)) total += BigInt(r.getDecimal(0).setScale(scale).unscaledValue())
    }
    if (!total.isValidLong) throw new ArithmeticException(
      s"sumLong($colName) = $total exceeds Long range")
    Some(total.toLong)
  }

  /** Decode-free group-by COUNT over a low-cardinality column: chunks
    * with a LIVE value histogram (sum of counts == non-null rows — a
    * dead histogram cannot masquerade) are served from metadata;
    * dead-histogram chunks decode ONLY this column and group exactly.
    * Returns (value: string, cnt: long) with one null-value row for the
    * SQL null group; string values are identity, integral-domain values
    * are their decimal string (booleans "0"/"1").
    *
    * At 100 TB a `GROUP BY lang` reads O(chunks) histogram entries and
    * zero payload pages — the reference's SUMMARY-accumulator idea
    * (python-blosc2 indexing.py:44-57) applied to aggregation.
    */
  def groupCount(spark: SparkSession, storeDir: String, schema: StructType,
                 colName: String): DataFrame = {
    val dt = MetaIndex.flatOf(schema)(colName).dataType
    dt match {
      case StringType | ByteType | ShortType | IntegerType | LongType | BooleanType => ()
      case other => throw new IllegalArgumentException(
        s"groupCount: $colName is $other — histogram group-by covers string/integral/boolean")
    }
    val meta = MetaIndex.summaryMetaFor(spark, storeDir, colName)
    val aliveE = expr("aggregate(map_values(hist), CAST(0 AS BIGINT), (a, x) -> a + x)") ===
      (col("nRows").cast("bigint") - col("nNulls"))
    val alivePart = meta.filter(aliveE)
      .select(explode(col("hist")).as(Seq("value", "cnt")))
    val totals = meta.agg(
      sum(col("nNulls").cast("bigint")).as("nulls"),
      sum(when(aliveE, 0L).otherwise(1L)).as("ndead")).head()
    val nullsTotal = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val nDead = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    val parts = Seq.newBuilder[DataFrame]
    parts += alivePart
    if (nDead > 0L) {
      val decoded = decodeOneColumn(spark, storeDir, schema, colName, meta.filter(!aliveE))
      val domain = dt match {
        case BooleanType => when(col(colName), "1").otherwise("0")
        case StringType => col(colName)
        case _ => col(colName).cast("string")
      }
      parts += decoded.filter(col(colName).isNotNull)
        .select(domain.as("value"), lit(1L).as("cnt"))
    }
    if (nullsTotal > 0L) {
      import spark.implicits._
      parts += Seq((null: String, nullsTotal)).toDF("value", "cnt")
    }
    parts.result().reduce(_ union _)
      .groupBy("value").agg(sum("cnt").as("cnt"))
  }

  /** Decode ONLY the chunks named by `keys` (shard, partId, chunkId
    * rows), reading just `colName`'s column — pushed chunk keys when
    * few, semi-join when many (the MetaIndex.readCandidates pattern).
    */
  private def decodeOneColumn(spark: SparkSession, storeDir: String, schema: StructType,
                              colName: String, keysDf: DataFrame): DataFrame = {
    val keyRows = keysDf.select("shard", "partId", "chunkId")
    val keys = keyRows.limit(MetaIndex.MAX_PUSHDOWN_KEYS + 1).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val blocks =
      if (keys.length <= MetaIndex.MAX_PUSHDOWN_KEYS)
        StoreLayout.readBlocksByKeys(spark, storeDir, keys.toSeq, Seq(colName))
      else StoreLayout.assemble(
        Snapshots.storeDf(spark, storeDir)
          .join(keyRows, Seq("shard", "partId", "chunkId"), "left_semi"),
        Seq(StoreLayout.fieldName(colName)))
    TableCodec.decode(blocks, StructType(Seq(MetaIndex.flatOf(schema)(colName))))
  }

  /** (min, max) of `colName` over the store, None for an empty/all-null
    * column. Values are in the column's real type (long-backed
    * integrals as Long, float/double as Double, strings as String,
    * timestamps/dates/decimals in their integer zone domain — the same
    * domain MetaIndex predicates use).
    */
  def minMax(spark: SparkSession, storeDir: String, schema: StructType,
             colName: String): (Option[Any], Option[Any]) = {
    val dt = MetaIndex.flatOf(schema)(colName).dataType
    dt match {
      case StringType | FloatType | DoubleType | BooleanType | ByteType | ShortType |
           IntegerType | LongType | DateType | TimestampType | TimestampNTZType => ()
      case d: DecimalType if d.precision <= 18 => ()
      case other => throw new IllegalArgumentException(
        s"minMax: $colName is $other — zone keys of this type are not orderable scalars")
    }
    val meta = MetaIndex.zoneMetaFor(spark, storeDir, colName)

    // distributed min/max over the BOUNDED chunks' exact zone keys
    val (minCol, maxCol) = dt match {
      case StringType =>
        (min(when(col("minKey") =!= "", col("minKey"))),
          max(when(col("maxKey") =!= "", col("maxKey"))))
      case FloatType | DoubleType =>
        (min(when(col("minKey") =!= "", col("minKey").cast("double"))),
          max(when(col("maxKey") =!= "", col("maxKey").cast("double"))))
      case _ => // integral / boolean / date / timestamp / narrow decimal: long domain
        (min(when(col("minKey") =!= "", col("minKey").cast("bigint"))),
          max(when(col("maxKey") =!= "", col("maxKey").cast("bigint"))))
    }
    val agg = meta.agg(minCol.as("mn"), maxCol.as("mx"),
      sum(when(col("minKey") === "" || col("maxKey") === "", 1L).otherwise(0L)).as("unbounded")
    ).head()
    val boundedMin = if (agg.isNullAt(0)) None else Some(agg.get(0))
    val boundedMax = if (agg.isNullAt(1)) None else Some(agg.get(1))
    val nUnbounded = if (agg.isNullAt(2)) 0L else agg.getLong(2)
    if (nUnbounded == 0L) return (boundedMin, boundedMax)

    // fallback: decode ONLY the unbounded chunks' ONE column and fold
    // their exact min/max in (pushed chunk keys when few, semi-join
    // when many — the MetaIndex.readCandidates pattern)
    val unboundedKeys = meta.filter(col("minKey") === "" || col("maxKey") === "")
      .select("shard", "partId", "chunkId")
    val keys = unboundedKeys.limit(MetaIndex.MAX_PUSHDOWN_KEYS + 1).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val blocks =
      if (keys.length <= MetaIndex.MAX_PUSHDOWN_KEYS)
        StoreLayout.readBlocksByKeys(spark, storeDir, keys.toSeq, Seq(colName))
      else StoreLayout.assemble(
        Snapshots.storeDf(spark, storeDir)
          .join(unboundedKeys, Seq("shard", "partId", "chunkId"), "left_semi"),
        Seq(StoreLayout.fieldName(colName)))
    val one = StructType(Seq(MetaIndex.flatOf(schema)(colName)))
    // NaN is excluded like NULL (zone semantics: a NaN-bearing chunk is
    // unbounded, and its finite values still count) — NOTE this differs
    // from Spark/DuckDB column max, which order NaN greatest
    val v0 = col(colName)
    val v = dt match {
      case FloatType | DoubleType => when(!isnan(v0), v0)
      case _ => v0
    }
    val decodedRow = TableCodec.decode(blocks, one)
      .agg(min(v).as("mn"), max(v).as("mx")).head()
    // decoded values arrive in the real column type; bring the integer-
    // domain types back to the zone domain so both sources combine
    def toDomain(v: Any): Any = v match {
      case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
      case l: java.time.LocalDateTime => // TimestampNTZ → micros
        l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: java.time.LocalDate => d.toEpochDay
      case d: java.math.BigDecimal => d.unscaledValue().longValueExact() // narrow decimal → unscaled
      case d: scala.math.BigDecimal => d.underlying().unscaledValue().longValueExact()
      case b: Boolean => if (b) 1L else 0L
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case f: Float => f.toDouble
      case other => other
    }
    val decodedMin = if (decodedRow.isNullAt(0)) None else Some(toDomain(decodedRow.get(0)))
    val decodedMax = if (decodedRow.isNullAt(1)) None else Some(toDomain(decodedRow.get(1)))

    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long) => x < y
      case (x: Double, y: Double) => x < y
      case (x: String, y: String) =>
        // UTF-8 BINARY order — the zone-key / Spark / DuckDB collation.
        // String.compareTo is UTF-16 code-unit order, which disagrees
        // for supplementary-plane characters (U+FFFD vs an emoji).
        java.util.Arrays.compareUnsigned(
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      case _ => throw new IllegalStateException(s"incomparable zone values $a / $b")
    }
    val mn = (boundedMin.toSeq ++ decodedMin.toSeq).reduceOption((a, b) => if (lt(a, b)) a else b)
    val mx = (boundedMax.toSeq ++ decodedMax.toSeq).reduceOption((a, b) => if (lt(a, b)) b else a)
    (mn, mx)
  }
}
