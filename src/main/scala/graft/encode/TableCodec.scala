package graft.encode

import graft.codecs._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** DataFrame <-> Dataset[EncodedBlock]: the chunked per-column encode /
  * decode pipeline expressed as shuffle-free `mapPartitions` /
  * `flatMap` transforms.
  *
  * Each Spark partition is cut into chunks of at most CHUNK_ROWS rows or
  * CHUNK_BYTES raw bytes (mirroring the reference's chunk geometry:
  * 2^24-byte default chunks, python-blosc2 `schunk.py:400-411`); each
  * column slice gets its own auto-selected codec plan (Selector).
  *
  * The encode hot path consumes Catalyst InternalRows
  * (`queryExecution.toRdd`) — string bytes come straight out of the
  * UnsafeRow buffer (UTF8String.getBytes) with no char-set decode and
  * no external Row materialization, the same access level Spark's own
  * physical operators use.
  *
  * Scale notes: encode/decode/verify are embarrassingly parallel — no
  * shuffle, no driver traffic; state is O(chunk). At 1000 executors on
  * 100 TB the plan is a single mapPartitions stage over the scan.
  */
object TableCodec {

  val CHUNK_ROWS: Int = 1 << 16 // 64Ki rows
  val CHUNK_BYTES: Long = 1L << 24 // 16 MiB raw

  /** Zone-map keys longer than this are dropped (minKey "" = -inf,
    * maxKey "" = +inf) — truncating a max bound would be incorrect, and
    * nobody range-prunes on multi-KB content values.
    */
  val ZONE_KEY_MAX = 64

  private implicit val blockEnc: org.apache.spark.sql.Encoder[EncodedBlock] = Encoders.product[EncodedBlock]
  private implicit val verifyEnc: org.apache.spark.sql.Encoder[ChunkVerify] = Encoders.product[ChunkVerify]

  // ---------------------------------------------------------------- encode

  /** Encode every column of df. `shardCol` (if set) names an int column
    * carrying the lineage shard id; it is consumed, not encoded.
    */
  def encode(
      df: DataFrame,
      chunkRows: Int = CHUNK_ROWS,
      chunkBytes: Long = CHUNK_BYTES,
      shardCol: Option[String] = None
  ): Dataset[EncodedBlock] = {
    val spark = df.sparkSession
    val schema = df.schema
    val shardIdx = shardCol.map(schema.fieldIndex)
    val dataFields = schema.fields.zipWithIndex.filter { case (_, i) => !shardIdx.contains(i) }
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      encodePartition(rows, dataFields, shardIdx, chunkRows, chunkBytes)
    }
    spark.createDataset(rdd)
  }

  private def encodePartition(
      rows: Iterator[InternalRow],
      fields: Array[(StructField, Int)],
      shardIdx: Option[Int],
      chunkRows: Int,
      chunkBytes: Long
  ): Iterator[EncodedBlock] = {
    val partId = TaskContext.getPartitionId()
    val builders = fields.map { case (f, _) => ColBuilder(f.dataType) }
    val fieldIdx = fields.map(_._2)
    val shardAt = shardIdx.getOrElse(-1)
    var chunkId = 0L
    var curShard = 0
    var nRows = 0
    var rawBytes = 0L

    def flush(): Option[EncodedBlock] = {
      if (nRows == 0) None
      else {
        val cols = fields.indices.map { i =>
          val (f, _) = fields(i)
          val vec = builders(i).result()
          val plan = Selector.choose(vec)
          val payload = ChunkCodec.encode(vec, plan)
          EncodedCol(
            name = f.name,
            dt = f.dataType.catalogString,
            plan = plan.label,
            nBytes = builders(i).rawBytes,
            cBytes = payload.length.toLong,
            minKey = builders(i).minKey,
            maxKey = builders(i).maxKey,
            sha = ColBuilder.digestOf(vec),
            payload = payload
          )
        }
        val block = EncodedBlock(curShard, partId, chunkId, nRows, cols)
        chunkId += 1
        nRows = 0
        rawBytes = 0L
        builders.foreach(_.clear())
        Some(block)
      }
    }

    new Iterator[EncodedBlock] {
      private var pending: Option[EncodedBlock] = None
      private var done = false

      override def hasNext: Boolean = {
        if (pending.nonEmpty) return true
        if (done) return false
        while (rows.hasNext && pending.isEmpty) {
          val row = rows.next()
          val shard = if (shardAt >= 0) row.getInt(shardAt) else 0
          if (nRows > 0 && shard != curShard) pending = flush()
          curShard = shard
          var i = 0
          while (i < fieldIdx.length) {
            rawBytes += builders(i).add(row, fieldIdx(i))
            i += 1
          }
          nRows += 1
          if (pending.isEmpty && (nRows >= chunkRows || rawBytes >= chunkBytes)) pending = flush()
        }
        if (pending.isEmpty && !rows.hasNext) { pending = flush(); done = true }
        pending.nonEmpty
      }

      override def next(): EncodedBlock = {
        if (!hasNext) throw new NoSuchElementException
        val b = pending.get
        pending = None
        b
      }
    }
  }

  // ---------------------------------------------------------------- decode

  /** Inverse of encode: rebuild the original rows (column order = the
    * order recorded in the blocks). Shuffle-free flatMap. When
    * `shardColName` is set, the block's lineage shard id is surfaced as
    * an extra int column (used by copy-on-write delete).
    */
  def decode(blocks: Dataset[EncodedBlock], schema: StructType,
             shardColName: Option[String] = None): DataFrame = {
    val names = schema.fieldNames
    val outSchema = shardColName match {
      case Some(s) => StructType(schema.fields :+ StructField(s, IntegerType, nullable = false))
      case None => schema
    }
    val extra = shardColName.size
    blocks.flatMap { block =>
      val byName = block.cols.map(c => c.name -> c).toMap
      val vecs = names.map(n => decodeColumn(byName(n)))
      val out = new Array[Row](block.nRows)
      var r = 0
      while (r < block.nRows) {
        val vals = new Array[Any](names.length + extra)
        var c = 0
        while (c < names.length) { vals(c) = vecValue(vecs(c), r, schema.fields(c).dataType); c += 1 }
        if (extra == 1) vals(names.length) = block.shard
        out(r) = Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        r += 1
      }
      out.iterator
    }(Encoders.row(outSchema))
  }

  def decodeColumn(col: EncodedCol): ColVec = ChunkCodec.decode(col.payload)

  private def vecValue(vec: ColVec, i: Int, dt: DataType): Any = {
    if (!vec.isValid(i)) return null
    (vec, dt) match {
      case (v: LongVec, LongType) => v.values(i)
      case (v: LongVec, IntegerType) => v.values(i).toInt
      case (v: DoubleVec, DoubleType) => v.values(i)
      case (v: BinVec, StringType) => new String(v.values(i), UTF_8)
      case (v: BinVec, BinaryType) => v.values(i)
      case (v, t) => throw new IllegalArgumentException(s"decode ${v.getClass.getSimpleName} as $t")
    }
  }

  // ---------------------------------------------------------------- verify

  /** Re-decode every block and compare each column's recomputed digest
    * with the digest captured at encode time — the sha256 roundtrip
    * invariant, per chunk, without storing per-row hashes.
    */
  def verify(blocks: Dataset[EncodedBlock]): Dataset[ChunkVerify] = {
    blocks.flatMap { block =>
      block.cols.map { col =>
        val vec = ChunkCodec.decode(col.payload)
        val sha = ColBuilder.digestOf(vec)
        ChunkVerify(block.shard, block.partId, block.chunkId, col.name,
          block.nRows, java.util.Arrays.equals(sha, col.sha) && vec.n == block.nRows)
      }
    }
  }
}

/** Per-column accumulation during encode: values + running stats
  * (min/max zone map, logical byte size). Unboxed growable arrays — no
  * per-value boxing on the hot path. The stats mirror the reference's
  * per-chunk summary accumulator (python-blosc2 `ctable.py:3812`).
  */
sealed trait ColBuilder {
  def add(row: InternalRow, idx: Int): Long // returns raw bytes added
  def result(): ColVec
  def clear(): Unit
  def rawBytes: Long
  def minKey: String
  def maxKey: String
}

object ColBuilder {

  def apply(dt: DataType): ColBuilder = dt match {
    case LongType => new LongBuilder(isInt = false)
    case IntegerType => new LongBuilder(isInt = true)
    case DoubleType => new DoubleBuilder
    case StringType | BinaryType => new BinBuilder(string = dt == StringType)
    case t => throw new IllegalArgumentException(s"unsupported column type $t")
  }

  /** Digest of a decoded vector — must match the encode-side digest. */
  def digestOf(vec: ColVec): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    val buf8 = new Array[Byte](8)
    vec match {
      case v: LongVec =>
        var i = 0
        while (i < v.n) {
          if (!v.isValid(i)) md.update(0: Byte)
          else { md.update(1: Byte); putLong(buf8, v.values(i)); md.update(buf8) }
          i += 1
        }
      case v: DoubleVec =>
        var i = 0
        while (i < v.n) {
          if (!v.isValid(i)) md.update(0: Byte)
          else { md.update(1: Byte); putLong(buf8, java.lang.Double.doubleToRawLongBits(v.values(i))); md.update(buf8) }
          i += 1
        }
      case v: BinVec =>
        var i = 0
        while (i < v.n) {
          if (!v.isValid(i)) md.update(0: Byte)
          else {
            md.update(1: Byte)
            putLong(buf8, v.values(i).length.toLong)
            md.update(buf8)
            md.update(v.values(i))
          }
          i += 1
        }
    }
    md.digest()
  }

  @inline private def putLong(buf: Array[Byte], v: Long): Unit = {
    var i = 0
    while (i < 8) { buf(i) = (v >>> (8 * i)).toByte; i += 1 }
  }

  private final class LongBuilder(isInt: Boolean) extends ColBuilder {
    private var values = new Array[Long](1024)
    private var n = 0
    private var validity: Array[Boolean] = null
    private var mn = Long.MaxValue
    private var mx = Long.MinValue

    @inline private def ensure(): Unit = {
      if (n == values.length) {
        values = java.util.Arrays.copyOf(values, n * 2)
        if (validity != null) validity = java.util.Arrays.copyOf(validity, n * 2)
      }
    }

    def add(row: InternalRow, idx: Int): Long = {
      ensure()
      if (row.isNullAt(idx)) {
        if (validity == null) { validity = new Array[Boolean](values.length); java.util.Arrays.fill(validity, 0, n, true) }
        validity(n) = false
        values(n) = 0L
      } else {
        val v = if (isInt) row.getInt(idx).toLong else row.getLong(idx)
        if (validity != null) validity(n) = true
        if (v < mn) mn = v
        if (v > mx) mx = v
        values(n) = v
      }
      n += 1
      8L
    }
    def result(): ColVec =
      LongVec(java.util.Arrays.copyOf(values, n),
        if (validity == null) null else java.util.Arrays.copyOf(validity, n))
    def clear(): Unit = { n = 0; validity = null; mn = Long.MaxValue; mx = Long.MinValue }
    def rawBytes: Long = n * 8L
    def minKey: String = if (mn == Long.MaxValue) "" else mn.toString
    def maxKey: String = if (mx == Long.MinValue) "" else mx.toString
  }

  private final class DoubleBuilder extends ColBuilder {
    private var values = new Array[Double](1024)
    private var n = 0
    private var validity: Array[Boolean] = null
    private var mn = Double.PositiveInfinity
    private var mx = Double.NegativeInfinity

    @inline private def ensure(): Unit = {
      if (n == values.length) {
        values = java.util.Arrays.copyOf(values, n * 2)
        if (validity != null) validity = java.util.Arrays.copyOf(validity, n * 2)
      }
    }

    def add(row: InternalRow, idx: Int): Long = {
      ensure()
      if (row.isNullAt(idx)) {
        if (validity == null) { validity = new Array[Boolean](values.length); java.util.Arrays.fill(validity, 0, n, true) }
        validity(n) = false
        values(n) = 0.0
      } else {
        val v = row.getDouble(idx)
        if (validity != null) validity(n) = true
        if (v < mn) mn = v
        if (v > mx) mx = v
        values(n) = v
      }
      n += 1
      8L
    }
    def result(): ColVec =
      DoubleVec(java.util.Arrays.copyOf(values, n),
        if (validity == null) null else java.util.Arrays.copyOf(validity, n))
    def clear(): Unit = { n = 0; validity = null; mn = Double.PositiveInfinity; mx = Double.NegativeInfinity }
    def rawBytes: Long = n * 8L
    def minKey: String = if (mn.isPosInfinity) "" else mn.toString
    def maxKey: String = if (mx.isNegInfinity) "" else mx.toString
  }

  private final class BinBuilder(string: Boolean) extends ColBuilder {
    private var values = new Array[Array[Byte]](1024)
    private var n = 0
    private var hasNull = false
    private var bytes = 0L
    private var mn: Array[Byte] = null
    private var mx: Array[Byte] = null
    private var zoneDead = false // some value exceeded ZONE_KEY_MAX

    @inline private def ensure(): Unit = {
      if (n == values.length) values = java.util.Arrays.copyOf(values, n * 2)
    }

    /** unsigned lexicographic byte compare (== UTF-8 code point order) */
    @inline private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      java.util.Arrays.compareUnsigned(a, b)
    }

    def add(row: InternalRow, idx: Int): Long = {
      ensure()
      if (row.isNullAt(idx)) {
        hasNull = true
        values(n) = null
        n += 1
        1L
      } else {
        val v = if (string) row.getUTF8String(idx).getBytes else row.getBinary(idx)
        values(n) = v
        n += 1
        bytes += v.length
        if (v.length > TableCodec.ZONE_KEY_MAX) zoneDead = true
        else if (!zoneDead) {
          if (mn == null || cmp(v, mn) < 0) mn = v
          if (mx == null || cmp(v, mx) > 0) mx = v
        }
        v.length.toLong
      }
    }
    def result(): ColVec = {
      val vals = java.util.Arrays.copyOf(values, n)
      val validity = if (!hasNull) null else {
        val a = new Array[Boolean](n)
        var i = 0
        while (i < n) { a(i) = vals(i) != null; i += 1 }
        a
      }
      BinVec(vals, validity)
    }
    def clear(): Unit = { n = 0; hasNull = false; bytes = 0L; mn = null; mx = null; zoneDead = false }
    def rawBytes: Long = bytes
    def minKey: String = if (zoneDead || mn == null) "" else new String(mn, UTF_8)
    def maxKey: String = if (zoneDead || mx == null) "" else new String(mx, UTF_8)
  }
}
