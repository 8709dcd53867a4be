package graft.ops

import graft.corpus.Corpus.mix
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as opaque `binary` columns with typed
  * metadata, and per-item feature extraction is a shuffle-free typed
  * map over partitions.
  *
  * The actual media DECODE step is STUBBED (this container has no
  * image/audio libraries — see the builder mandate): `fakeDecode`
  * produces a deterministic feature vector from the bytes, standing in
  * for a real decoder, while everything Spark-side — binary schema,
  * partitioning, batch shape, null handling, the feature pipeline —
  * is real and tested. The binary codec path itself (BinaryType through
  * ChunkCodec) is first-class: media columns compress/roundtrip like
  * any other column.
  */
object MultiModal {

  final case class MediaFeatures(
      id: Long,
      mediaType: String, // sniffed from magic bytes
      sizeBytes: Int,
      byteEntropy: Double, // Shannon entropy of the byte histogram
      embedding: Array[Float] // STUB decode → fixed-dim feature vector
  )

  /** Magic-byte container sniffing (public file signatures). */
  def sniffType(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else if (at(0) == 'I' && at(1) == 'D' && at(2) == '3') "mp3"
    else "unknown"
  }

  /** Shannon entropy (bits/byte) of the byte histogram — a cheap,
    * real signal (compressibility / already-compressed detection).
    */
  def byteEntropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val n = bytes.length.toDouble
    var b = 0
    while (b < 256) {
      if (hist(b) > 0) { val p = hist(b) / n; h -= p * math.log(p) / math.log(2.0) }
      b += 1
    }
    h
  }

  /** STUB decoder: a deterministic pseudo-embedding from the content
    * bytes (stands in for image-decode + model inference; the real
    * thing drops in here without touching the Spark plumbing).
    */
  def fakeDecode(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var h = mix(bytes.length.toLong)
    var i = 0
    while (i < bytes.length) { h = mix(h ^ (bytes(i) & 0xffL) ^ i); if (i % 97 == 0) out(i / 97 % dim) += (h & 0xff) / 255.0f; i += 1 }
    var d = 0
    while (d < dim) { h = mix(h + d); out(d) += ((h >>> 11) % 1000) / 1000.0f; d += 1 }
    out
  }

  /** Feature extraction over a (idCol: long, mediaCol: binary) table —
    * one shuffle-free pass, batch-friendly, null-safe.
    */
  def featurize(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        if (r.isNullAt(mIdx)) MediaFeatures(id, "null", 0, 0.0, new Array[Float](16))
        else {
          val bytes = r.getAs[Array[Byte]](mIdx)
          MediaFeatures(id, sniffType(bytes), bytes.length, byteEntropy(bytes), fakeDecode(bytes))
        }
      }
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** A media-shaped deterministic fixture: synthetic binary blobs with
    * real magic bytes (so sniffing has something to find).
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long, parts: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map { id =>
      val h = mix(42L ^ id)
      val kind = (h & 3).toInt
      val len = 256 + ((h >>> 8) & 0x3ff).toInt
      val b = new Array[Byte](len)
      var x = h
      var i = 0
      while (i < len) { x = mix(x); b(i) = (x & 0xff).toByte; i += 1 }
      kind match {
        case 0 => b(0) = 0xff.toByte; b(1) = 0xd8.toByte; b(2) = 0xff.toByte
        case 1 => b(0) = 0x89.toByte; b(1) = 'P'; b(2) = 'N'; b(3) = 'G'
        case 2 =>
          b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
          b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
        case _ => b(0) = 'I'; b(1) = 'D'; b(2) = '3'
      }
      (id, b)
    }.toDF("media_id", "media")
  }
}
