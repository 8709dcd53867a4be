package graft

import graft.encode.TableCodec
import graft.ops.MultiModal
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline: real Spark plumbing (schema,
  * partitioning, null handling, codec roundtrip) around a stubbed
  * decode step (no media libs in this container).
  */
class MultiModalSpec extends SparkTestBase {

  private lazy val media = MultiModal.syntheticMedia(spark, 800, 4).cache()

  test("magic-byte sniffing classifies the synthetic corpus") {
    val feats = MultiModal.featurize(media, "media_id", "media")
    val types = feats.groupBy("mediaType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("jpeg", "png", "wav", "mp3").subsetOf(types.keySet), types.toString)
    assert(types.values.sum == 800)
    // random-ish bytes → high entropy; embedding has the declared shape
    val row = feats.head()
    assert(row.getDouble(3) > 6.0)
    assert(row.getSeq[Float](4).length == 16)
  }

  test("featurize is deterministic and null-safe") {
    val a = MultiModal.featurize(media, "media_id", "media")
      .select(sum(crc32(concat_ws("_", col("mediaType"), col("sizeBytes"))))).head().getLong(0)
    val b = MultiModal.featurize(media, "media_id", "media")
      .select(sum(crc32(concat_ws("_", col("mediaType"), col("sizeBytes"))))).head().getLong(0)
    assert(a == b)
    import spark.implicits._
    val withNull = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media")
    val f = MultiModal.featurize(withNull, "media_id", "media").collect()
    assert(f.find(_.getLong(0) == 2L).get.getString(1) == "null")
  }

  test("binary media columns roundtrip bit-identically through the codec engine") {
    val blocks = TableCodec.encode(media, chunkRows = 128)
    val decoded = TableCodec.decode(blocks, media.schema)
    assert(decoded.count() == 800)
    val h = (d: org.apache.spark.sql.DataFrame) =>
      d.select(sum(crc32(sha2(col("media"), 256)))).head().getLong(0)
    assert(h(decoded) == h(media))
    // incompressible media must fall through to a sane plan, not dict
    val plans = blocks.flatMap(_.cols.filter(_.name == "media").map(_.plan))(
      org.apache.spark.sql.Encoders.STRING).distinct().collect().toSet
    assert(!plans.exists(_.startsWith("dict")), plans.toString)
  }
}
