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

  test("WavPcm decodes a known-answer 16-bit clip exactly; rejects malformed payloads") {
    import graft.ops.MultiModal.WavPcm
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5, -5, 0)
    val bytes = WavPcm.encode16(samples, 16000)
    val a = WavPcm.decode(bytes).getOrElse(fail("known-good wav did not parse"))
    assert(a.channels == 1 && a.sampleRate == 16000 && a.bitsPerSample == 16)
    assert(a.samples.toSeq == samples.map(_.toLong).toSeq)
    val f = WavPcm.features(a)
    // hand-computed: crossings at 1000→-1000, -1000→32767, 32767→-32768,
    // -32768→5, 5→-5 (zeros never cross)
    assert(f.zeroCrossings == 5L)
    assert(f.nSamples == 8L && f.sumSamples == samples.map(_.toLong).sum)
    assert(f.sumSq == samples.map(s => s.toLong * s).sum)

    // 8-bit unsigned: values centered to signed
    val wav8 = {
      val data = Array[Byte](128.toByte, 255.toByte, 0, 129.toByte)
      val b = java.nio.ByteBuffer.allocate(44 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + 4).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(8000)
        .putInt(8000).putShort(1).putShort(8)
      b.put("data".getBytes).putInt(4).put(data)
      b.array()
    }
    assert(WavPcm.decode(wav8).get.samples.toSeq == Seq(0L, 127L, -128L, 1L))

    // malformed payloads fail soft, never throw
    assert(WavPcm.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(WavPcm.decode("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(7)).isEmpty)
    assert(WavPcm.decode(bytes.take(30)).isEmpty) // truncated mid-header
  }

  test("featurize wires the REAL wav decode: audio features only on wav items") {
    val feats = MultiModal.featurize(media, "media_id", "media")
    val wav = feats.filter(col("mediaType") === "wav")
    assert(wav.count() > 0)
    assert(wav.filter(col("audioRms").isNull).count() == 0,
      "every synthetic wav is a real clip and must decode")
    assert(feats.filter(col("mediaType") =!= "wav")
      .filter(col("audioRms").isNotNull).count() == 0)
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

  // ------------------------------------------------- real PNG decode

  import graft.ops.Png
  import java.awt.image.BufferedImage

  /** deterministic raster; ImageIO is the INDEPENDENT encoder side */
  private def testImage(w: Int, h: Int, imgType: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 7) % 256; val g = (x * 13 + y * 17) % 256; val b = (x * 3 + y * 23) % 256
      // varied (but never fully transparent) alpha for ARGB rasters
      val a = if (img.getColorModel.hasAlpha) 55 + (x * 5 + y * 11) % 200 else 0xff
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    img
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bo))
    bo.toByteArray
  }

  test("Png decodes ImageIO output pixel-exactly across color types") {
    // sizes chosen to exercise ImageIO's per-row filter heuristics
    // (Sub/Up/Average/Paeth all appear on gradients at these widths)
    for ((imgType, name) <- Seq(
        BufferedImage.TYPE_INT_RGB -> "rgb",
        BufferedImage.TYPE_INT_ARGB -> "rgba",
        BufferedImage.TYPE_BYTE_GRAY -> "gray",
        BufferedImage.TYPE_BYTE_INDEXED -> "palette")) {
      val src = testImage(57, 31, imgType)
      val dec = Png.decode(pngBytes(src)).getOrElse(fail(s"$name png did not parse"))
      assert(dec.width == 57 && dec.height == 31, name)
      val raster = src.getRaster
      for (y <- 0 until 31; x <- 0 until 57) {
        val base = (y * dec.width + x) * dec.channels
        if (dec.channels <= 2) {
          // gray: PNG stores RAW raster samples (getRGB would apply a
          // gray→sRGB colorspace conversion, which is NOT in the file)
          assert((dec.pixels(base) & 0xff) == raster.getSample(x, y, 0), s"$name ($x,$y)")
        } else {
          val argb = src.getRGB(x, y) // what ImageIO itself says the pixel is
          val (r, g, b, a) = dec.channels match {
            case 3 => (dec.pixels(base) & 0xff, dec.pixels(base + 1) & 0xff,
              dec.pixels(base + 2) & 0xff, 255)
            case _ => (dec.pixels(base) & 0xff, dec.pixels(base + 1) & 0xff,
              dec.pixels(base + 2) & 0xff, dec.pixels(base + 3) & 0xff)
          }
          assert(((a << 24) | (r << 16) | (g << 8) | b) == argb, s"$name ($x,$y)")
        }
      }
    }
  }

  test("Png fails soft on dirty bytes, never throws") {
    val good = pngBytes(testImage(16, 16, BufferedImage.TYPE_INT_RGB))
    assert(Png.decode(good).isDefined)
    assert(Png.decode(null).isEmpty)
    assert(Png.decode(Array.emptyByteArray).isEmpty)
    assert(Png.decode(good.take(60)).isEmpty) // truncated mid-chunk
    val flipped = good.clone()
    flipped(flipped.length / 2) = (flipped(flipped.length / 2) ^ 0x55).toByte
    assert(Png.decode(flipped).isEmpty, "CRC must catch a flipped IDAT byte")
    // magic-bytes-only blob (the old synthetic fixture shape)
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++ Array.fill[Byte](200)(9)
    assert(Png.decode(fake).isEmpty)
    // forged IHDR dimensions must be rejected, not allocated
    val forged = good.clone()
    forged(16) = 0x7f // width high byte → w*h over MAX_PIXELS
    assert(Png.decode(forged).isEmpty)

    // zlib FDICT (preset-dictionary) stream with VALID chunk CRCs: the
    // inflater makes zero progress without a dictionary — must fail
    // soft, not spin (regression: Inflater.needsDictionary loop hang)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      b.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(4).put(8.toByte).put(0.toByte) // 4x4 gray-8
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8) // FDICT bit set
    val hostile = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", fdict) ++ chunk("IEND", Array.emptyByteArray)
    assert(Png.decode(hostile).isEmpty, "FDICT stream must fail soft, not hang")
  }

  test("featurize wires the REAL png decode: dimensions + grid-luma embedding") {
    val feats = MultiModal.featurize(media, "media_id", "media")
    val png = feats.filter(col("mediaType") === "png")
    assert(png.count() > 0)
    assert(png.filter(col("imgWidth").isNull).count() == 0,
      "every synthetic png is a real image and must decode")
    // jpeg items ALSO decode now ([[Jpeg]]); audio/other kinds never do
    assert(feats.filter(col("mediaType") =!= "png" && col("mediaType") =!= "jpeg")
      .filter(col("imgWidth").isNotNull).count() == 0)
    // grid-luma embeddings are unit-scaled, 16-dim
    val e = png.select(col("embedding")).head().getSeq[Float](0)
    assert(e.length == 16 && e.forall(v => v >= 0f && v <= 1f))
  }
}
