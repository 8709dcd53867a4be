package graft

import graft.ops.Jpeg

/** Baseline JPEG decoder vs the JDK's OWN independent codec
  * (javax.imageio wraps the JDK-bundled native libjpeg family — an
  * implementation graft shares no code with). Three verification
  * regimes, strongest first:
  *
  * 1. BIT-EXACT: constant 8x8 tiles + quality 1.0 (quant tables all 1)
  *    survive any conformant codec exactly — a constant tile's DCT is
  *    DC-only, the all-ones table preserves the DC, and the IDCT of a
  *    DC-only block is that constant. Decoded pixels must equal the
  *    tile formula byte-for-byte. (`media_jpeg_features` uses this
  *    regime to give DuckDB an integer-exact oracle.)
  * 2. TOLERANCE, full-detail grayscale: random pixels at quality 1.0
  *    keep every coefficient, so ours and ImageIO's decodes differ only
  *    by IDCT rounding — a couple of code values.
  * 3. TOLERANCE, subsampled color: the default-quality RGB path adds
  *    quantization + 4:2:0 chroma upsampling, where our replication
  *    upsampler legitimately differs from libjpeg's triangular filter —
  *    bounded mean error, not exactness.
  */
class JpegSpec extends SparkTestBase {

  import MediaFixtures.{writeJpeg, grayImage}

  test("constant-tile grayscale at quality 1.0 decodes BIT-EXACTLY (the oracle regime)") {
    for (id <- 0L until 12L) {
      val tw = 2 + (id % 3).toInt
      val th = 1 + (id % 2).toInt
      val w = 8 * tw; val h = 8 * th
      def tileVal(tx: Int, ty: Int): Int = ((tx * 37 + ty * 11 + id * 7) % 256).toInt
      val img = grayImage(w, h)((x, y) => tileVal(x / 8, y / 8))
      val bytes = writeJpeg(img, 1.0f)
      val dec = Jpeg.decode(bytes).getOrElse(fail(s"constant-tile jpeg $id did not parse"))
      assert(dec.width == w && dec.height == h && dec.channels == 1)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val got = dec.pixels(y * w + x) & 0xff
          val want = tileVal(x / 8, y / 8)
          assert(got == want, s"id=$id pixel ($x,$y): got $got want $want")
          x += 1
        }
        y += 1
      }
    }
  }

  test("full-detail grayscale at quality 1.0 matches ImageIO within IDCT rounding") {
    val rnd = new scala.util.Random(7)
    val w = 40; val h = 24
    val img = grayImage(w, h)((_, _) => rnd.nextInt(256))
    val bytes = writeJpeg(img, 1.0f)
    val ours = Jpeg.decode(bytes).getOrElse(fail("random gray jpeg did not parse"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    var maxDiff = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ref.getRaster.getSample(x, y, 0)
        val o = ours.pixels(y * w + x) & 0xff
        maxDiff = math.max(maxDiff, math.abs(r - o))
        x += 1
      }
      y += 1
    }
    assert(maxDiff <= 2, s"max per-pixel diff vs ImageIO = $maxDiff (IDCT rounding only)")
  }

  test("subsampled RGB at default quality: bounded error vs ImageIO (upsampler differs)") {
    val rnd = new scala.util.Random(11)
    val w = 37; val h = 21 // non-multiple-of-16: exercises edge MCUs
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // smooth gradient + mild noise (JPEG-friendly content, bounded chroma edges)
    for (y <- 0 until h; x <- 0 until w) {
      val r = math.min(255, x * 6 + rnd.nextInt(8))
      val g = math.min(255, y * 9 + rnd.nextInt(8))
      val b = math.min(255, (x + y) * 4 + rnd.nextInt(8))
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = writeJpeg(img, 0.85f)
    val ours = Jpeg.decode(bytes).getOrElse(fail("rgb jpeg did not parse"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    var sumAbs = 0L; var n = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val rc = c match { case 0 => (rgb >> 16) & 0xff; case 1 => (rgb >> 8) & 0xff; case _ => rgb & 0xff }
      val oc = ours.pixels((y * w + x) * 3 + c) & 0xff
      sumAbs += math.abs(rc - oc); n += 1
    }
    val mean = sumAbs.toDouble / n
    assert(mean <= 3.0, s"mean abs diff vs ImageIO = $mean (upsampler + rounding)")
  }

  test("restart intervals (DRI + RSTn): decodes and matches ImageIO") {
    val rnd = new scala.util.Random(3)
    val w = 64; val h = 32 // 4x2 MCUs of gray → interval 2 forces 3 RST markers
    val img = grayImage(w, h)((x, y) => math.min(255, x * 3 + y + rnd.nextInt(6)))
    val bytes = writeJpeg(img, 1.0f, restartInterval = 2)
    // the writer honored the metadata: a DRI segment and at least one RSTn
    def hasMarker(lo: Int, hi: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= lo && (p(1) & 0xff) <= hi)
    assert(hasMarker(0xdd, 0xdd), "writer did not emit DRI — test would be vacuous")
    assert(hasMarker(0xd0, 0xd7), "no RSTn markers in the scan")
    val ours = Jpeg.decode(bytes).getOrElse(fail("restart-interval jpeg did not parse"))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(ref.getRaster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xff)))
    assert(maxDiff <= 2, s"max diff with restarts = $maxDiff")
  }

  test("fail-soft: dirty bytes, truncation, progressive, and forged dims return None") {
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    // magic bytes + noise (the old stub corpus shape)
    val noise = Array.tabulate[Byte](300)(i => (i * 37 + 11).toByte)
    noise(0) = 0xff.toByte; noise(1) = 0xd8.toByte; noise(2) = 0xff.toByte
    assert(Jpeg.decode(noise).isEmpty)
    // a real jpeg truncated mid-scan must not throw
    val img = grayImage(32, 32)((x, y) => (x * y) % 256)
    val ok = writeJpeg(img, 0.9f)
    assert(Jpeg.decode(ok).isDefined)
    assert(Jpeg.decode(java.util.Arrays.copyOf(ok, ok.length / 2)).isEmpty)
    // forged SOF dimensions past MAX_PIXELS
    val forged = ok.clone()
    val sof = { // find 0xffc0
      var i = 2; var at = -1
      while (i + 1 < forged.length && at < 0) {
        if ((forged(i) & 0xff) == 0xff && (forged(i + 1) & 0xff) == 0xc0) at = i
        i += 1
      }
      at
    }
    assert(sof > 0)
    forged(sof + 5) = 0x7f.toByte; forged(sof + 6) = 0xff.toByte // height = 32767
    forged(sof + 7) = 0x7f.toByte; forged(sof + 8) = 0xff.toByte // width = 32767
    assert(Jpeg.decode(forged).isEmpty, "1 Gpx forged SOF must be rejected")
  }

  test("single-component scan is non-interleaved: declared 2x2 factors decode identically") {
    // ImageIO always writes gray as 1x1, so patch the SOF sampling byte
    // to 2x2 — per T.81 A.2.2 a one-component scan's data-unit grid is
    // ceil(w/8) x ceil(h/8) REGARDLESS of declared factors, so the
    // entropy stream is unchanged and a conformant decoder must produce
    // the same pixels. (A decoder that walks factors as an interleaved
    // MCU grid would read 4 blocks per MCU and garble everything.)
    val img = grayImage(24, 16)((x, y) => (x * 13 + y * 7) % 256)
    val base = writeJpeg(img, 1.0f)
    var sof = -1
    var i = 2
    while (i + 1 < base.length && sof < 0) {
      if ((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0) sof = i
      i += 1
    }
    assert(sof > 0, "SOF0 present")
    assert((base(sof + 9) & 0xff) == 1, "one component")
    assert((base(sof + 11) & 0xff) == 0x11, "writer used 1x1 factors")
    val patched = base.clone()
    patched(sof + 11) = 0x22.toByte
    val want = Jpeg.decode(base).getOrElse(fail("unpatched gray did not parse"))
    val got = Jpeg.decode(patched).getOrElse(fail("2x2-declared gray did not parse"))
    assert(got.width == want.width && got.height == want.height)
    assert(java.util.Arrays.equals(got.pixels, want.pixels),
      "declared sampling factors must not change a single-component decode")
  }

  test("Adobe APP14 transform=0 (stored RGB) fails soft; transform=1 (YCbCr) decodes") {
    val img = grayImage(16, 16)((x, y) => (x * 9 + y * 5) % 256)
    val rgb = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) rgb.setRGB(x, y, img.getRaster.getSample(x, y, 0) * 0x010101)
    val base = writeJpeg(rgb, 0.9f)
    def withApp14(transform: Int): Array[Byte] = {
      val seg = Array[Byte](0xff.toByte, 0xee.toByte, 0x00, 0x0e,
        'A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, transform.toByte)
      val out = new Array[Byte](base.length + seg.length)
      out(0) = base(0); out(1) = base(1) // SOI
      System.arraycopy(seg, 0, out, 2, seg.length)
      System.arraycopy(base, 2, out, 2 + seg.length, base.length - 2)
      out
    }
    assert(Jpeg.decode(withApp14(0)).isEmpty,
      "3-component stored-RGB (transform=0) must fail soft, not garble colors")
    assert(Jpeg.decode(withApp14(1)).isDefined, "explicit YCbCr tag decodes normally")
  }

  test("featurize routes jpeg items through the real decoder (dims + grid-luma)") {
    import org.apache.spark.sql.functions._
    val media = graft.ops.MultiModal.syntheticMedia(spark, 200, 4)
    val feats = graft.ops.MultiModal.featurize(media, "media_id", "media")
      .where(col("mediaType") === "jpeg")
    val rows = feats.select("imgWidth", "imgHeight", "imgChannels").collect()
    assert(rows.nonEmpty, "synthetic corpus has jpeg items")
    // every synthetic jpeg is a REAL ImageIO-encoded raster → all decode
    assert(rows.forall(r => !r.isNullAt(0) && r.getInt(0) >= 24 && r.getInt(2) == 3),
      "all synthetic jpegs decode with real dimensions")
  }
}
