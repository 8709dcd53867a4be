package graft.ops

/** Dependency-free PNG still-image decoder (public container format:
  * RFC 2083 / W3C PNG — signature, CRC-checked chunks, zlib-deflated
  * scanlines with per-row filters). This replaces the image half of the
  * multimodal decode stub with a REAL decoder: the only runtime it
  * needs is `java.util.zip.Inflater`/`CRC32`, which ship in the JDK.
  *
  * Scope (fail-soft `None` outside it, because media columns carry
  * dirty bytes at scale and a bad item must not kill the task):
  * 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette → RGB),
  * 4 (gray+alpha), 6 (RGBA), non-interlaced, all five row filters
  * (None/Sub/Up/Average/Paeth). The multimodal-pipeline role is the
  * same slot the reference's Proxy/fetch layer occupies
  * (python-blosc2 proxy.py:206); video decode remains the declared
  * stub (no codec libraries in this container).
  */
object Png {

  /** Decoded raster: row-major, channel-interleaved 8-bit samples.
    * channels: 1=gray, 2=gray+alpha, 3=RGB (palette expanded), 4=RGBA.
    */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Pixel-count cap (16 Mpx ≈ 64 MB RGBA): a forged IHDR must not
    * allocate unboundedly on an executor.
    */
  val MAX_PIXELS: Long = 1L << 24

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val SIG: Array[Int] = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def decode(bytes: Array[Byte]): Option[Image] =
    try decodeImpl(bytes)
    catch { case _: Exception | _: OutOfMemoryError => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 57) return None
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != SIG(i)) return None; i += 1 }

    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var compression = 0; var filterMethod = 0; var interlace = 0
    var seenIhdr = false
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    var pos = 8
    var done = false
    while (!done && pos + 12 <= bytes.length) {
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      // CRC covers type + data; a corrupt chunk fails the whole item
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(bytes, pos + 8 + len)) return None
      val t0 = bytes(pos + 4); val t1 = bytes(pos + 5)
      val t2 = bytes(pos + 6); val t3 = bytes(pos + 7)
      if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
        if (len != 13) return None
        w = be32(bytes, pos + 8); h = be32(bytes, pos + 12)
        bitDepth = bytes(pos + 16) & 0xff; colorType = bytes(pos + 17) & 0xff
        compression = bytes(pos + 18) & 0xff; filterMethod = bytes(pos + 19) & 0xff
        interlace = bytes(pos + 20) & 0xff
        seenIhdr = true
      } else if (t0 == 'P' && t1 == 'L' && t2 == 'T' && t3 == 'E') {
        plte = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
      } else if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        idat.write(bytes, pos + 8, len)
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        done = true
      } // ancillary chunks (tEXt, gAMA, tRNS, ...) are skipped
      pos += 12 + len
    }
    if (!seenIhdr || !done || w <= 0 || h <= 0 || w.toLong * h > MAX_PIXELS) return None
    if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace != 0) return None
    val srcCh = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && plte == null) return None

    val rowBytes = w * srcCh
    val rawLen = (rowBytes + 1) * h
    val raw = inflate(idat.toByteArray, rawLen)
    if (raw == null || raw.length != rawLen) return None

    // reconstruct filters in place into the packed output
    val out = new Array[Byte](rowBytes * h)
    val bpp = srcCh
    var y = 0
    while (y < h) {
      val ft = raw(y * (rowBytes + 1)) & 0xff
      if (ft > 4) return None
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val v = raw(src + x) & 0xff
        val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val b = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) out(dst - rowBytes + x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case 4 => v + paeth(a, b, c)
        }
        out(dst + x) = rec.toByte
        x += 1
      }
      y += 1
    }

    if (colorType == 3) {
      // palette expansion → RGB
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val idx = (out(p) & 0xff) * 3
        if (idx + 2 >= plte.length) return None
        rgb(p * 3) = plte(idx); rgb(p * 3 + 1) = plte(idx + 1); rgb(p * 3 + 2) = plte(idx + 2)
        p += 1
      }
      Some(Image(w, h, 3, rgb))
    } else Some(Image(w, h, srcCh, out))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        // 0 progress without finishing = truncated stream OR a preset-
        // dictionary (FDICT) header we don't support — bail either way
        // (looping on needsDictionary() would hang the executor)
        if (n == 0) return null
        off += n
      }
      if (off == expected) out else null
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Integer-exact per-channel sums — the oracle-able image feature
    * (the raster analog of WavPcm.features' integer sums).
    */
  def channelSums(img: Image): Array[Long] = {
    val sums = new Array[Long](img.channels)
    val px = img.pixels
    var i = 0
    while (i < px.length) {
      sums(i % img.channels) += px(i) & 0xff
      i += 1
    }
    sums
  }

  /** Real fixed-dim image feature: mean luminance over a grid×grid
    * tiling, scaled to [0,1] — the drop-in that replaces the stub
    * embedding for decodable images (stands where model inference
    * would run; deterministic, resolution-independent shape).
    */
  def gridLuma(img: Image, grid: Int = 4): Array[Float] = {
    val out = new Array[Float](grid * grid)
    val counts = new Array[Int](grid * grid)
    val ch = img.channels
    var y = 0
    while (y < img.height) {
      val gy = y * grid / img.height
      var x = 0
      while (x < img.width) {
        val base = (y * img.width + x) * ch
        // luma: gray channel directly, or integer-weighted RGB (BT.601-ish)
        val luma = ch match {
          case 1 | 2 => img.pixels(base) & 0xff
          case _ =>
            (299 * (img.pixels(base) & 0xff) + 587 * (img.pixels(base + 1) & 0xff) +
              114 * (img.pixels(base + 2) & 0xff)) / 1000
        }
        val g = gy * grid + x * grid / img.width
        out(g) += luma
        counts(g) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < out.length) { if (counts(i) > 0) out(i) /= counts(i) * 255.0f; i += 1 }
    out
  }
}
