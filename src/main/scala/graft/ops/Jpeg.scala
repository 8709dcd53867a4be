package graft.ops

/** Dependency-free baseline JPEG still-image decoder (public container
  * format: ITU-T T.81 / ISO 10918-1 — marker segments, canonical
  * Huffman entropy coding, 8x8 DCT blocks, JFIF YCbCr color space).
  * Together with [[Png]] and [[MultiModal.WavPcm]] this closes the
  * image half of the multimodal decode surface with REAL decoders; the
  * pipeline slot is the one the reference's Proxy/fetch layer occupies
  * (python-blosc2 proxy.py:206). Only video decode remains the declared
  * stub (no codec libraries in this container).
  *
  * Scope (fail-soft `None` outside it — media columns carry dirty bytes
  * at scale and one bad item must not kill an executor task):
  * baseline + extended-sequential Huffman (SOF0/SOF1), 8-bit samples,
  * 1-component grayscale or 3-component YCbCr with any H/V sampling
  * factors 1-4 (4:4:4, 4:2:0, 4:2:2, ...), restart intervals (DRI +
  * RSTn), byte stuffing, 8/16-bit quant tables. Progressive (SOF2),
  * arithmetic coding, 12-bit precision, and CMYK are out of scope and
  * return None.
  *
  * Chroma upsampling is nearest-neighbor replication (the spec's
  * simple upsampler), NOT libjpeg's "fancy" triangular filter — decoded
  * subsampled color images therefore differ from libjpeg-family
  * decoders by a few code values near chroma edges, which is why the
  * exactness oracle (`media_jpeg_features`) uses grayscale fixtures
  * (no subsampling, bit-exact everywhere) and the RGB comparison in
  * JpegSpec asserts a tolerance instead.
  */
object Jpeg {

  /** Decoded raster: row-major, channel-interleaved 8-bit samples.
    * channels: 1 = gray, 3 = RGB (YCbCr converted).
    */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Pixel-count cap (16 Mpx) — a forged SOF must not allocate
    * unboundedly on an executor. Same bound as [[Png.MAX_PIXELS]].
    */
  val MAX_PIXELS: Long = 1L << 24

  /** Zigzag scan order: index = scan position, value = natural (row
    * major) position inside the 8x8 block. T.81 Figure A.6.
    */
  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** idct basis: COS(u)(x) = C(u)/2 * cos((2x+1) * u * pi / 16) */
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  def decode(bytes: Array[Byte]): Option[Image] =
    try decodeImpl(bytes)
    catch { case _: Exception | _: OutOfMemoryError => None }

  // ---- Huffman table: canonical codes decoded by length-incremental
  // min/max compare (T.81 F.2.2.3 DECODE procedure) ----
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    // minCode(l)/maxCode(l): smallest/largest code of bit-length l+1;
    // valPtr(l): index of that length's first symbol. maxCode = -1 when
    // the length has no codes.
    val minCode = new Array[Int](16)
    val maxCode = Array.fill(16)(-1)
    val valPtr = new Array[Int](16)
    val syms = symbols
    locally {
      var code = 0
      var k = 0
      var l = 0
      while (l < 16) {
        if (counts(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l)
          k += counts(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == symbols.length, "huffman symbol count mismatch")
    }
  }

  // ---- Entropy-coded-segment bit reader with 0xFF00 byte stuffing;
  // stops (bits exhausted) at any non-stuffing marker ----
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    var hitMarker = false

    private def fill(): Unit = {
      while (nBits <= 48 && !hitMarker && pos < data.length) {
        val b = data(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 < data.length && (data(pos + 1) & 0xff) == 0x00) {
            acc = (acc << 8) | 0xffL; nBits += 8; pos += 2
          } else {
            hitMarker = true // RSTn / EOI / next segment: stop here
          }
        } else {
          acc = (acc << 8) | b; nBits += 8; pos += 1
        }
      }
    }

    /** next single bit, or -1 on exhausted data */
    def bit(): Int = {
      if (nBits == 0) fill()
      if (nBits == 0) return -1
      nBits -= 1
      ((acc >>> nBits) & 1L).toInt
    }

    /** next n bits MSB-first (n <= 16), or -1 on exhausted data */
    def bits(n: Int): Int = {
      if (n == 0) return 0
      if (nBits < n) fill()
      if (nBits < n) return -1
      nBits -= n
      ((acc >>> nBits) & ((1L << n) - 1)).toInt
    }

    /** Byte-align and consume an expected RSTn marker (T.81 E.1.4).
      * Walks forward byte-wise rather than via fill(): fill() would pull
      * a not-yet-buffered padding byte into `acc`, leaking pad bits into
      * the next interval's data. Padding that lands on 0xFF is stuffed
      * as FF 00 by the encoder and must be skipped too, not mistaken
      * for a marker.
      */
    def restart(): Boolean = {
      nBits = 0; acc = 0L // drop buffered byte-boundary padding bits
      // Conformant streams pad with at most a few bytes before an RSTn;
      // an unbounded skip would let a corrupted entropy segment silently
      // resync at the NEXT restart marker and decode wrong pixels.
      // Fail (-> None upstream) beyond a small pad budget instead.
      var padBudget = 8
      while (pos + 1 < data.length) {
        val b = data(pos) & 0xff
        if (b != 0xff) { // unbuffered pad byte
          padBudget -= 1
          if (padBudget < 0) return false
          pos += 1
        } else {
          val m = data(pos + 1) & 0xff
          if (m == 0x00) pos += 2 // stuffed 0xFF pad byte
          else if (m == 0xff) pos += 1 // fill byte before the marker (B.1.1.2)
          else if (m >= 0xd0 && m <= 0xd7) {
            pos += 2
            hitMarker = false
            return true
          } else return false // some other marker: malformed scan
        }
      }
      false
    }

    def decodeHuff(h: Huff): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 0
      while (l < 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) {
          val idx = h.valPtr(l) + code - h.minCode(l)
          if (idx < 0 || idx >= h.syms.length) return -1
          return h.syms(idx) & 0xff
        }
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
  }

  /** EXTEND (T.81 F.2.2.1): map a `size`-bit magnitude to its signed
    * value — values with a 0 high bit are negative.
    */
  @inline private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, tq: Int) {
    var dcTable = 0
    var acTable = 0
  }

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def decodeImpl(d: Array[Byte]): Option[Image] = {
    if (d == null || d.length < 4) return None
    if ((d(0) & 0xff) != 0xff || (d(1) & 0xff) != 0xd8) return None // SOI

    val quant = new Array[Array[Int]](4) // natural-order tables
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var adobeTransform = -1 // from APP14: 0=stored RGB, 1=YCbCr, 2=YCCK
    var pos = 2

    while (pos + 4 <= d.length) {
      if ((d(pos) & 0xff) != 0xff) return None
      var m = d(pos + 1) & 0xff
      // skip fill bytes (repeated 0xff before a marker, T.81 B.1.1.2)
      while (m == 0xff && pos + 2 < d.length) { pos += 1; m = d(pos + 1) & 0xff }
      pos += 2
      m match {
        case 0xd9 => return None // EOI before any scan
        case 0x01 => // TEM, standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 => // stray RST, standalone
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          val len = be16(d, pos)
          if (pos + len > d.length || len < 8) return None
          val precision = d(pos + 2) & 0xff
          if (precision != 8) return None
          height = be16(d, pos + 3)
          width = be16(d, pos + 5)
          val nf = d(pos + 7) & 0xff
          if (width <= 0 || height <= 0) return None
          if (width.toLong * height > MAX_PIXELS) return None
          if (nf != 1 && nf != 3) return None // gray or YCbCr only
          if (len < 8 + 3 * nf) return None
          comps = Array.tabulate(nf) { i =>
            val o = pos + 8 + 3 * i
            val hv = d(o + 1) & 0xff
            val c = Component(d(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf, d(o + 2) & 0xff)
            if (c.hSamp < 1 || c.hSamp > 4 || c.vSamp < 1 || c.vSamp > 4 || c.tq > 3)
              return None
            c
          }
          // A single-component scan is NON-interleaved (T.81 A.2.2):
          // one data unit per MCU over ceil(w/8) x ceil(h/8), whatever
          // sampling factors the SOF declares (they subsample nothing
          // when there is no other component to be relative to).
          if (nf == 1) comps = Array(comps(0).copy(hSamp = 1, vSamp = 1))
          pos += len
        case 0xc2 => return None // progressive: out of scope
        case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          return None // other SOFs (lossless, arithmetic, ...)
        case 0xc4 => // DHT — may hold several tables
          val len = be16(d, pos)
          if (pos + len > d.length) return None
          var o = pos + 2
          while (o < pos + len) {
            if (o + 17 > pos + len) return None
            val tcth = d(o) & 0xff
            val tc = (tcth >> 4) & 0xf
            val th = tcth & 0xf
            if (tc > 1 || th > 3) return None
            val counts = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) { counts(i) = d(o + 1 + i) & 0xff; total += counts(i); i += 1 }
            if (o + 17 + total > pos + len || total > 256) return None
            val syms = java.util.Arrays.copyOfRange(d, o + 17, o + 17 + total)
            val h = new Huff(counts, syms)
            if (tc == 0) dcTabs(th) = h else acTabs(th) = h
            o += 17 + total
          }
          pos += len
        case 0xdb => // DQT — may hold several tables; values in zigzag order
          val len = be16(d, pos)
          if (pos + len > d.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val pqtq = d(o) & 0xff
            val pq = (pqtq >> 4) & 0xf
            val tq = pqtq & 0xf
            if (pq > 1 || tq > 3) return None
            val n = if (pq == 0) 64 else 128
            if (o + 1 + n > pos + len) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              val v = if (pq == 0) d(o + 1 + i) & 0xff else be16(d, o + 1 + 2 * i)
              t(ZIGZAG(i)) = v // store natural-order
              i += 1
            }
            quant(tq) = t
            o += 1 + n
          }
          pos += len
        case 0xdd => // DRI
          val len = be16(d, pos)
          if (len != 4 || pos + len > d.length) return None
          restartInterval = be16(d, pos + 2)
          pos += len
        case 0xda => // SOS — scan header, then entropy-coded data
          val len = be16(d, pos)
          if (comps == null || pos + len > d.length) return None
          val ns = d(pos + 2) & 0xff
          if (ns != comps.length || len < 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cs = d(pos + 3 + 2 * i) & 0xff
            val tdta = d(pos + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcTable = (tdta >> 4) & 0xf
            c.acTable = tdta & 0xf
            i += 1
          }
          // Ss/Se/AhAl ignored (baseline: 0/63/0)
          // Adobe APP14 transform=0 means 3 components are STORED as
          // RGB, not YCbCr — out of the declared scope, so fail soft
          // rather than run the YCbCr matrix over RGB planes and emit
          // confidently wrong pixels.
          if (comps.length == 3 && adobeTransform == 0) return None
          return decodeScan(d, pos + len, comps, quant, dcTabs, acTabs,
            width, height, restartInterval)
        case 0xee => // APP14 (Adobe color-transform tag)
          val len = be16(d, pos)
          if (len < 2 || pos + len > d.length) return None
          if (len >= 14 && d(pos + 2) == 'A' && d(pos + 3) == 'd' && d(pos + 4) == 'o' &&
            d(pos + 5) == 'b' && d(pos + 6) == 'e')
            adobeTransform = d(pos + 13) & 0xff
          pos += len
        case _ => // APPn, COM, anything else with a length
          val len = be16(d, pos)
          if (len < 2 || pos + len > d.length) return None
          pos += len
      }
    }
    None
  }

  private def decodeScan(d: Array[Byte], dataStart: Int, comps: Array[Component],
                         quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
                         width: Int, height: Int, restartInterval: Int): Option[Image] = {
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)

    // per-component plane, padded to whole MCUs
    val planeW = comps.map(c => mcusX * c.hSamp * 8)
    val planeH = comps.map(c => mcusY * c.vSamp * 8)
    val planes = Array.tabulate(comps.length) { i =>
      if (planeW(i).toLong * planeH(i) > 4L * MAX_PIXELS) return None
      new Array[Byte](planeW(i) * planeH(i))
    }
    for (c <- comps) {
      if (quant(c.tq) == null) return None
      if (dcTabs(c.dcTable) == null || acTabs(c.acTable) == null) return None
    }

    val br = new BitReader(d, dataStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val blk = new Array[Byte](64)
    val idctTmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        var v = 0
        while (v < c.vSamp) {
          var h = 0
          while (h < c.hSamp) {
            if (!decodeBlock(br, dcTabs(c.dcTable), acTabs(c.acTable), qt, dcPred, ci, coef))
              return None
            idctBlock(coef, blk, idctTmp)
            // copy into the plane
            val bx = (mx * c.hSamp + h) * 8
            val by = (my * c.vSamp + v) * 8
            val pw = planeW(ci)
            var row = 0
            while (row < 8) {
              System.arraycopy(blk, row * 8, planes(ci), (by + row) * pw + bx, 8)
              row += 1
            }
            h += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // assemble output raster
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
      Some(Image(width, height, 1, out))
    } else {
      // YCbCr -> RGB with replication upsampling (spec simple upsampler)
      val out = new Array[Byte](width * height * 3)
      val yP = planes(0); val cbP = planes(1); val crP = planes(2)
      val yW = planeW(0); val cbW = planeW(1); val crW = planeW(2)
      val cY = comps(0); val cCb = comps(1); val cCr = comps(2)
      var y = 0
      while (y < height) {
        val yRow = y * cY.vSamp / vMax * yW
        val cbRow = y * cCb.vSamp / vMax * cbW
        val crRow = y * cCr.vSamp / vMax * crW
        var x = 0
        var o = (y * width) * 3
        while (x < width) {
          val yy = yP(yRow + x * cY.hSamp / hMax) & 0xff
          val cb = (cbP(cbRow + x * cCb.hSamp / hMax) & 0xff) - 128
          val cr = (crP(crRow + x * cCr.hSamp / hMax) & 0xff) - 128
          out(o) = clamp8(yy + 1.402 * cr)
          out(o + 1) = clamp8(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp8(yy + 1.772 * cb)
          x += 1; o += 3
        }
        y += 1
      }
      Some(Image(width, height, 3, out))
    }
  }

  @inline private def clamp8(v: Double): Byte = {
    val r = math.round(v).toInt
    (if (r < 0) 0 else if (r > 255) 255 else r).toByte
  }

  /** Decode one 8x8 block's coefficients (T.81 F.2.2): DC diff + AC
    * run-length pairs, dequantized into natural order. Returns false on
    * malformed entropy data.
    */
  private def decodeBlock(br: BitReader, dcT: Huff, acT: Huff, qt: Array[Int],
                          dcPred: Array[Int], ci: Int, coef: Array[Int]): Boolean = {
    java.util.Arrays.fill(coef, 0)
    val s = br.decodeHuff(dcT)
    if (s < 0 || s > 15) return false
    val diffBits = if (s == 0) 0 else br.bits(s)
    if (diffBits < 0) return false
    dcPred(ci) += extend(diffBits, s)
    coef(0) = dcPred(ci) * qt(0)
    var k = 1
    while (k < 64) {
      val rs = br.decodeHuff(acT)
      if (rs < 0) return false
      val r = (rs >> 4) & 0xf
      val sz = rs & 0xf
      if (sz == 0) {
        if (r == 15) k += 16 // ZRL
        else return true // EOB
      } else {
        k += r
        if (k > 63) return false
        val v = br.bits(sz)
        if (v < 0) return false
        val nat = ZIGZAG(k)
        coef(nat) = extend(v, sz) * qt(nat)
        k += 1
      }
    }
    true
  }

  /** Separable double-precision IDCT + level shift + clamp, with the
    * standard DC-only fast path (exact for the constant-tile oracle
    * fixtures — a DC-only block IS constant).
    */
  private def idctBlock(coef: Array[Int], out: Array[Byte], tmp: Array[Double]): Unit = {
    var allZeroAc = true
    var i = 1
    while (i < 64 && allZeroAc) { if (coef(i) != 0) allZeroAc = false; i += 1 }
    if (allZeroAc) {
      val v = clamp8(coef(0) / 8.0 + 128.0)
      java.util.Arrays.fill(out, v)
      return
    }
    // rows (over u), then columns — caller-provided tmp holds the
    // partially transformed data (hot MCU loop: no per-block alloc)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += COS(u)(x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += COS(v)(yy) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = clamp8(s + 128.0)
        yy += 1
      }
      x += 1
    }
  }

  /** Integer-exact per-channel pixel sums (the oracle feature). */
  def channelSums(img: Image): Array[Long] = {
    val sums = new Array[Long](img.channels)
    var i = 0
    while (i < img.pixels.length) {
      sums(i % img.channels) += img.pixels(i) & 0xff
      i += 1
    }
    sums
  }

  /** Grid mean-luma embedding — delegates to [[Png.gridLuma]] over the
    * structurally identical raster (pixels array is shared, no copy) so
    * PNG- and JPEG-decoded images land in ONE embedding space with the
    * same integer luma arithmetic.
    */
  def gridLuma(img: Image, grid: Int = 4): Array[Float] =
    Png.gridLuma(Png.Image(img.width, img.height, img.channels, img.pixels), grid)
}
