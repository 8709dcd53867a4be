package graft

import graft.codecs._
import graft.core.{BitPack, Bytes}
import org.scalatest.funsuite.AnyFunSuite

/** Roundtrip unit tests for every codec kernel — the reference's core
  * oracle pattern (python-blosc2 tests/test_compress2.py:58-76: compress
  * then decompress, assert byte equality), crossed over the FIXTURES.md
  * §2 micro fixtures.
  */
class CodecSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(42)

  // ---------------------------------------------------------- bit packing

  test("bitpack roundtrips all widths") {
    for (width <- 0 to 64) {
      val n = 1000 + width
      val vs = Array.fill(n) {
        if (width == 0) 0L
        else if (width == 64) rnd.nextLong()
        else rnd.nextLong() & ((1L << width) - 1)
      }
      val w = new Bytes.Writer()
      BitPack.pack(vs, 0, n, width, w)
      val r = new Bytes.Reader(w.result())
      val out = new Array[Long](n)
      BitPack.unpack(r, n, width, out, 0)
      assert(out.toSeq == vs.toSeq, s"width=$width")
    }
  }

  test("varints roundtrip extremes") {
    val vals = Seq(0L, 1L, -1L, 127L, 128L, Long.MaxValue, Long.MinValue, 42L, -300L)
    val w = new Bytes.Writer()
    vals.foreach(w.putSVarLong)
    val r = new Bytes.Reader(w.result())
    vals.foreach(v => assert(r.getSVarLong() == v))
  }

  // ------------------------------------------------------------ fixtures

  private def arangeLongs(n: Int) = Array.tabulate(n)(_.toLong)
  private def constantBlock(n: Int) = Array.fill(n)(123456789L)
  private def lowCardStrings(n: Int): Array[Array[Byte]] = {
    val pool = Array.tabulate(20)(i => s"lang-val-$i".getBytes("UTF-8"))
    Array.tabulate(n)(i => pool((math.pow(rnd.nextDouble(), 3) * 20).toInt.min(19)))
  }
  private def keywordText(n: Int): Array[Array[Byte]] =
    Array.tabulate(n)(i => graft.corpus.Corpus.content(i.toLong * 7 + 1, "c").take(400).getBytes("UTF-8"))
  private def hexCommits(n: Int): Array[Array[Byte]] =
    Array.tabulate(n) { i =>
      val sb = new StringBuilder
      var h = graft.corpus.Corpus.mix(i.toLong)
      for (j <- 0 until 40) {
        if (j % 15 == 0) h = graft.corpus.Corpus.mix(h ^ j)
        sb.append("0123456789abcdef".charAt(((h >>> ((j % 15) * 4)) & 0xf).toInt))
      }
      sb.toString.getBytes("UTF-8")
    }

  private def roundtripLong(vs: Array[Long], m: Byte, e: Byte = Entropy.NONE): Unit = {
    val block = ChunkCodec.encode(LongVec(vs), Plan(m, e))
    val out = ChunkCodec.decode(block).asInstanceOf[LongVec]
    assert(out.values.toSeq == vs.toSeq, s"method=$m entropy=$e")
  }

  private def roundtripBin(vs: Array[Array[Byte]], m: Byte, e: Byte = Entropy.NONE): Unit = {
    val block = ChunkCodec.encode(BinVec(vs), Plan(m, e))
    val out = ChunkCodec.decode(block).asInstanceOf[BinVec]
    assert(out.values.length == vs.length)
    for (i <- vs.indices)
      assert(java.util.Arrays.equals(out.values(i), vs(i)), s"method=$m row $i")
  }

  // ------------------------------------------------------- long kernels

  test("long kernels roundtrip on all fixtures × entropies") {
    val fixtures = Seq(
      arangeLongs(5000),
      constantBlock(5000),
      Array.fill(5000)(rnd.nextLong()),
      Array.tabulate(5000)(i => (i / 100).toLong), // runs
      Array.tabulate(5000)(i => rnd.nextInt(1 << 12).toLong), // small ints
      Array[Long](),
      Array(42L)
    )
    val smallIntsWithOutlier = Array.tabulate(5000)(i => rnd.nextInt(1 << 12).toLong)
    smallIntsWithOutlier(2500) = 1L << 62
    val extremes = Array(Long.MinValue, Long.MaxValue, 0L, -1L, 1L, Long.MinValue / 2, Long.MaxValue / 2)
    for (vs <- fixtures ++ Seq(smallIntsWithOutlier, extremes);
         m <- Seq(Method.PLAIN, Method.RLE, Method.FOR_PACK, Method.DELTA_PACK);
         e <- Seq(Entropy.NONE, Entropy.LZ4, Entropy.ZSTD))
      roundtripLong(vs, m, e)
  }

  test("const long chunk stores almost nothing") {
    val block = ChunkCodec.encode(LongVec(constantBlock(65536)), Plan(Method.CONST, Entropy.NONE))
    assert(block.length < 32)
    assert(ChunkCodec.decode(block).asInstanceOf[LongVec].values.forall(_ == 123456789L))
  }

  test("arange compresses via delta to ~2 bits/value, ~nothing with zstd") {
    val vs = arangeLongs(65536)
    // zigzag(+1) = 2 → 2-bit residuals → n/4 bytes
    val block = ChunkCodec.encode(LongVec(vs), Plan(Method.DELTA_PACK, Entropy.NONE))
    assert(block.length < 65536 / 4 + 64, s"got ${block.length}")
    val zblock = ChunkCodec.encode(LongVec(vs), Plan(Method.DELTA_PACK, Entropy.ZSTD))
    assert(zblock.length < 300, s"constant-residual chunk should zstd to ~nothing, got ${zblock.length}")
    roundtripLong(vs, Method.DELTA_PACK)
  }

  // ----------------------------------------------------- double kernels

  test("double kernels roundtrip incl. NaN/Inf bit patterns") {
    val vs = Array(0.0, -0.0, 1.5, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, math.Pi) ++
      Array.fill(1000)(rnd.nextGaussian() * 1e6)
    for (m <- Seq(Method.PLAIN, Method.SHUFFLE, Method.ALP); e <- Seq(Entropy.NONE, Entropy.ZSTD)) {
      val block = ChunkCodec.encode(DoubleVec(vs), Plan(m, e))
      val out = ChunkCodec.decode(block).asInstanceOf[DoubleVec]
      assert(vs.indices.forall(i =>
        java.lang.Double.doubleToRawLongBits(out.values(i)) == java.lang.Double.doubleToRawLongBits(vs(i))),
        s"m=$m e=$e")
    }
  }

  test("ALP: decimal doubles collapse to packed longs; noise degrades to exceptions") {
    // price-like fixture: RANDOM 2-decimal values in a bounded range
    // (lineitem prices) — random so the SHUFFLE+zstd comparison can't
    // ride arithmetic-progression byte-plane patterns
    val prices = Array.fill(20000)((rnd.nextInt(910000) + 90000) / 100.0)
    val alp = ChunkCodec.encode(DoubleVec(prices), Plan(Method.ALP, Entropy.NONE))
    val shuf = ChunkCodec.encode(DoubleVec(prices), Plan(Method.SHUFFLE, Entropy.ZSTD, 3))
    val out = ChunkCodec.decode(alp).asInstanceOf[DoubleVec]
    assert(prices.indices.forall(i => out.values(i) == prices(i)))
    // ~24 bits/value FOR-packed vs byte-planed zstd of the same data
    assert(alp.length < shuf.length, s"alp=${alp.length} shuffle=${shuf.length}")
    assert(alp.length < prices.length * 4, s"alp=${alp.length} (want < 4 B/value)")

    // the selector prefers ALP on decimal data, and its choice roundtrips
    val plan = graft.encode.Selector.choose(DoubleVec(prices))
    assert(plan.method == Method.ALP, plan.label)

    // sprinkle non-decimals: correctness holds, exceptions stay exact
    val dirty = prices.clone()
    dirty(7) = Double.NaN; dirty(100) = math.Pi; dirty(4000) = -0.0
    dirty(9999) = Double.NegativeInfinity; dirty(19999) = 1e300
    val block2 = ChunkCodec.encode(DoubleVec(dirty), Plan(Method.ALP, Entropy.NONE))
    val out2 = ChunkCodec.decode(block2).asInstanceOf[DoubleVec]
    assert(dirty.indices.forall(i =>
      java.lang.Double.doubleToRawLongBits(out2.values(i)) == java.lang.Double.doubleToRawLongBits(dirty(i))))

    // all-noise chunk: ALP must still roundtrip (100% exceptions), but
    // the selector must NOT pick it there
    val noise = Array.fill(5000)(rnd.nextGaussian())
    val out3 = ChunkCodec.decode(
      ChunkCodec.encode(DoubleVec(noise), Plan(Method.ALP, Entropy.NONE))).asInstanceOf[DoubleVec]
    assert(noise.indices.forall(i => out3.values(i) == noise(i)))
    assert(graft.encode.Selector.choose(DoubleVec(noise)).method != Method.ALP)

    // nulls ride the validity bitmap like every other method
    val withNulls = DoubleVec(prices.take(500), Array.tabulate(500)(_ % 7 != 0))
    val out4 = ChunkCodec.decode(
      ChunkCodec.encode(withNulls, Plan(Method.ALP, Entropy.NONE))).asInstanceOf[DoubleVec]
    assert((0 until 500).forall(i => if (i % 7 == 0) !out4.isValid(i) else out4.values(i) == prices(i)))
  }

  // -------------------------------------------------------- bin kernels

  test("bin kernels roundtrip on all string fixtures × entropies") {
    val fixtures = Seq(
      lowCardStrings(3000),
      keywordText(300),
      hexCommits(2000),
      Array[Array[Byte]](),
      Array("".getBytes("UTF-8")),
      Array.fill(100)("same".getBytes("UTF-8")),
      // binary-safe: all byte values incl. 0x00 and 0xFF (the FSST escape)
      Array.tabulate(300)(i => Array.tabulate(256)(j => ((i + j) % 256).toByte))
    )
    for (vs <- fixtures;
         m <- Seq(Method.PLAIN, Method.DICT, Method.FSST);
         e <- Seq(Entropy.NONE, Entropy.LZ4, Entropy.ZSTD))
      roundtripBin(vs, m, e)
  }

  test("dict on low-cardinality beats plain; fsst on keyword text beats plain") {
    val lc = lowCardStrings(5000)
    val plain = ChunkCodec.encode(BinVec(lc), Plan(Method.PLAIN, Entropy.NONE)).length
    val dict = ChunkCodec.encode(BinVec(lc), Plan(Method.DICT, Entropy.NONE)).length
    assert(dict < plain / 4, s"dict=$dict plain=$plain")

    val kt = keywordText(500)
    val plainK = ChunkCodec.encode(BinVec(kt), Plan(Method.PLAIN, Entropy.NONE)).length
    val fsst = ChunkCodec.encode(BinVec(kt), Plan(Method.FSST, Entropy.NONE)).length
    assert(fsst < plainK, s"fsst=$fsst plain=$plainK")
  }

  // ------------------------------------------------------------- nulls

  test("null-bearing chunks roundtrip with validity preserved") {
    val n = 1000
    val validity = Array.tabulate(n)(i => i % 7 != 0)
    val longs = LongVec(Array.tabulate(n)(_.toLong), validity)
    val out = ChunkCodec.decode(ChunkCodec.encode(longs, Plan(Method.DELTA_PACK, Entropy.ZSTD))).asInstanceOf[LongVec]
    assert(out.validity.toSeq == validity.toSeq)
    for (i <- 0 until n if validity(i)) assert(out.values(i) == i.toLong)

    val strs = BinVec(Array.tabulate(n)(i => if (validity(i)) s"v$i".getBytes("UTF-8") else null), validity)
    val outS = ChunkCodec.decode(ChunkCodec.encode(strs, Plan(Method.DICT, Entropy.NONE))).asInstanceOf[BinVec]
    for (i <- 0 until n)
      if (validity(i)) assert(new String(outS.values(i), "UTF-8") == s"v$i")
      else assert(outS.values(i) == null)
  }

  // ----------------------------------------------------------- selector

  test("selector picks sane plans per fixture (FIXTURES.md §2 table)") {
    import graft.encode.Selector
    assert(Selector.choose(LongVec(constantBlock(5000))).method == Method.CONST)
    val arangePlan = Selector.choose(LongVec(arangeLongs(5000)))
    assert(arangePlan.method == Method.DELTA_PACK || arangePlan.method == Method.FOR_PACK)
    val dictPlan = Selector.choose(BinVec(lowCardStrings(5000)))
    assert(dictPlan.method == Method.DICT)
    // hexCommits: 16-byte alphabet → bytepack (4 bits/char), never dict
    val hexPlan = Selector.choose(BinVec(hexCommits(3000)))
    assert(hexPlan.method == Method.BYTEPACK, hexPlan.label)
  }

  test("bytepack roundtrips and halves hex commits") {
    val hex = hexCommits(3000)
    for (e <- Seq(Entropy.NONE, Entropy.ZSTD)) roundtripBin(hex, Method.BYTEPACK, e)
    val packed = ChunkCodec.encode(BinVec(hex), Plan(Method.BYTEPACK, Entropy.NONE)).length
    val plain = ChunkCodec.encode(BinVec(hex), Plan(Method.PLAIN, Entropy.NONE)).length
    assert(packed < plain * 0.55, s"packed=$packed plain=$plain")
    // mixed/binary alphabet > 64 must be rejected by encode (selector
    // validates the full chunk before offering the plan)
    val binData = Array.tabulate(50)(i => Array.tabulate(100)(j => ((i * 7 + j) % 256).toByte))
    intercept[IllegalArgumentException] {
      ChunkCodec.encode(BinVec(binData), Plan(Method.BYTEPACK, Entropy.NONE))
    }
  }

  test("FSST dispatch equals a naive longest-match reference on adversarial tables (property)") {
    // Random symbol sets over a 3-letter alphabet force dense 2-byte
    // prefix collisions between 1/2-byte (shortCodes) and >=3-byte
    // (slab) symbols — exactly the split the flat-slab + first2
    // dispatch has to get right. Data adds a 4th letter so no-match
    // escape positions occur, and the tail exercises avail < 8 loads.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val syms = scala.collection.mutable.LinkedHashSet[Vector[Byte]]()
      while (syms.size < 60) {
        val len = 1 + rnd.nextInt(8)
        syms += Vector.fill(len)(('a' + rnd.nextInt(3)).toByte)
      }
      val table = new Fsst.Table(syms.toArray.map(_.toArray))
      val data = Array.fill(1500)(('a' + rnd.nextInt(4)).toByte)
      def naive(pos: Int): Int = {
        var best = -1
        var c = 0
        while (c < table.symbols.length) {
          val s = table.symbols(c)
          if (pos + s.length <= data.length &&
            data.slice(pos, pos + s.length).sameElements(s) &&
            (best < 0 || s.length > (best & 0xff))) best = (c << 8) | s.length
          c += 1
        }
        best
      }
      val disp = table.dispatch
      var pos = 0
      while (pos < data.length) {
        assert(disp.longestMatch(data, pos) == naive(pos), s"trial $trial pos $pos")
        pos += 1
      }
    }
  }

  test("selector choice always roundtrips (property)") {
    val gens = new java.util.Random(7)
    for (_ <- 0 until 20) {
      val n = 1 + gens.nextInt(2000)
      val vs = Array.fill(n)(gens.nextInt(1 << gens.nextInt(30)).toLong)
      val plan = graft.encode.Selector.choose(LongVec(vs))
      roundtripLong(vs, plan.method, plan.entropy)
    }
  }

  // ------------------------------------------- long-distance matching

  /** chunk-shaped values: ~8 KiB pseudo-text blobs, `dupFrac` of the
    * mass re-emitting an earlier value at long range (vendored-file
    * model)
    */
  private def dupHeavyValues(nVals: Int, dupFrac: Double): Array[Array[Byte]] = {
    val gens = new java.util.Random(11)
    val seen = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    Array.tabulate(nVals) { _ =>
      if (seen.nonEmpty && gens.nextDouble() < dupFrac) seen(gens.nextInt(seen.length))
      else {
        val b = new Array[Byte](6000 + gens.nextInt(4000))
        var j = 0
        while (j < b.length) { b(j) = ("resultbuffer index=${}\n".charAt(j % 23) ^ (gens.nextInt(8))).toByte; j += 1 }
        seen += b
        b
      }
    }
  }

  test("LDM: dup-gated wide window shrinks dup-heavy bodies, exact roundtrip either way") {
    // body-level A/B: >= LDM_MIN_BYTES of text with 30% exact-dup values
    val vals = dupHeavyValues(800, 0.30) // ~6.4 MB
    val body = new Bytes.Writer(8 << 20)
    vals.foreach(v => body.putBytes(v))
    val raw = java.util.Arrays.copyOf(body.rawBuffer, body.size)
    val off = Entropy.compressRange(Entropy.ZSTD, 3, raw, raw.length)
    val on = Entropy.compressRange(Entropy.ZSTD, 3, raw, raw.length, ldmHint = true)
    assert(on.length < off.length * 0.95, s"ldm=${on.length} plain=${off.length}")
    assert(Entropy.decompress(Entropy.ZSTD, on, raw.length).toSeq == raw.toSeq)
    assert(Entropy.decompress(Entropy.ZSTD, off, raw.length).toSeq == raw.toSeq)

    // hint: fires on the dup-heavy chunk, stays off on the dup-free one
    // (dup-free chunks keep the exact pre-LDM byte stream)
    assert(ChunkCodec.ldmHint(BinVec(vals)))
    assert(!ChunkCodec.ldmHint(BinVec(dupHeavyValues(800, 0.0))))

    // full chunk path through the hint: exact value roundtrip
    val block = ChunkCodec.encode(BinVec(vals), Plan(Method.PLAIN, Entropy.ZSTD, 3))
    val out = ChunkCodec.decode(block).asInstanceOf[BinVec]
    assert(out.n == vals.length)
    var i = 0
    while (i < vals.length) {
      assert(java.util.Arrays.equals(out.values(i), vals(i)), s"row $i")
      i += 1
    }
  }
}
