package graft.codecs

import graft.core.{BitPack, Bytes}
import scala.collection.mutable

/** Lightweight codecs for var-length binary/string column chunks.
  *
  * Layouts mirror the reference's utf8 offsets+bytes split
  * (python-blosc2 `_utf8_array.py:9-31`) and chunk-local dictionary
  * columns (`dictionary_column.py:10-21`); FSST is the string
  * symbol-table scheme from the public FSST paper (Boncz et al.,
  * VLDB 2020) in a simplified 1-byte-code form.
  *
  * Null values are encoded as empty (validity bitmap restores them).
  */
object BinKernels {

  private val EMPTY = Array.emptyByteArray

  // reusable per-thread blob for the FSST whole-chunk output (see the
  // FSST encode case); capped like the other codec thread-locals
  private val fsstBlob = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  @inline private def at(vec: BinVec, i: Int): Array[Byte] = {
    val v = vec.values(i)
    if (v == null) EMPTY else v
  }

  def encode(method: Byte, vec: BinVec, w: Bytes.Writer): Unit = method match {
    case Method.PLAIN =>
      val n = vec.n
      var i = 0
      while (i < n) { val v = at(vec, i); w.putVarInt(v.length); i += 1 }
      i = 0
      while (i < n) { w.putBytes(at(vec, i)); i += 1 }

    case Method.CONST =>
      if (vec.n > 0) { val v = at(vec, 0); w.putVarInt(v.length); w.putBytes(v) }

    case Method.DICT =>
      val n = vec.n
      // chunk-local dictionary in first-occurrence order (no global dict:
      // at 10^12 rows chunk-local + lazy unification is the only scalable
      // shape — SURVEY.md §7.3)
      val index = new mutable.HashMap[String, Int]()
      val dict = new mutable.ArrayBuffer[Array[Byte]]()
      val codes = new Array[Long](n)
      var i = 0
      while (i < n) {
        val v = at(vec, i)
        val key = new String(v, java.nio.charset.StandardCharsets.ISO_8859_1)
        codes(i) = index.getOrElseUpdate(key, { dict += v; dict.length - 1 }).toLong
        i += 1
      }
      w.putVarInt(dict.length)
      dict.foreach { d => w.putVarInt(d.length); w.putBytes(d) }
      val width = if (dict.length <= 1) 0 else BitPack.bitsFor((dict.length - 1).toLong)
      w.putByte(width)
      BitPack.pack(codes, 0, n, width, w)

    case Method.FSST =>
      val n = vec.n
      val table = Fsst.train(vec)
      Fsst.writeTable(table, w)
      // encoded lengths first (so decode can split values), then code
      // blob — all values compressed into ONE reusable contiguous
      // buffer (no per-value output arrays; bytes identical)
      val lens = new Array[Int](n)
      var blob = fsstBlob.get()
      var o = 0
      var i = 0
      while (i < n) {
        val v = at(vec, i)
        val need = o + v.length * 2 + 8
        if (blob.length < need) {
          blob = java.util.Arrays.copyOf(blob,
            java.lang.Integer.highestOneBit(math.max(need - 1, 1)) << 1)
          if (blob.length <= (1 << 27)) fsstBlob.set(blob)
        }
        val end = Fsst.compressInto(table, v, blob, o)
        lens(i) = end - o
        o = end
        i += 1
      }
      i = 0
      while (i < n) { w.putVarInt(lens(i)); i += 1 }
      w.putBytes(blob, 0, o)

    case Method.BYTEPACK =>
      // small-alphabet packing: hex commits (16 symbols → 4 bits/byte),
      // DNA-like data, etc. Requires alphabet ≤ 64 distinct bytes
      // (Selector validates before offering this plan).
      val n = vec.n
      val present = new Array[Int](256)
      java.util.Arrays.fill(present, -1)
      val alphabet = new mutable.ArrayBuffer[Byte]()
      var i = 0
      while (i < n) {
        val v = at(vec, i)
        var j = 0
        while (j < v.length) {
          val b = v(j) & 0xff
          if (present(b) < 0) { present(b) = alphabet.length; alphabet += v(j) }
          j += 1
        }
        i += 1
      }
      require(alphabet.length <= 64, s"BYTEPACK alphabet ${alphabet.length} > 64")
      val width = if (alphabet.length <= 1) 0 else BitPack.bitsFor((alphabet.length - 1).toLong)
      w.putByte(alphabet.length)
      alphabet.foreach(b => w.putByte(b & 0xff))
      w.putByte(width)
      var total = 0L
      i = 0
      while (i < n) { val v = at(vec, i); w.putVarInt(v.length); total += v.length; i += 1 }
      val codes = new Array[Long](total.toInt)
      var k = 0
      i = 0
      while (i < n) {
        val v = at(vec, i)
        var j = 0
        while (j < v.length) { codes(k) = present(v(j) & 0xff).toLong; k += 1; j += 1 }
        i += 1
      }
      BitPack.pack(codes, 0, codes.length, width, w)

    case Method.SHUFFLE =>
      // byte-plane transpose over the concatenated fixed-width elements
      // (blosc2 SHUFFLE with typesize = elemWidth): groups sign/exponent
      // bytes of packed float arrays so the entropy stage sees runs.
      val width = vec.elemWidth
      require(width > 0, "BIN SHUFFLE requires a fixed elemWidth")
      val n = vec.n
      w.putByte(width)
      var i = 0
      while (i < n) { w.putVarInt(at(vec, i).length); i += 1 }
      var b = 0
      while (b < width) {
        i = 0
        while (i < n) {
          val v = at(vec, i)
          var e = b
          while (e < v.length) { w.putByte(v(e) & 0xff); e += width }
          i += 1
        }
        b += 1
      }

    case m if CodecRegistry.isPluginId(m) =>
      CodecRegistry.binKernelOrThrow(m).encode(vec, w)

    case m => throw new IllegalArgumentException(s"bin method $m")
  }

  /** Counts full value-materializing decodes — lets specs prove that
    * the decode-free dictionary predicate path never materializes
    * values (graft.index.DictFilter); negligible cost in production.
    */
  val fullDecodes = new java.util.concurrent.atomic.AtomicLong(0)

  /** Decode-free equality over a DICT body: read ONLY the dictionary
    * head, map the target byte-strings to codes, and — only if any
    * target is present — unpack the bit-packed code stream and return
    * matching positions. Values are never materialized; a chunk whose
    * dictionary lacks every target costs just the dictionary read.
    * Mirrors the reference's dictionary-predicate rewrite
    * (python-blosc2 ctable.py:12953-13029: string compare → int32 code
    * compare).
    *
    * `r` must be positioned at the DICT body (after the validity
    * bitmap). Null positions never match (SQL equality semantics).
    */
  def dictEqualityPositions(r: Bytes.Reader, n: Int, validity: Array[Boolean],
                            targets: Array[Array[Byte]]): Array[Int] = {
    val dSize = r.getVarInt()
    val wanted = new Array[Boolean](dSize)
    var anyHit = false
    var i = 0
    while (i < dSize) {
      val entry = r.getBytes(r.getVarInt())
      var t = 0
      while (t < targets.length && !wanted(i)) {
        if (java.util.Arrays.equals(entry, targets(t))) { wanted(i) = true; anyHit = true }
        t += 1
      }
      i += 1
    }
    if (!anyHit) return Array.emptyIntArray
    val width = r.getByte()
    val codes = new Array[Long](n)
    BitPack.unpack(r, n, width, codes, 0)
    val out = new mutable.ArrayBuffer[Int]()
    i = 0
    while (i < n) {
      if ((validity == null || validity(i)) && wanted(codes(i).toInt)) out += i
      i += 1
    }
    out.toArray
  }

  def decode(method: Byte, r: Bytes.Reader, n: Int, validity: Array[Boolean]): Array[Array[Byte]] = {
    fullDecodes.incrementAndGet()
    val out = new Array[Array[Byte]](n)
    method match {
      case Method.PLAIN =>
        val lens = new Array[Int](n)
        var i = 0
        while (i < n) { lens(i) = r.getVarInt(); i += 1 }
        i = 0
        while (i < n) { out(i) = r.getBytes(lens(i)); i += 1 }

      case Method.CONST =>
        if (n > 0) {
          val v = r.getBytes(r.getVarInt())
          var i = 0
          while (i < n) { out(i) = v; i += 1 }
        }

      case Method.DICT =>
        val dSize = r.getVarInt()
        val dict = new Array[Array[Byte]](dSize)
        var i = 0
        while (i < dSize) { dict(i) = r.getBytes(r.getVarInt()); i += 1 }
        val width = r.getByte()
        val codes = new Array[Long](n)
        BitPack.unpack(r, n, width, codes, 0)
        i = 0
        while (i < n) { out(i) = dict(codes(i).toInt); i += 1 }

      case Method.FSST =>
        val table = Fsst.readTable(r)
        val lens = new Array[Int](n)
        var i = 0
        while (i < n) { lens(i) = r.getVarInt(); i += 1 }
        i = 0
        while (i < n) { out(i) = Fsst.decompress(table, r.getBytes(lens(i))); i += 1 }

      case Method.BYTEPACK =>
        val aSize = r.getByte()
        val alphabet = new Array[Byte](aSize)
        var i = 0
        while (i < aSize) { alphabet(i) = r.getByte().toByte; i += 1 }
        val width = r.getByte()
        val lens = new Array[Int](n)
        var total = 0L
        i = 0
        while (i < n) { lens(i) = r.getVarInt(); total += lens(i); i += 1 }
        val codes = new Array[Long](total.toInt)
        BitPack.unpack(r, codes.length, width, codes, 0)
        var k = 0
        i = 0
        while (i < n) {
          val v = new Array[Byte](lens(i))
          var j = 0
          while (j < v.length) { v(j) = alphabet(codes(k).toInt); k += 1; j += 1 }
          out(i) = v
          i += 1
        }

      case Method.SHUFFLE =>
        val width = r.getByte()
        val lens = new Array[Int](n)
        var i = 0
        while (i < n) { lens(i) = r.getVarInt(); out(i) = new Array[Byte](lens(i)); i += 1 }
        var b = 0
        while (b < width) {
          i = 0
          while (i < n) {
            val v = out(i)
            var e = b
            while (e < v.length) { v(e) = r.getByte().toByte; e += width }
            i += 1
          }
          b += 1
        }

      case m if CodecRegistry.isPluginId(m) =>
        val dec = CodecRegistry.binKernelOrThrow(m).decode(r, n, validity)
        System.arraycopy(dec, 0, out, 0, n)

      case m => throw new IllegalArgumentException(s"bin method $m")
    }
    if (validity != null) {
      var i = 0
      while (i < n) { if (!validity(i)) out(i) = null; i += 1 }
    }
    out
  }
}

/** Simplified FSST (Fast Static Symbol Table): up to 255 symbols of
  * 1..8 bytes, 1-byte codes, code 255 = escape + literal byte. Trained
  * per chunk by a few BPE-style rounds over a bounded sample — the same
  * "trial on a sample, then commit" pattern as blosc2's STUNE blocksize
  * search (python-blosc2 `core.py:1621-1640`).
  */
object Fsst {
  val ESCAPE = 255
  val MAX_SYMBOLS = 255
  val MAX_LEN = 8
  private val SAMPLE_BYTES = 1 << 15
  private val ROUNDS = 3

  /** table: symbols(code) = bytes. Match dispatch follows the FSST
    * paper's structure: a 2-byte-prefix slab for symbols of length >= 3
    * (few candidates per prefix) plus a 64Ki shortCodes table (first2)
    * that decides length <= 2 matches with a single load — so the
    * per-input-byte work is a couple of loads, not a scan over all
    * symbols sharing the first byte.
    *
    * The candidate slabs are FLAT primitive arrays and each candidate
    * carries its bytes packed big-endian into one Long, so a match test
    * is a single `(word ^ symWord) & lenMask == 0` against ONE unaligned
    * 8-byte load of the input (the paper's trick) — no Array[Array[_]]
    * pointer chase, no per-byte compare loop. Match semantics are
    * unchanged (the longest matching symbol wins; two distinct symbols
    * of equal length can never match the same position), so the encoded
    * bytes are bit-identical to the scalar dispatch this replaces.
    */
  final class Table(val symbols: Array[Array[Byte]]) {
    /** Encode-side match structures, built on first compress/train use:
      * decode-side tables (readTable/decompress) only touch `symbols`
      * and never pay the 256 KiB shortCodes build. Callers fetch this
      * ONCE per value (not per byte), so the lazy-init check stays off
      * the per-byte path.
      */
    lazy val dispatch: Dispatch = new Dispatch(symbols)
  }

  /** See [[Table]] — the flat-slab + shortCodes matcher. */
  final class Dispatch(symbols: Array[Array[Byte]]) {
    /** packed (code<<8 | 1) for 1-byte symbols, -1 otherwise — the
      * avail==1 tail path only; positions with 2+ bytes left go through
      * [[first2]], which embeds this as its fallback.
      */
    private val oneByte: Array[Int] = {
      val a = Array.fill(256)(-1)
      var c = 0
      while (c < symbols.length) {
        if (symbols(c).length == 1) a(symbols(c)(0) & 0xff) = (c << 8) | 1
        c += 1
      }
      a
    }

    /** first2(b0b1): packed (code<<8 | len) of the best symbol of
      * length <= 2 at a position whose next two bytes are b0,b1 — the
      * exact 2-byte symbol if one exists, else b0's 1-byte symbol,
      * else -1 (escape). The paper's shortCodes table: after the
      * (usually empty) >=3 slab check, ONE load fully decides the
      * position, replacing the 2-byte slab scan + separate 1-byte
      * fallback. 256 KiB per table, LLC-resident for the whole chunk.
      */
    private val first2: Array[Int] = {
      val a = new Array[Int](65536)
      var k = 0
      while (k < 65536) { a(k) = oneByte(k >>> 8); k += 1 }
      var c = 0
      while (c < symbols.length) {
        val s = symbols(c)
        if (s.length == 2) a(((s(0) & 0xff) << 8) | (s(1) & 0xff)) = (c << 8) | 2
        c += 1
      }
      a
    }

    // symbols of length >= 3, grouped by first-two-bytes into contiguous
    // slabs [prefStart(k), prefStart(k+1)), longest first within a slab:
    // candPacked = (code << 8) | len, candWord = the symbol's bytes
    // big-endian zero-padded, candMask = the word's high `len` bytes
    private val (prefStart, candPacked, candWord) = {
      val starts = new Array[Int](65537)
      val byPref = new mutable.HashMap[Int, List[Int]]()
      var c = 0
      var total = 0
      while (c < symbols.length) {
        val s = symbols(c)
        if (s.length >= 3) {
          val k = ((s(0) & 0xff) << 8) | (s(1) & 0xff)
          byPref.update(k, c :: byPref.getOrElse(k, Nil))
          total += 1
        }
        c += 1
      }
      val packed = new Array[Int](total)
      val words = new Array[Long](total)
      // counts → exclusive prefix sums → fill
      byPref.foreach { case (k, cs) => starts(k + 1) = cs.size }
      var k = 0
      while (k < 65536) { starts(k + 1) += starts(k); k += 1 }
      byPref.foreach { case (pk, cs) =>
        var i = starts(pk)
        cs.sortBy(code => -symbols(code).length).foreach { code =>
          val s = symbols(code)
          var w = 0L
          var j = 0
          while (j < s.length) { w |= (s(j) & 0xffL) << (56 - 8 * j); j += 1 }
          packed(i) = (code << 8) | s.length
          words(i) = w
          i += 1
        }
      }
      (starts, packed, words)
    }

    /** big-endian 8-byte window of data at pos (zero-padded past the
      * end); one unaligned load on the common path. Platform.getLong is
      * Spark's own unsafe accessor (an intrinsified static — the same
      * primitive UnsafeRow reads ride on).
      */
    @inline private def wordAt(data: Array[Byte], pos: Int, avail: Int): Long =
      if (avail >= 8)
        java.lang.Long.reverseBytes(org.apache.spark.unsafe.Platform.getLong(
          data, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos))
      else {
        var w = 0L
        var j = 0
        while (j < avail) { w |= (data(pos + j) & 0xffL) << (56 - 8 * j); j += 1 }
        w
      }

    /** Longest symbol matching data at pos, packed as (code << 8) | len;
      * -1 if none. Allocation-free — this runs once per input byte.
      * b0 and the 2-byte prefix come out of the single loaded word, so
      * the common path is one unaligned load + two table loads.
      */
    def longestMatch(data: Array[Byte], pos: Int): Int = {
      val avail = data.length - pos
      if (avail >= 2) {
        val k = ((data(pos) & 0xff) << 8) | (data(pos + 1) & 0xff)
        var i = prefStart(k)
        val end = prefStart(k + 1)
        if (i < end) {
          val w = wordAt(data, pos, avail)
          while (i < end) {
            // candidates are longest-first: first hit IS the longest.
            // len > avail can't hit: the zero-padded window would need
            // the symbol's tail bytes to be zero, which the mask covers
            // only within `len`, so require len <= avail explicitly.
            val p = candPacked(i)
            val len = p & 0xff
            if (len <= avail && ((w ^ candWord(i)) & (-1L << ((8 - len) << 3))) == 0L) return p
            i += 1
          }
        }
        first2(k)
      } else oneByte(data(pos) & 0xff)
    }
  }

  private def sample(vec: BinVec): Array[Byte] = {
    val w = new Bytes.Writer(SAMPLE_BYTES)
    val n = vec.n
    if (n == 0) return w.result()
    // spread the sample across the chunk, not just the head
    val step = math.max(1, n / 64)
    var i = 0
    while (i < n && w.size < SAMPLE_BYTES) {
      val v = vec.values(i)
      if (v != null) w.putBytes(v, 0, math.min(v.length, SAMPLE_BYTES - w.size))
      i += step
    }
    w.result()
  }

  def train(vec: BinVec): Table = {
    val s = sample(vec)
    var symbols = Array.empty[Array[Byte]]
    var round = 0
    while (round < ROUNDS) {
      val matcher = new Table(symbols).dispatch
      // Gains keyed by the candidate's zero-padded big-endian word:
      // len <= 7 leaves the word's low byte zero, so the length packs
      // into the low 3 bits collision-free; len == 8 (full word) gets
      // its own map. Primitive LongMaps replace the previous
      // String-keyed HashMap, which allocated + hashed a String per
      // input byte — the dominant train cost. Ranking below reproduces
      // the String order exactly, so trained tables are bit-identical.
      val gain7 = new mutable.LongMap[Long]() // key = word | len (1..7)
      val gain8 = new mutable.LongMap[Long]() // key = word (len == 8)
      @inline def wordOf(start: Int, len: Int): Long = {
        var w = 0L
        var j = 0
        while (j < len) { w |= (s(start + j) & 0xffL) << (56 - 8 * j); j += 1 }
        w
      }
      @inline def bump(start: Int, len: Int): Unit =
        if (len == 8) {
          val k = wordOf(start, 8)
          gain8.update(k, gain8.getOrElse(k, 0L) + len)
        } else {
          val k = wordOf(start, len) | len
          gain7.update(k, gain7.getOrElse(k, 0L) + len)
        }
      var pos = 0
      var prevStart = -1
      var prevLen = 0
      while (pos < s.length) {
        val m = matcher.longestMatch(s, pos)
        val curLen = if (m >= 0) m & 0xff else 1
        // candidate: this unit alone
        bump(pos, curLen)
        // candidate: previous unit + this unit (BPE merge), capped at MAX_LEN
        if (prevStart >= 0 && prevLen + curLen <= MAX_LEN) bump(prevStart, prevLen + curLen)
        prevStart = pos
        prevLen = curLen
        pos += curLen
      }
      // rank candidates by bytes saved: a len-L symbol with f uses saves
      // f*(L-1) bytes (L>=2) or f bytes (L==1: code replaces escape+literal).
      // Ties break by symbol bytes ascending; (unsigned padded word, len)
      // ascending IS that byte-lexicographic order (a proper prefix has
      // zeros — or smaller bytes — where the longer symbol differs, and
      // equal words mean one is the other's zero-extended prefix).
      val ranked = (gain7.iterator.map { case (k, covered) => (k & ~7L, (k & 7L).toInt, covered) } ++
        gain8.iterator.map { case (w, covered) => (w, 8, covered) })
        .map { case (w, len, covered) =>
          val saved = if (len >= 2) covered * (len - 1) / len else covered
          (w, len, saved)
        }
        .filter(_._3 > 0)
        .toArray
      scala.util.Sorting.stableSort(ranked, (a: (Long, Int, Long), b: (Long, Int, Long)) =>
        if (a._3 != b._3) a._3 > b._3
        else {
          val c = java.lang.Long.compareUnsigned(a._1, b._1)
          if (c != 0) c < 0 else a._2 < b._2
        })
      symbols = ranked.take(MAX_SYMBOLS).map { case (w, len, _) =>
        val b = new Array[Byte](len)
        var j = 0
        while (j < len) { b(j) = ((w >>> (56 - 8 * j)) & 0xff).toByte; j += 1 }
        b
      }
      round += 1
    }
    new Table(symbols)
  }

  // reusable per-thread scratch (worst case 2 bytes out per byte in);
  // avoids a fresh 2x-size allocation per value on the hot path
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  def compress(t: Table, data: Array[Byte]): Array[Byte] = {
    val need = data.length * 2 + 8
    var out = scratch.get()
    if (out.length < need) { out = new Array[Byte](need); scratch.set(out) }
    val o = compressInto(t, data, out, 0)
    java.util.Arrays.copyOf(out, o)
  }

  /** Compress `data` into `out` starting at `off`; returns the end
    * offset. Caller guarantees capacity ≥ off + 2*data.length. Writing
    * a whole chunk's values into ONE contiguous buffer avoids the
    * per-value copyOf of [[compress]] (~chunk-sized allocation churn
    * per chunk at 32 codec threads).
    */
  def compressInto(t: Table, data: Array[Byte], out: Array[Byte], off: Int): Int = {
    var o = off
    var pos = 0
    if (t.symbols.length == 0) {
      while (pos < data.length) {
        out(o) = ESCAPE.toByte; out(o + 1) = data(pos); o += 2; pos += 1
      }
    } else {
      val matcher = t.dispatch // one lazy-init check per VALUE, not per byte
      while (pos < data.length) {
        val m = matcher.longestMatch(data, pos)
        if (m >= 0) { out(o) = (m >>> 8).toByte; o += 1; pos += m & 0xff }
        else { out(o) = ESCAPE.toByte; out(o + 1) = data(pos); o += 2; pos += 1 }
      }
    }
    o
  }

  /** Two passes — exact-size the output from the code stream, then
    * fill. No growth buffer, no final copy: one allocation per value
    * on the decode hot path (runs once per encoded value per chunk).
    */
  def decompress(t: Table, enc: Array[Byte]): Array[Byte] = {
    val syms = t.symbols
    var outLen = 0
    var pos = 0
    while (pos < enc.length) {
      val code = enc(pos) & 0xff
      pos += 1
      if (code == ESCAPE) { outLen += 1; pos += 1 }
      else outLen += syms(code).length
    }
    val out = new Array[Byte](outLen)
    var o = 0
    pos = 0
    while (pos < enc.length) {
      val code = enc(pos) & 0xff
      pos += 1
      if (code == ESCAPE) { out(o) = enc(pos); o += 1; pos += 1 }
      else {
        val s = syms(code)
        if (s.length == 1) { out(o) = s(0); o += 1 }
        else { System.arraycopy(s, 0, out, o, s.length); o += s.length }
      }
    }
    out
  }

  def writeTable(t: Table, w: Bytes.Writer): Unit = {
    w.putVarInt(t.symbols.length)
    t.symbols.foreach { s => w.putByte(s.length); w.putBytes(s) }
  }

  def readTable(r: Bytes.Reader): Table = {
    val n = r.getVarInt()
    val syms = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { syms(i) = r.getBytes(r.getByte()); i += 1 }
    new Table(syms)
  }
}
