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
      // encoded lengths first (so decode can split values), then code blob
      val enc = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) { enc(i) = Fsst.compress(table, at(vec, i)); i += 1 }
      i = 0
      while (i < n) { w.putVarInt(enc(i).length); i += 1 }
      i = 0
      while (i < n) { w.putBytes(enc(i)); i += 1 }

    case m => throw new IllegalArgumentException(s"bin method $m")
  }

  def decode(method: Byte, r: Bytes.Reader, n: Int, validity: Array[Boolean]): Array[Array[Byte]] = {
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

  /** table: symbols(code) = bytes; lookup: first byte -> codes sorted by len desc */
  final class Table(val symbols: Array[Array[Byte]]) {
    val byFirst: Array[Array[Int]] = {
      val tmp = Array.fill(256)(List.empty[Int])
      var c = 0
      while (c < symbols.length) {
        val f = symbols(c)(0) & 0xff
        tmp(f) = c :: tmp(f)
        c += 1
      }
      tmp.map(_.sortBy(c => -symbols(c).length).toArray)
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
      val table = new Table(symbols)
      val gain = new mutable.HashMap[String, Long]()
      var pos = 0
      var prevStart = -1
      var prevLen = 0
      while (pos < s.length) {
        val (code, len) = longestMatch(table, s, pos)
        val curLen = if (code >= 0) len else 1
        // candidate: this unit alone
        val cur = new String(s, pos, curLen, java.nio.charset.StandardCharsets.ISO_8859_1)
        gain.update(cur, gain.getOrElse(cur, 0L) + curLen)
        // candidate: previous unit + this unit (BPE merge), capped at MAX_LEN
        if (prevStart >= 0 && prevLen + curLen <= MAX_LEN) {
          val merged = new String(s, prevStart, prevLen + curLen, java.nio.charset.StandardCharsets.ISO_8859_1)
          gain.update(merged, gain.getOrElse(merged, 0L) + prevLen + curLen)
        }
        prevStart = pos
        prevLen = curLen
        pos += curLen
      }
      // rank candidates by bytes saved: a len-L symbol with f uses saves
      // f*(L-1) bytes (L>=2) or f bytes (L==1: code replaces escape+literal)
      symbols = gain.iterator
        .map { case (sym, covered) =>
          val len = sym.length
          val saved = if (len >= 2) covered * (len - 1) / len else covered
          (sym, saved)
        }
        .filter(_._2 > 0)
        .toArray
        .sortBy { case (sym, saved) => (-saved, sym) }
        .take(MAX_SYMBOLS)
        .map(_._1.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      round += 1
    }
    new Table(symbols)
  }

  /** (code, matchedLen) or (-1, 0). */
  @inline private def longestMatch(t: Table, data: Array[Byte], pos: Int): (Int, Int) = {
    if (t.symbols.length == 0) return (-1, 0)
    val cands = t.byFirst(data(pos) & 0xff)
    var ci = 0
    while (ci < cands.length) {
      val code = cands(ci)
      val sym = t.symbols(code)
      if (pos + sym.length <= data.length) {
        var j = 1
        var ok = true
        while (ok && j < sym.length) { if (data(pos + j) != sym(j)) ok = false; j += 1 }
        if (ok) return (code, sym.length)
      }
      ci += 1
    }
    (-1, 0)
  }

  def compress(t: Table, data: Array[Byte]): Array[Byte] = {
    val w = new Bytes.Writer(data.length + 8)
    var pos = 0
    while (pos < data.length) {
      val (code, len) = longestMatch(t, data, pos)
      if (code >= 0) { w.putByte(code); pos += len }
      else { w.putByte(ESCAPE); w.putByte(data(pos) & 0xff); pos += 1 }
    }
    w.result()
  }

  def decompress(t: Table, enc: Array[Byte]): Array[Byte] = {
    val w = new Bytes.Writer(enc.length * 3)
    var pos = 0
    while (pos < enc.length) {
      val code = enc(pos) & 0xff
      pos += 1
      if (code == ESCAPE) { w.putByte(enc(pos) & 0xff); pos += 1 }
      else w.putBytes(t.symbols(code))
    }
    w.result()
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
