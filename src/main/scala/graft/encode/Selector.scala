package graft.encode

import graft.codecs._

/** Sampling-based codec auto-selector — the role blosc2's tuners play
  * (STUNE/BTUNE, python-blosc2 `__init__.py:188-198`: "can select
  * different codecs/filters for different chunks"), and the same
  * measured-cost-model pattern as the reference's gather-vs-scan
  * planner constants (`ctable_indexing.py:238-242`).
  *
  * For each column chunk: take a deterministic sample, trial-encode it
  * under each candidate plan, and pick the plan minimizing
  * `sampleCBytes + timeWeight * nanos`. Deterministic for a given chunk
  * (no wall-clock in the cost by default), so Spark task retries
  * produce identical output.
  */
object Selector {

  /** Fraction of chunk rows sampled for trial encodes (min/max bounds). */
  val SAMPLE_MIN = 256
  val SAMPLE_MAX = 4096

  val ZSTD_LEVEL = 3

  def candidatesFor(vec: ColVec): Seq[Plan] = vec match {
    case v: LongVec =>
      if (isConst(v)) Seq(Plan(Method.CONST, Entropy.NONE))
      else Seq(
        Plan(Method.RLE, Entropy.NONE),
        Plan(Method.DELTA_PACK, Entropy.NONE),
        Plan(Method.FOR_PACK, Entropy.NONE),
        Plan(Method.DELTA_PACK, Entropy.ZSTD, ZSTD_LEVEL),
        Plan(Method.PLAIN, Entropy.ZSTD, ZSTD_LEVEL)
      )
    case v: DoubleVec =>
      if (isConstD(v)) Seq(Plan(Method.CONST, Entropy.NONE))
      else Seq(
        Plan(Method.SHUFFLE, Entropy.ZSTD, ZSTD_LEVEL),
        Plan(Method.SHUFFLE, Entropy.LZ4),
        Plan(Method.PLAIN, Entropy.ZSTD, ZSTD_LEVEL)
      )
    case v: BinVec =>
      if (isConstB(v)) Seq(Plan(Method.CONST, Entropy.NONE))
      else {
        val card = sampleCardinality(v)
        val base =
          if (card.lowCardinality)
            Seq(
              Plan(Method.DICT, Entropy.ZSTD, ZSTD_LEVEL),
              Plan(Method.DICT, Entropy.NONE),
              Plan(Method.PLAIN, Entropy.ZSTD, ZSTD_LEVEL)
            )
          else
            Seq(
              Plan(Method.FSST, Entropy.ZSTD, ZSTD_LEVEL),
              Plan(Method.PLAIN, Entropy.ZSTD, ZSTD_LEVEL),
              Plan(Method.PLAIN, Entropy.LZ4)
            )
        base
      }
  }

  /** Pick the best plan for this chunk by trial-encoding a sample. */
  def choose(vec: ColVec): Plan = {
    val cands = candidatesFor(vec)
    if (cands.length == 1) return cands.head
    val s = sampleVec(vec)
    var best: Plan = null
    var bestCost = Long.MaxValue
    cands.foreach { p =>
      val cost =
        try ChunkCodec.encode(s, p).length.toLong
        catch { case _: Throwable => Long.MaxValue }
      if (cost < bestCost) { bestCost = cost; best = p }
    }
    if (best == null) Plan(Method.PLAIN, Entropy.ZSTD, ZSTD_LEVEL) else best
  }

  /** Deterministic strided sample of the chunk. */
  def sampleVec(vec: ColVec): ColVec = {
    val n = vec.n
    val target = math.min(SAMPLE_MAX, math.max(SAMPLE_MIN, n / 16))
    if (n <= target) return vec
    val step = n.toDouble / target
    vec match {
      case v: LongVec =>
        val out = new Array[Long](target)
        val vl = pickValidity(v.validity, n, target, step)
        var i = 0
        while (i < target) { out(i) = v.values((i * step).toInt); i += 1 }
        LongVec(out, vl)
      case v: DoubleVec =>
        val out = new Array[Double](target)
        val vl = pickValidity(v.validity, n, target, step)
        var i = 0
        while (i < target) { out(i) = v.values((i * step).toInt); i += 1 }
        DoubleVec(out, vl)
      case v: BinVec =>
        val out = new Array[Array[Byte]](target)
        val vl = pickValidity(v.validity, n, target, step)
        var i = 0
        while (i < target) { out(i) = v.values((i * step).toInt); i += 1 }
        BinVec(out, vl)
    }
  }

  private def pickValidity(validity: Array[Boolean], n: Int, target: Int, step: Double): Array[Boolean] = {
    if (validity == null) return null
    val out = new Array[Boolean](target)
    var i = 0
    while (i < target) { out(i) = validity((i * step).toInt); i += 1 }
    out
  }

  final case class CardInfo(distinct: Int, sampled: Int) {
    def lowCardinality: Boolean = distinct.toDouble <= math.max(16.0, sampled * 0.25)
  }

  def sampleCardinality(v: BinVec): CardInfo = {
    val n = v.n
    val target = math.min(1024, n)
    if (target == 0) return CardInfo(0, 0)
    val step = math.max(1, n / target)
    val seen = new scala.collection.mutable.HashSet[String]()
    var i = 0
    var sampled = 0
    while (i < n) {
      val x = v.values(i)
      if (x != null) seen += new String(x, java.nio.charset.StandardCharsets.ISO_8859_1)
      sampled += 1
      i += step
    }
    CardInfo(seen.size, sampled)
  }

  private def isConst(v: LongVec): Boolean = {
    if (v.n == 0) return false
    if (v.validity != null) return false
    val h = v.values(0)
    var i = 1
    while (i < v.n) { if (v.values(i) != h) return false; i += 1 }
    true
  }

  private def isConstD(v: DoubleVec): Boolean = {
    if (v.n == 0) return false
    if (v.validity != null) return false
    val h = java.lang.Double.doubleToRawLongBits(v.values(0))
    var i = 1
    while (i < v.n) { if (java.lang.Double.doubleToRawLongBits(v.values(i)) != h) return false; i += 1 }
    true
  }

  private def isConstB(v: BinVec): Boolean = {
    if (v.n == 0) return false
    if (v.validity != null) return false
    val h = v.values(0)
    var i = 1
    while (i < v.n) {
      if (!java.util.Arrays.equals(v.values(i), h)) return false
      i += 1
    }
    true
  }
}
