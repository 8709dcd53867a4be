package graft.bench

import graft.corpus.Corpus
import com.github.luben.zstd.ZstdCompressCtx

/** Single-core A/B of zstd long-distance matching on a chunk-shaped
  * content body (the measurement behind Entropy's LDM_MIN_BYTES policy;
  * no Spark session — pure codec arithmetic).
  *
  *   runMain graft.bench.LdmProbe [mib] [dupFrac]
  *
  * `dupFrac` > 0 re-emits a previously seen file with that probability,
  * modeling the vendored/duplicated files a real source corpus carries
  * (exact-dup rate in public code corpora is typically 20-40%; the
  * synthetic corpus itself has none by construction).
  */
object LdmProbe {
  def main(args: Array[String]): Unit = {
    val mib = if (args.length > 0) args(0).toInt else 16
    val dupFrac = if (args.length > 1) args(1).toDouble else 0.0
    val sb = new java.lang.StringBuilder(mib << 21)
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    var id = 0L
    while (sb.length < (mib.toLong << 20)) {
      val h = Corpus.mix(999L ^ id)
      val c =
        if (dupFrac > 0 && seen.nonEmpty &&
          ((h >>> 11).toDouble / (1L << 53).toDouble) < dupFrac)
          seen(((h & 0x7fffffff) % seen.length).toInt)
        else {
          val s = Corpus.file(42L, id).content
          if (seen.length < 4096) seen += s
          s
        }
      sb.append(c)
      id += 1
    }
    val raw = sb.toString.getBytes("UTF-8")
    def run(level: Int, ldm: Boolean): (Int, Double) = {
      val c = new ZstdCompressCtx()
      c.setLevel(level)
      if (ldm) c.setLong(24)
      val t0 = System.nanoTime()
      val out = c.compress(raw)
      (out.length, (System.nanoTime() - t0) / 1e9)
    }
    run(3, ldm = false) // warmup
    println(f"body=${raw.length / 1e6}%.1f MB dupFrac=$dupFrac")
    for (lvl <- Seq(3, 5); l <- Seq(false, true)) {
      val (n, s) = run(lvl, l)
      println(f"  level=$lvl ldm=$l%-5s bytes=$n ratio=${raw.length.toDouble / n}%.3f ${raw.length / 1e6 / s}%.0f MB/s")
    }
  }
}
