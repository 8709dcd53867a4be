package graft.bench

import graft.codecs._
import graft.corpus.Corpus
import graft.encode.Selector
import java.nio.charset.StandardCharsets.UTF_8

/** Single-threaded kernel microbenchmark (no Spark): where does an
  * encode core-second actually go? Run: runMain graft.bench.MicroBench
  */
object MicroBench {
  def timeMs[A](label: String, bytes: Long, reps: Int = 3)(f: => A): Unit = {
    var best = Long.MaxValue
    var i = 0
    while (i < reps) {
      val t0 = System.nanoTime()
      f
      best = math.min(best, System.nanoTime() - t0)
      i += 1
    }
    val ms = best / 1e6
    println(f"$label%-28s ${ms}%9.1f ms   ${bytes / 1e6 / (ms / 1000)}%8.1f MB/s")
  }

  def main(args: Array[String]): Unit = {
    val n = 4000
    println(s"generating $n docs...")
    val contents: Array[Array[Byte]] = Array.tabulate(n)(i =>
      Corpus.content(i.toLong * 17 + 3, "c").getBytes(UTF_8))
    val totalBytes = contents.map(_.length.toLong).sum
    println(f"total ${totalBytes / 1e6}%.1f MB, avg ${totalBytes / n} B/doc")
    val vec = BinVec(contents)

    // warmup everything once
    ChunkCodec.encode(vec, Plan(Method.FSST, Entropy.ZSTD, 3))
    ChunkCodec.encode(vec, Plan(Method.PLAIN, Entropy.ZSTD, 5))

    timeMs("selector.choose", totalBytes)(Selector.choose(vec))
    timeMs("fsst train only", totalBytes) {
      Fsst.train(vec)
    }
    val table = Fsst.train(vec)
    timeMs("fsst compress (no entropy)", totalBytes) {
      var i = 0
      while (i < n) { Fsst.compress(table, contents(i)); i += 1 }
    }
    timeMs("plain+zstd3 full", totalBytes)(ChunkCodec.encode(vec, Plan(Method.PLAIN, Entropy.ZSTD, 3)))
    timeMs("plain+zstd5 full", totalBytes)(ChunkCodec.encode(vec, Plan(Method.PLAIN, Entropy.ZSTD, 5)))
    timeMs("fsst+zstd3 full", totalBytes)(ChunkCodec.encode(vec, Plan(Method.FSST, Entropy.ZSTD, 3)))
    val fsstBlock = ChunkCodec.encode(vec, Plan(Method.FSST, Entropy.ZSTD, 3))
    val plainBlock = ChunkCodec.encode(vec, Plan(Method.PLAIN, Entropy.ZSTD, 5))
    println(f"sizes: fsst+z3=${fsstBlock.length / 1e6}%.2f MB plain+z5=${plainBlock.length / 1e6}%.2f MB raw=${totalBytes / 1e6}%.2f MB")
    timeMs("decode fsst+zstd3", totalBytes)(ChunkCodec.decode(fsstBlock))
    timeMs("decode plain+zstd5", totalBytes)(ChunkCodec.decode(plainBlock))
    timeMs("sha256 digestOf", totalBytes)(graft.encode.ColBuilder.digestOf(vec))
    timeMs("utf8 decode+encode", totalBytes) {
      var i = 0
      while (i < n) { new String(contents(i), UTF_8).getBytes(UTF_8); i += 1 }
    }
    timeMs("corpus gen", totalBytes) {
      var i = 0
      while (i < n) { Corpus.content(i.toLong * 17 + 3, "c"); i += 1 }
    }
  }
}
