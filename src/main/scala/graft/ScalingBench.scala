package graft

import graft.bench.Baseline
import graft.corpus.Corpus
import graft.encode.TableCodec
import org.apache.spark.sql.functions._

/** N-vs-4N scaling + blosc2-baseline evidence for BENCH/BASELINE.md
  * (the sandbox stand-in for two cluster sizes, per the north rule: run
  * the same job at two parallelism levels on identical input and report
  * throughput at both plus the scaling efficiency).
  *
  * Usage: runMain graft.ScalingBench [nRows] [lowCpus] [highCpus]
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(400000L)
    val low = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val high = args.drop(2).headOption.map(_.toInt).getOrElse(32)

    def runAt(cpus: Int): Map[String, Double] = {
      val spark = Bench.session(cpus.toString)
      // partition count fixed to the HIGH level so both runs process the
      // identical partitioning (same work, different parallelism)
      val res = Bench.corpusBench(spark, nRows, high * 2)
      spark.stop()
      res
    }

    // measure the blosc2-default-equivalent baseline once (size only)
    val sBase = Bench.session(high.toString)
    val corpus = Corpus.generate(sBase, nRows, high * 2).toDF().cache()
    corpus.count()
    val base = Baseline.measure(corpus)
    val blocks = TableCodec.encode(corpus).cache()
    val ours = blocks.flatMap(b => b.cols.map(c => (c.name, c.nBytes, c.cBytes)))(
        org.apache.spark.sql.Encoders.product[(String, Long, Long)])
      .toDF("col", "n", "c").groupBy("col").sum("n", "c").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    println("| column | raw bytes | blosc2-default bytes | graft bytes | graft vs blosc2 |")
    println("|---|---|---|---|---|")
    val cols = ours.keys.toSeq.sorted
    cols.foreach { c =>
      val (n, ourC) = ours(c)
      val baseC = base(c)._2
      println(f"| $c | $n | $baseC | $ourC | ${baseC.toDouble / ourC}%.2fx |")
    }
    val totalOur = ours.values.map(_._2).sum
    val totalBase = base.values.map(_._2).sum
    val totalN = ours.values.map(_._1).sum
    println(f"| TOTAL | $totalN | $totalBase | $totalOur | ${totalBase.toDouble / totalOur}%.2fx |")
    blocks.unpersist(); corpus.unpersist(); sBase.stop()

    val rLow = runAt(low)
    val rHigh = runAt(high)
    val eff = (rHigh("encode_gbps") / rLow("encode_gbps")) / (high.toDouble / low)
    println(f"""{"scaling":{"nRows":$nRows,"lowCpus":$low,"highCpus":$high,""" +
      f""""encodeGBpsLow":${rLow("encode_gbps")}%.4f,"encodeGBpsHigh":${rHigh("encode_gbps")}%.4f,""" +
      f""""decodeGBpsLow":${rLow("decode_gbps")}%.4f,"decodeGBpsHigh":${rHigh("decode_gbps")}%.4f,""" +
      f""""speedup":${rHigh("encode_gbps") / rLow("encode_gbps")}%.3f,"efficiency":$eff%.3f,""" +
      f""""ratio":${rHigh("ratio")}%.3f,"blosc2SizeRatio":${totalBase.toDouble / totalOur}%.3f}}""")
  }
}
