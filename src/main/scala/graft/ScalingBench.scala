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
  * Each measurement runs in its OWN JVM (sbt runMain forks) so heap and
  * GC state cannot bleed between parallelism levels:
  *
  *   runMain graft.ScalingBench level <nRows> <cpus> <partitions>
  *   runMain graft.ScalingBench baseline <nRows> <partitions>
  *
  * `partitions` is held constant across levels so both process the
  * identical chunking — only the parallelism differs. Optional env
  * SPARK_GRAFT_MASTER=local-cluster[{N},1,3072] (+SPARK_HOME,
  * +SPARK_SCALA_VERSION) swaps thread-parallelism for real executor
  * JVMs.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = args.toList match {
    case "level" :: nRows :: cpus :: parts :: Nil =>
      val spark = Bench.session(cpus)
      val r = Bench.corpusBench(spark, nRows.toLong, parts.toInt)
      val gb = r("corpus_gb")
      println(f"""{"level":{"cpus":$cpus,"nRows":$nRows,"gb":$gb%.3f,""" +
        f""""encodeGBps":${r("encode_gbps")}%.4f,"decodeGBps":${r("decode_gbps")}%.4f,""" +
        f""""encodeSec":${r("encode_sec")}%.2f,"decodeSec":${r("decode_sec")}%.2f,"ratio":${r("ratio")}%.3f}}""")
      spark.stop()

    // In-JVM A/B of the decode row-emission paths (reused mutable row vs
    // allocate-per-row), interleaved so host noise hits both arms alike.
    case "decodeab" :: nRows :: cpus :: parts :: reps :: Nil =>
      val spark = Bench.session(cpus)
      val path = s"/tmp/graft-bench/corpus-$nRows-$parts.parquet"
      if (!new java.io.File(path).exists())
        Corpus.generate(spark, nRows.toLong, parts.toInt).toDF()
          .write.mode("overwrite").option("compression", "none").parquet(path)
      spark.conf.set("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
      val corpus = spark.read.parquet(path)
      val nBytes = corpus.select(
        sum(length(col("content")) + length(col("repo")) + length(col("path")) +
          length(col("commit")) + length(col("lang")))).head().getLong(0)
      val blocksPath = s"/tmp/graft-bench/blocks-ab-$nRows-$parts"
      if (!new java.io.File(blocksPath).exists())
        graft.encode.StoreLayout.write(TableCodec.encode(corpus),
          corpus.schema.fieldNames.toSeq, blocksPath)
      val blocks = graft.encode.StoreLayout.readBlocks(spark, blocksPath)
      def pass(): Double = Bench.time {
        TableCodec.decode(blocks, corpus.schema)
          .select(sum(length(col("content")))).head()
      }._2
      pass(); pass() // warmup both JIT profiles
      val times = collection.mutable.Map("reuse" -> List.empty[Double], "alloc" -> List.empty[Double])
      for (_ <- 1 to reps.toInt; arm <- Seq("reuse", "alloc")) {
        System.setProperty("graft.decode.reuseRow", (arm == "reuse").toString)
        System.setProperty("graft.decode.reuseBuf", (arm == "reuse").toString)
        times(arm) ::= pass()
      }
      System.clearProperty("graft.decode.reuseRow")
      System.clearProperty("graft.decode.reuseBuf")
      def stats(l: List[Double]) = f"best=${l.min}%.3fs med=${l.sorted.apply(l.size / 2)}%.3fs gbps=${nBytes / 1e9 / l.min}%.3f"
      println(s"""decode A/B over ${nBytes / 1e9} GB x ${reps} reps @ local[$cpus]:""")
      println(s"  reuse-row : ${stats(times("reuse"))}")
      println(s"  alloc-row : ${stats(times("alloc"))}")
      spark.stop()

    // engine-vs-baseline on the 25%-vendored-dup corpus (the LDM regime)
    case "dup" :: nRows :: parts :: Nil =>
      val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      spark.conf.set("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
      val r = Bench.dupCorpusBench(spark, nRows.toLong, parts.toInt)
      println(r.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.4f""" }
        .mkString("{", ",", "}"))
      spark.stop()

    case "baseline" :: nRows :: parts :: Nil =>
      val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      val corpus = Corpus.generate(spark, nRows.toLong, parts.toInt).toDF().cache()
      corpus.count()
      val base = Baseline.measure(corpus)
      val blocks = TableCodec.encode(corpus).cache()
      val ours = blocks.flatMap(b => b.cols.map(c => (c.name, c.nBytes, c.cBytes)))(
          org.apache.spark.sql.Encoders.product[(String, Long, Long)])
        .toDF("col", "n", "c").groupBy("col").sum("n", "c").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      println("| column | raw bytes | blosc2-default bytes | graft bytes | graft vs blosc2 |")
      println("|---|---|---|---|---|")
      ours.keys.toSeq.sorted.foreach { c =>
        val (n, ourC) = ours(c)
        val baseC = base(c)._2
        println(f"| $c | $n | $baseC | $ourC | ${baseC.toDouble / ourC}%.2fx |")
      }
      val totalOur = ours.values.map(_._2).sum
      val totalBase = base.values.map(_._2).sum
      val totalN = ours.values.map(_._1).sum
      println(f"| TOTAL | $totalN | $totalBase | $totalOur | ${totalBase.toDouble / totalOur}%.2fx |")
      println(f"""{"baseline":{"nRows":$nRows,"rawBytes":$totalN,"blosc2Bytes":$totalBase,"graftBytes":$totalOur,"sizeRatio":${totalBase.toDouble / totalOur}%.4f}}""")
      blocks.unpersist(); corpus.unpersist(); spark.stop()

    case other =>
      System.err.println(s"usage: level <nRows> <cpus> <partitions> | baseline <nRows> <partitions>; got $other")
      sys.exit(2)
  }
}
