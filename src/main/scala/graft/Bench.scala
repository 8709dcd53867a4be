package graft

import graft.corpus.Corpus
import graft.encode.TableCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR plus the
  * north-rule encode/decode throughput on the synthetic corpus, printed
  * as ONE JSON line. `graft.ScalingBench` produces the N-vs-4N evidence
  * for BENCH/BASELINE.md.
  */
object Bench {

  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Encode+decode throughput over a deterministic synthetic corpus.
    * Input is cached+materialized first so the clock sees codec work,
    * not the generator.
    */
  def corpusBench(spark: SparkSession, nRows: Long, nParts: Int): Map[String, Double] = {
    val corpus = Corpus.generate(spark, nRows, nParts).toDF().cache()
    val nBytes = corpus.select(
      sum(length(col("content")) + length(col("repo")) + length(col("path")) +
        length(col("commit")) + length(col("lang")))).head().getLong(0)

    val (blocks, encSec) = time {
      val b = TableCodec.encode(corpus).cache()
      b.count()
      b
    }
    val cBytes = blocks.flatMap(_.cols.map(_.cBytes))(org.apache.spark.sql.Encoders.scalaLong)
      .agg(sum("value")).head().getLong(0)

    val (_, decSec) = time {
      TableCodec.decode(blocks, corpus.schema)
        .select(sum(length(col("content")))).head()
    }
    val (bad, verSec) = time {
      TableCodec.verify(blocks).filter(v => !v.ok).count()
    }
    require(bad == 0, s"verify found $bad mismatching chunks")
    blocks.unpersist()
    corpus.unpersist()
    Map(
      "corpus_rows" -> nRows.toDouble,
      "corpus_gb" -> nBytes / 1e9,
      "encode_sec" -> encSec,
      "encode_gbps" -> nBytes / 1e9 / encSec,
      "decode_sec" -> decSec,
      "decode_gbps" -> nBytes / 1e9 / decSec,
      "verify_sec" -> verSec,
      "ratio" -> nBytes.toDouble / cBytes
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "200000").toLong
    val spark = session(cpus)

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = queries.map { case (name, fn) =>
      val (_, sec) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      }
      name -> sec
    }

    val corpus = corpusBench(spark, benchRows, math.max(4, cpus.toInt))

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val extra = corpus.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.4f""" }.mkString(",")
    val total = results.map(_._2).sum + corpus("encode_sec")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,$extra,"cpus":"$cpus","sf":"$sfDir"}""")
    spark.stop()
  }
}
