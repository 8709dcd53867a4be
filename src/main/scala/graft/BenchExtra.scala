package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement-only harness (guide §1): per-query wall time PLUS a
  * per-Spark-job breakdown (job id, description, duration) so the cost
  * of a slow query can be attributed to its individual driver-blocking
  * actions. Optionally dumps `.explain("formatted")` per query.
  *
  * Never part of the driver bench contract — Bench.scala is frozen;
  * this exists to produce the before/after evidence in
  * OPTIMIZATION_r06.md and plans/r06/.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.BenchExtra q1_agg dedup_embedding
  *   runMain graft.BenchExtra --plans plans/r06 --suffix before q1_agg ...
  *   runMain graft.BenchExtra --all          (every declared query)
  */
object BenchExtra {

  final class JobLog extends SparkListener {
    case class J(id: Int, desc: String, start: Long, var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(s: SparkListenerJobStart): Unit = {
      val desc = Option(s.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")
      jobs.put(s.jobId, J(s.jobId, desc, s.time))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId)
      if (j != null) j.end = e.time
    }
    def drain(): Seq[(Int, String, Double)] = {
      import scala.jdk.CollectionConverters._
      val out = jobs.values.asScala.toSeq.sortBy(_.id)
        .map(j => (j.id, j.desc, if (j.end > 0) (j.end - j.start) / 1e3 else -1.0))
      jobs.clear()
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var plansDir: Option[String] = None
    var suffix = "before"
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var all = false
    var repeat = 1
    def argAfter(flag: String): String = {
      require(i + 1 < args.length, s"$flag needs a value")
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(argAfter("--plans")); i += 2
        case "--suffix" => suffix = argAfter("--suffix"); i += 2
        case "--all" => all = true; i += 1
        case "--repeat" => repeat = argAfter("--repeat").toInt; i += 2
        case f if f.startsWith("--") =>
          throw new IllegalArgumentException(s"unknown flag $f")
        case q =>
          require(SparkEntry.queries.contains(q), s"unknown query '$q'")
          names += q; i += 1
      }
    }
    val spark = Bench.session(cpus)
    // same warmup as Bench so first-query numbers are comparable
    locally {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.count()
      graft.encode.TableCodec.encode(docs.limit(500)).count()
      graft.encode.TableCodec.decode(
        graft.encode.TableCodec.encode(docs.limit(200)), docs.schema).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    }
    val (_, storeBuildSec) = Bench.time(ops.Queries.prebuildStores(spark, sfDir))
    System.err.println(f"[extra] store_build_sec=$storeBuildSec%.2f")

    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    val qs =
      if (all) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> SparkEntry.queries(n))
    val results = qs.map { case (name, fn) =>
      plansDir.foreach { pd =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$pd/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
      }
      log.drain()
      val secs = (1 to repeat).map { r =>
        spark.sparkContext.setJobDescription(s"$name#$r")
        val (_, sec) = Bench.time(fn(spark, sfDir).count())
        if (r == 1) {
          log.drain().foreach { case (id, desc, s) =>
            System.err.println(f"[extra]   job $id%4d $s%7.3fs  $desc")
          }
        } else log.drain()
        sec
      }
      spark.sparkContext.setJobDescription(null)
      System.err.println(f"[extra] $name  ${secs.map(s => f"$s%.3f").mkString("/")}s")
      name -> secs.min
    }
    val js = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"extra":$js,"sf":"$sfDir","cpus":"$cpus"}""")
    spark.stop()
  }
}
