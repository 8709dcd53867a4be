package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * getOrCreate dedups across suites).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Total task inputMetrics.bytesRead across `body`'s jobs. Parquet's
    * Hadoop vectored IO reads data pages through positioned range reads
    * that bypass the FileSystem thread statistics feeding bytesRead
    * (only footer reads get counted) — disabled ONLY around each
    * measurement (the session is shared JVM-wide across suites).
    */
  protected def bytesRead(body: => Unit): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prior = conf.get("parquet.hadoop.vectored.io.enabled")
    conf.setBoolean("parquet.hadoop.vectored.io.enabled", false)
    val acc = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { acc.addAndGet(m.inputMetrics.bytesRead); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.graftshim.TestListenerShim.waitUntilEmpty(spark.sparkContext)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      if (prior == null) conf.unset("parquet.hadoop.vectored.io.enabled")
      else conf.set("parquet.hadoop.vectored.io.enabled", prior)
    }
    acc.get()
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
