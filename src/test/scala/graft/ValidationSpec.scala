package graft

import graft.encode.Validation
import graft.encode.Validation.Rule
import org.apache.spark.sql.functions._

/** Declarative ingest validation: single-pass vectorized constraint
  * checks with reference NULL semantics (nulls bypass constraints).
  */
class ValidationSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alice", 25, "en"),
    (2L, "bob", 17, "de"),       // age < 18
    (3L, "x", 200, "en"),        // name too short, age > 150
    (4L, null.asInstanceOf[String], 30, "fr"), // null name passes length rules
    (5L, "charlie", 40, "EN")    // lang pattern violation
  ).toDF("id", "name", "age", "lang").repartition(3)

  private val rules = Seq(
    Rule("age", ge = Some(18), le = Some(150)),
    Rule("name", minLength = Some(2), maxLength = Some(10)),
    Rule("lang", pattern = Some("[a-z]{2}")))

  test("report counts violations per rule with deterministic min example") {
    val byCol = Validation.report(df, rules).collect()
      .map(x => x.getString(0) -> ((x.getLong(2), Option(x.getString(3))))).toMap
    assert(byCol("age") == ((2L, Some("17"))))   // 17 and 200 violate; min "17" < "200" lexically
    assert(byCol("name") == ((1L, Some("x"))))   // null name does NOT violate
    assert(byCol("lang") == ((1L, Some("EN"))))
  }

  test("report is ONE Spark job regardless of rule count") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val cached = df.cache(); cached.count()
    spark.sparkContext.addSparkListener(l)
    try {
      Validation.report(cached, rules).collect()
      org.apache.spark.sql.graftshim.TestListenerShim.waitUntilEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    cached.unpersist()
    // one aggregate job over the data + at most one local job for the
    // tiny driver-side report frame
    assert(jobs.get() <= 2, s"expected a single data pass, saw ${jobs.get()} jobs")
  }

  test("validate throws naming every violated constraint; passes on clean data") {
    val e = intercept[IllegalArgumentException](Validation.validate(df, rules))
    assert(e.getMessage.contains("'age'") && e.getMessage.contains("ge=18.0"))
    assert(e.getMessage.contains("'lang'") && e.getMessage.contains("pattern="))
    Validation.validate(df.filter(col("id") === 1), rules) // no throw
  }

  test("empty input passes validation: zero violations, no NPE") {
    val empty = df.filter(col("id") < 0)
    Validation.validate(empty, rules) // must not throw
    val rep = Validation.report(empty, rules).collect()
    assert(rep.length == 3 && rep.forall(_.getLong(2) == 0L))
  }

  test("partition splits valid/violating without losing rows") {
    val (good, bad) = Validation.partition(df, rules)
    assert(good.count() + bad.count() == df.count())
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }
}
