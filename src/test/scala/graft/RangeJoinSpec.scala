package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Range join: inclusive boundary semantics, exactly-once overlap pairs
  * vs a brute-force cross join, the fail-loud interval cap, and the
  * equi-join (never nested-loop) plan shape.
  */
class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("point-in-interval: inclusive bounds, cross-bucket matches, empty intervals drop") {
    val points = Seq((1L, 10L), (2L, 15L), (3L, 20L), (4L, 99L), (5L, -3L))
      .toDF("pid", "v")
    val ivals = Seq(
      (100L, 10L, 20L),   // matches 10 (lo edge), 15, 20 (hi edge)
      (101L, 14L, 16L),   // narrow, inside one bucket
      (102L, -5L, -1L),   // negative domain
      (103L, 50L, 40L)    // hi < lo: matches nothing
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi",
        bucketWidth = 8L, rightPrefix = "i_")
      .select("pid", "i_iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 100L), (2L, 101L), (5L, 102L)))
  }

  test("point-in-interval honors equi-keys") {
    val points = Seq(("a", 5L, 1L), ("b", 5L, 2L)).toDF("k", "v", "pid")
    val ivals = Seq(("a", 0L, 10L, 7L)).toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi",
        bucketWidth = 4L, keys = Seq("k"), rightPrefix = "i_")
      .select("pid").as[Long].collect().toSeq
    assert(out == Seq(1L), "key 'b' must not match key 'a' intervals")
  }

  test("interval-overlap matches a brute-force cross join exactly once per pair") {
    val rnd = new scala.util.Random(7)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val lo = rnd.nextInt(200).toLong
      (s"$tag$i", lo, lo + rnd.nextInt(30).toLong)
    }.toDF("id", "lo", "hi")
    val a = mk(60, "a")
    val b = mk(60, "b")
    val got = RangeJoin.intervalOverlap(a, b, "lo", "hi", "lo", "hi", bucketWidth = 16L)
      .select("id", "r_id").as[(String, String)].collect().toList
    val want = a.as("x").crossJoin(b.as("y"))
      .filter($"x.lo" <= $"y.hi" && $"y.lo" <= $"x.hi")
      .select($"x.id", $"y.id").as[(String, String)].collect().toList
    assert(got.size == got.toSet.size, "a pair must be emitted exactly once")
    assert(got.toSet == want.toSet,
      s"missing=${(want.toSet -- got.toSet).take(5)} extra=${(got.toSet -- want.toSet).take(5)}")
  }

  test("an interval spanning more than the bucket cap fails loudly") {
    val points = Seq((1L, 5L)).toDF("pid", "v")
    val ivals = Seq((1L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] { // SparkRuntimeException (USER_RAISED_EXCEPTION)
      RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi",
        bucketWidth = 2L, maxBucketsPerInterval = 64, rightPrefix = "i_").count()
    }
    assert(e.getMessage.contains("raise bucketWidth"), e.getMessage)
  }

  test("plan: shuffled equi-join on the bucket, never a nested loop") {
    val points = Seq((1L, 10L)).toDF("pid", "v")
    val ivals = Seq((1L, 0L, 20L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", bucketWidth = 8L,
        rightPrefix = "i_")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }
}
