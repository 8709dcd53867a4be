package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** As-of join: backward/forward match rules, inclusive equal-ts match,
  * tolerance nulling, tie determinism, and the no-nested-loop plan shape.
  */
class AsOfSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
    (4L, 30L, ts("2024-01-01 09:00:00"))  // key with no right rows at all
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 09:30:00"), 1.0),
    (10L, ts("2024-01-01 10:00:00"), 2.0), // equal-ts: must match id=1 backward
    (10L, ts("2024-01-01 11:00:00"), 3.0),
    (20L, ts("2024-01-01 10:30:00"), 4.0)
  ).toDF("k", "t", "v")

  test("backward: latest right at-or-before, null when none") {
    val out = AsOf.join(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("id")
      .select("id", "asof_t", "asof_v")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), Option(r.get(2))))
    assert(out(0) == ((1L, Some("2024-01-01 10:00:00.0"), Some(2.0))), s"got ${out(0)}")
    assert(out(1) == ((2L, Some("2024-01-01 11:00:00.0"), Some(3.0))), s"got ${out(1)}")
    assert(out(2) == ((3L, None, None)), s"got ${out(2)}")
    assert(out(3) == ((4L, None, None)), s"got ${out(3)}")
  }

  test("forward: earliest right at-or-after; tolerance nulls far matches") {
    val out = AsOf.join(left, right, Seq("k"), "t", "t", Seq("v"),
        direction = "forward", toleranceUs = Some(90L * 60 * 1000000)) // 90 min
      .orderBy("id")
      .select("id", "asof_v")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    // id=1 at 10:00 -> equal-ts right 10:00 (v=2); id=2 at 12:00 -> none after
    // id=3 at 09:00 -> right 10:30 is 90min away: within tolerance (inclusive)
    assert(out(0) == ((1L, Some(2.0))), s"got ${out(0)}")
    assert(out(1) == ((2L, None)), s"got ${out(1)}")
    assert(out(2) == ((3L, Some(4.0))), s"got ${out(2)}")
    assert(out(3) == ((4L, None)), s"got ${out(3)}")
  }

  test("right ties on (key, ts) resolve to the largest payload, deterministically") {
    val tied = Seq(
      (10L, ts("2024-01-01 09:00:00"), 5.0),
      (10L, ts("2024-01-01 09:00:00"), 7.0)
    ).toDF("k", "t", "v")
    val out = AsOf.join(left.filter($"id" === 1), tied, Seq("k"), "t", "t", Seq("v"))
      .select("asof_v").head().getDouble(0)
    assert(out == 7.0, s"tie must take the largest (ts, vals) struct, got $out")
  }

  test("joinSliced ≡ join on randomized hot-key data, both directions, with tolerance") {
    val rnd = new scala.util.Random(11)
    def randTs(): Timestamp = // one hot key dominating, ts over ~3 days
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + rnd.nextInt(259200) * 1000L)
    def key(): Long = if (rnd.nextInt(4) > 0) 7L else rnd.nextInt(5).toLong
    val l = (1 to 800).map(i => (i.toLong, key(), randTs())).toDF("id", "k", "t")
    val r = (1 to 600).map(i => (key(), randTs(), rnd.nextInt(100).toDouble)).toDF("k", "t", "v")
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(2L * 3600 * 1000000))) {
      val plain = AsOf.join(l, r, Seq("k"), "t", "t", Seq("v"), dir, toleranceUs = tol)
        .collect().map(_.toString).sorted
      // slice width (1h) intentionally smaller than typical match gaps,
      // so MOST matches cross slice boundaries and exercise the carry
      val sliced = AsOf.joinSliced(l, r, Seq("k"), "t", "t", Seq("v"),
          sliceWidthUs = 3600L * 1000000, direction = dir, toleranceUs = tol)
        .collect().map(_.toString).sorted
      assert(plain.length == 800 && sliced.length == 800, s"$dir/$tol row counts")
      assert(plain.sameElements(sliced), {
        val d = plain.zip(sliced).find { case (a, b) => a != b }
        s"$dir tol=$tol first diff: $d"
      })
    }
  }

  test("joinSliced windows partition by (key, slice); the per-key pass only sees the timeline") {
    val plan = AsOf.joinSliced(left, right, Seq("k"), "t", "t", Seq("v"),
        sliceWidthUs = 3600L * 1000000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_slc"), s"expected slice-partitioned window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("plan: one window over the union — no nested-loop or cartesian join") {
    val plan = AsOf.join(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not plan a nested loop:\n$plan")
    assert(plan.contains("Window"), s"expected a window carry:\n$plan")
  }
}
