package graft

import graft.ops.Sessionize
import java.sql.Timestamp

/** Sessionization: gap-split ordinals, tie determinism, summary math. */
class SessionizeSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split at gaps > threshold; ordinals are 0-based per key") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 10:10:00"), 2.0),  // 10 min: same session
      (3L, 10L, ts("2024-01-01 11:30:00"), 3.0),  // 80 min: new session
      (4L, 10L, ts("2024-01-01 11:59:00"), 4.0),
      (5L, 20L, ts("2024-01-01 00:00:00"), 5.0)   // other key: own session 0
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Sessionize.assign(ev, "user_id", "ts", "event_id", gapUs = 30L * 60 * 1000000)
      .select("event_id", "session").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L), out.toString)
  }

  test("an exactly-threshold gap does NOT split (strictly-greater contract)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 0.0),
      (2L, 1L, ts("2024-01-01 10:30:00"), 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val sessions = Sessionize.assign(ev, "user_id", "ts", "event_id", gapUs = 30L * 60 * 1000000)
      .select("session").as[Long].collect().toSet
    assert(sessions == Set(0L))
  }

  test("equal timestamps order by the tie column, so ordinals are deterministic") {
    val ev = Seq(
      (2L, 1L, ts("2024-01-01 10:00:00"), 0.0),
      (1L, 1L, ts("2024-01-01 10:00:00"), 0.0),
      (3L, 1L, ts("2024-01-01 12:00:00"), 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Sessionize.assign(ev, "user_id", "ts", "event_id", gapUs = 60L * 60 * 1000000)
      .select("event_id", "gap_us").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty && out(2L).contains(0L), out.toString)
  }

  test("sliced assignment equals the plain one on a randomized hot-key stream, and spreads the hot key") {
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    // one hot user owns ~50% of events; deterministic RNG; values are
    // quarter-integers so every per-session double sum is binary-exact
    // (the equality below is EXACT, not tolerance-based)
    val rnd = new scala.util.Random(42)
    var t = 0L
    val rows = (1L to 4000L).map { i =>
      val user = if (rnd.nextBoolean()) 7L else 100L + rnd.nextInt(50)
      t += rnd.nextInt(40 * 60) + 1 // 1s..40min steps → plenty of >10min gaps
      (i, user, new Timestamp(1700000000000L + t * 1000L), rnd.nextInt(40) / 4.0)
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "value")
    val gapUs = 10L * 60 * 1000000
    val sliceUs = 6L * 3600 * 1000000 // ≫ gap, ≪ the hot key's multi-day span
    val plain = Sessionize.summary(ev, "user_id", "ts", "event_id", gapUs, "value")
      .orderBy("user_id", "session")
      .select("user_id", "session", "n_events", "span_us", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val sliced = Sessionize.summarySliced(ev, "user_id", "ts", "event_id", gapUs, "value", sliceUs)
      .orderBy("user_id", "session")
      .select("user_id", "session", "n_events", "span_us", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(plain == sliced, s"sliced summary diverged: ${plain.diff(sliced).take(3)}")
    // per-row assignment equivalence too (gap_us + session per event)
    val pa = Sessionize.assign(ev, "user_id", "ts", "event_id", gapUs)
      .select("event_id", "gap_us", "session").as[(Long, Option[Long], Long)].collect().toSet
    val sa = Sessionize.assignSliced(ev, "user_id", "ts", "event_id", gapUs, sliceUs)
      .select("event_id", "gap_us", "session").as[(Long, Option[Long], Long)].collect().toSet
    assert(pa == sa, s"sliced assign diverged: ${(pa -- sa).take(3)}")
    // the hot key's window work spreads across >1 task: its rows land
    // in multiple (key, slice) partitions of the sliced window stage
    val hotParts = Sessionize.assignSliced(ev, "user_id", "ts", "event_id", gapUs, sliceUs)
      .filter(col("user_id") === 7L)
      .select(spark_partition_id()).distinct().count()
    assert(hotParts > 1, s"hot key still serialized in $hotParts partition(s)")
  }

  test("summary counts, spans and sums per session") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.5),
      (2L, 1L, ts("2024-01-01 10:20:00"), 2.5),
      (3L, 1L, ts("2024-01-02 10:00:00"), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Sessionize.summary(ev, "user_id", "ts", "event_id",
        gapUs = 30L * 60 * 1000000, valueCol = "value")
      .orderBy("session")
      .select("session", "n_events", "span_us", "value_sum")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 20L * 60 * 1000000, 4.0), (1L, 1L, 0L, 4.0)), out.toString)
  }
}
