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
