package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps > `gapUs` (the classic clickstream/telemetry
  * operator; the streaming twin is Structured Streaming's session
  * window, streaming/StreamingEncode.scala covers the watermarked
  * path).
  *
  * Spark-first shape: one shuffle on the key, then two stacked per-key
  * ordered window passes — `lag` marks session starts (gap from the
  * previous event), a running sum turns the marks into session ordinals
  * (the standard gaps-and-islands construction, fully expressible in
  * windowed SQL — which is exactly how the oracle recomputes it). No
  * state beyond the window sort; hot keys serialize per key like every
  * ordered window (sliced AsOf shows the salting escape hatch).
  *
  * Ordering ties on (key, ts) are broken by `tieCol` so the ordinal
  * assignment is deterministic and engine-independent.
  */
object Sessionize {

  private def micros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case TimestampType    => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case other => throw new IllegalArgumentException(s"ts column '$c' has type $other")
  }

  /** Adds `session` (0-based per-key session ordinal) and `gap_us`
    * (micros since the key's previous event; null on the first).
    */
  def assign(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
             gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val withGap = events
      .withColumn("gap_us", micros(events, tsCol) - lag(micros(events, tsCol), 1).over(w))
    withGap.withColumn("session",
      sum(when(col("gap_us").isNull || col("gap_us") > lit(gapUs), 1L).otherwise(0L))
        .over(w) - lit(1L))
  }

  /** Per-session summary: events, span, value sum — one row per
    * (key, session).
    */
  def summary(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
              gapUs: Long, valueCol: String): DataFrame =
    assign(events, keyCol, tsCol, tieCol, gapUs)
      .groupBy(col(keyCol), col("session"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(micros(events, tsCol)) - min(micros(events, tsCol))).as("span_us"),
        sum(col(valueCol)).as("value_sum"))
}
