package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (pandas `merge_asof` / kdb `aj` analog — an operator Spark
  * has no native form of): for every left row, the single right row with
  * the closest timestamp at-or-before it (backward) or at-or-after it
  * (forward) within the same key, null when none — left-outer semantics,
  * optional tolerance.
  *
  * Spark-first shape: tag and UNION the two inputs, ONE shuffle on the
  * key, then a per-key ordered window carries the latest (backward:
  * `last(..., ignoreNulls)` over an unbounded-preceding frame) or next
  * (forward: `first` over an unbounded-following frame) right payload
  * onto each left row. No join explosion and no range-condition nested
  * loop: the cost is the per-key sort, the state is one carried struct,
  * so the plan survives any key cardinality and 100 TB of rows. One
  * pathological hot key serializes inside its window partition (the
  * caveat every per-key window shares); `joinSliced` is the escape
  * hatch — it salts the window by time slice and hands the carry across
  * slice boundaries through a tiny per-(key, slice) timeline.
  *
  * Determinism: right rows tying on (key, ts) resolve to the LARGEST
  * (ts, vals...) struct for backward and the SMALLEST for forward (the
  * window sorts by the payload as the final key). Equal left/right
  * timestamps MATCH — inclusive on both directions, like
  * `merge_asof(allow_exact_matches=True)`.
  */
object AsOf {

  /** Returns every left column plus `prefix`+rightTs (the matched
    * timestamp) and `prefix`+v for each v in rightVals; all-null when no
    * right row qualifies (or the match misses `toleranceUs`).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVals: Seq[String],
           direction: String = "backward", prefix: String = "asof_",
           toleranceUs: Option[Long] = None): DataFrame = {
    val p = Prep(left, right, keys, leftTs, rightTs, rightVals, direction)
    val u = p.l2.unionByName(p.r2, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("_t"), col("_s"), col("_r"))
    val carried =
      if (p.backward)
        last(col("_r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("_r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val matched = u.withColumn("_m", carried).filter(col("_s") === p.lSide)
    finish(matched, col("_m"), left, rightTs, rightVals, p.backward, prefix, toleranceUs)
  }

  /** `join` with the hot-key escape hatch: windows are partitioned by
    * (key, time-slice of `sliceWidthUs`), so one key's rows spread over
    * as many tasks as it spans slices instead of serializing in a
    * single window partition. Matches that cross a slice boundary are
    * restored by a carry pass over a per-(key, slice) TIMELINE — one
    * row per key×slice (the per-key window everyone fears now runs over
    * slice counts, not row counts). Output is identical to `join` —
    * AsOfSpec asserts equivalence on randomized data, both directions.
    *
    * Pick `sliceWidthUs` ≫ typical match distance (so most matches stay
    * in-slice) and ≪ hot-key span (so a hot key yields many slices);
    * with a tolerance, the tolerance itself is a natural width.
    */
  def joinSliced(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String, rightVals: Seq[String],
                 sliceWidthUs: Long,
                 direction: String = "backward", prefix: String = "asof_",
                 toleranceUs: Option[Long] = None): DataFrame = {
    require(sliceWidthUs > 0, "sliceWidthUs must be positive")
    val p = Prep(left, right, keys, leftTs, rightTs, rightVals, direction)
    def slc(c: Column): Column = {
      val m = unix_micros(c)
      ((m - pmod(m, lit(sliceWidthUs))) / lit(sliceWidthUs)).cast("long")
    }
    val u = p.l2.unionByName(p.r2, allowMissingColumns = true)
      .withColumn("_slc", slc(col("_t")))
    val kCols = keys.map(col)
    val base = Window.partitionBy(kCols :+ col("_slc"): _*)
      .orderBy(col("_t"), col("_s"), col("_r"))
    val local =
      if (p.backward)
        last(col("_r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("_r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val withLocal = u.withColumn("_ml", local).filter(col("_s") === p.lSide)

    // timeline: per (key, slice) the best right payload of that slice
    // (max = backward's latest/largest tie-break, min = forward's
    // earliest/smallest), plus every left slice so each gets a carry row
    val best: Column => Column = if (p.backward) max else min
    val rSlices = p.r2.withColumn("_slc", slc(col("_t")))
      .groupBy(kCols :+ col("_slc"): _*).agg(best(col("_r")).as("_rp"))
    val lSlices = p.l2.withColumn("_slc", slc(col("_t")))
      .select(kCols :+ col("_slc"): _*).distinct()
    val timeline = rSlices.unionByName(lSlices, allowMissingColumns = true)
      .groupBy(kCols :+ col("_slc"): _*).agg(best(col("_rp")).as("_rp"))
    val tw = Window.partitionBy(kCols: _*).orderBy(col("_slc"))
    val carryIn =
      if (p.backward)
        last(col("_rp"), ignoreNulls = true)
          .over(tw.rowsBetween(Window.unboundedPreceding, -1))
      else
        first(col("_rp"), ignoreNulls = true)
          .over(tw.rowsBetween(1, Window.unboundedFollowing))
    val carries = timeline.withColumn("_ci", carryIn)
      .select(kCols ++ Seq(col("_slc"), col("_ci")): _*)

    val joined = withLocal.join(carries, keys :+ "_slc", "left")
    finish(joined, coalesce(col("_ml"), col("_ci")),
      left, rightTs, rightVals, p.backward, prefix, toleranceUs)
  }

  /** Shared input normalization: tagged, payload-packed sides. At equal
    * ts the right row must sit on the PROBE side of the frame edge —
    * before left rows for backward, after them for forward.
    */
  private final case class Prep(left: DataFrame, right: DataFrame, keys: Seq[String],
                                leftTs: String, rightTs: String, rightVals: Seq[String],
                                direction: String) {
    require(direction == "backward" || direction == "forward", s"bad direction '$direction'")
    require(keys.nonEmpty && rightVals.nonEmpty)
    val backward: Boolean = direction == "backward"
    val (lSide, rSide) = if (backward) (1, 0) else (0, 1)
    val l2: DataFrame = left.select(keys.map(col) ++ Seq(
      col(leftTs).cast("timestamp").as("_t"), lit(lSide).as("_s"),
      struct(left.columns.toSeq.map(col): _*).as("_l")): _*)
    val r2: DataFrame = right.select(keys.map(col) ++ Seq(
      col(rightTs).cast("timestamp").as("_t"), lit(rSide).as("_s"),
      struct(col(rightTs).cast("timestamp").as("_rt") +: rightVals.map(col): _*).as("_r")): _*)
  }

  /** Tolerance gating + output projection from a frame holding `_l`,
    * `_t` and the matched payload expression.
    */
  private def finish(df: DataFrame, matchCol: Column, left: DataFrame,
                     rightTs: String, rightVals: Seq[String],
                     backward: Boolean, prefix: String,
                     toleranceUs: Option[Long]): DataFrame = {
    val withM = df.withColumn("_mm", matchCol)
    val delta =
      if (backward) unix_micros(col("_t")) - unix_micros(col("_mm._rt"))
      else unix_micros(col("_mm._rt")) - unix_micros(col("_t"))
    val ok = toleranceUs
      .map(tol => col("_mm").isNotNull && delta <= tol)
      .getOrElse(col("_mm").isNotNull)
    val m = when(ok, col("_mm"))
    val outLeft = left.columns.toSeq.map(c => col(s"_l.`$c`").as(c))
    val outRight = m.getField("_rt").as(prefix + rightTs) +:
      rightVals.map(v => m.getField(v).as(prefix + v))
    withM.select(outLeft ++ outRight: _*)
  }
}
