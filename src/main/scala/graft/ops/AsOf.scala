package graft.ops

import org.apache.spark.sql.DataFrame
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
  * caveat every per-key window shares); salting by time range with a
  * boundary hand-off is the escape hatch if a single key dominates.
  *
  * Determinism: right rows tying on (key, ts) resolve to the LARGEST
  * (ts, vals...) struct (the window sorts by the payload as the final
  * key). Equal left/right timestamps MATCH — inclusive on both
  * directions, like `merge_asof(allow_exact_matches=True)`.
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
    require(direction == "backward" || direction == "forward", s"bad direction '$direction'")
    require(keys.nonEmpty && rightVals.nonEmpty)
    val backward = direction == "backward"
    // at equal ts the right row must sit on the PROBE side of the frame
    // edge: before left rows for backward, after them for forward
    val (lSide, rSide) = if (backward) (1, 0) else (0, 1)
    val lPay = struct(left.columns.toSeq.map(col): _*).as("_l")
    val rPay = struct(col(rightTs).cast("timestamp").as("_rt") +: rightVals.map(col): _*).as("_r")
    val l2 = left.select(keys.map(col) ++
      Seq(col(leftTs).cast("timestamp").as("_t"), lit(lSide).as("_s"), lPay): _*)
    val r2 = right.select(keys.map(col) ++
      Seq(col(rightTs).cast("timestamp").as("_t"), lit(rSide).as("_s"), rPay): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("_t"), col("_s"), col("_r"))
    val carried =
      if (backward)
        last(col("_r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("_r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val matched = u.withColumn("_m", carried).filter(col("_s") === lSide)
    val delta =
      if (backward) unix_micros(col("_t")) - unix_micros(col("_m._rt"))
      else unix_micros(col("_m._rt")) - unix_micros(col("_t"))
    val ok = toleranceUs
      .map(tol => col("_m").isNotNull && delta <= tol)
      .getOrElse(col("_m").isNotNull)
    val m = when(ok, col("_m"))
    val outLeft = left.columns.toSeq.map(c => col(s"_l.`$c`").as(c))
    val outRight = m.getField("_rt").as(prefix + rightTs) +:
      rightVals.map(v => m.getField(v).as(prefix + v))
    matched.select(outLeft ++ outRight: _*)
  }
}
