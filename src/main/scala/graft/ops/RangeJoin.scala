package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range joins (point-in-interval and interval-overlap) as bucketized
  * equi-joins — an operator family Spark itself would plan as a
  * BroadcastNestedLoopJoin (O(n·m) compares, broadcast-sized right) the
  * moment the condition is a pair of inequalities.
  *
  * Spark-first shape: quantize the range dimension into fixed-width
  * buckets. A point owns exactly one bucket; an interval is exploded to
  * the buckets it covers (span/width + 1 rows — bounded, fail-loud cap).
  * The join becomes a plain shuffled equi-join on (keys…, bucket) with
  * the exact inequality as a residual join filter, so Catalyst plans a
  * SortMergeJoin/ShuffledHashJoin: both sides partition by bucket,
  * work is proportional to true candidate pairs, and the plan scales to
  * 100 TB the way any equi-join does. Interval-overlap joins explode
  * BOTH sides and dedup match multiplicity for free by keeping only the
  * bucket that contains the overlap's start (`greatest(lo_l, lo_r)`) —
  * no `distinct` shuffle.
  *
  * Bucket width is the one tuning knob: too narrow inflates the
  * exploded side (replication = span/width), too wide inflates the
  * residual-filter miss rate. Set it near the TYPICAL interval span so
  * replication stays ~2 and selectivity stays high; intervals longer
  * than `maxBucketsPerInterval` buckets raise instead of silently
  * exploding the shuffle.
  */
object RangeJoin {

  /** Normalize the range dimension to a long: days for dates, micros
    * for timestamps, value for integrals. `bucketWidth` is expressed in
    * these units.
    */
  private def toLong(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case DateType      => unix_date(col(c)).cast("long")
    case TimestampType => unix_micros(col(c))
    // NTZ wall-clock → micros via the session zone (UTC at every graft
    // entry point); the mapping only needs to be consistent across both
    // join sides, which a single session guarantees
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case _: NumericType => col(c).cast("long")
    case other => throw new IllegalArgumentException(
      s"range-join column '$c' has unsupported type $other (need date/timestamp/numeric)")
  }

  /** Floor-division bucket id, exact for negatives (pmod ≥ 0) and for
    * the full timestamp-micros magnitude (the numerator is an exact
    * multiple of w and the integral quotient < 2^53, so the IEEE
    * division is exact before the cast).
    */
  private def bucket(v: Column, w: Long): Column =
    ((v - pmod(v, lit(w))) / lit(w)).cast("long")

  /** All buckets an interval [lo, hi] covers, with a fail-loud cap —
    * a pathological interval (bad data, width set orders of magnitude
    * too small) raises instead of materializing an unbounded explode.
    */
  private def intervalBuckets(lo: Column, hi: Column, w: Long, cap: Int): Column = {
    val n = bucket(hi, w) - bucket(lo, w) + lit(1L)
    when(n > lit(cap.toLong),
      raise_error(concat(
        lit(s"range-join: interval spans "), n,
        lit(s" buckets (> cap $cap) — raise bucketWidth ($w) or split the interval"))))
      .otherwise(sequence(bucket(lo, w), bucket(hi, w)))
  }

  private def requireDisjoint(leftCols: Seq[String], rightCols: Seq[String]): Unit = {
    val dup = leftCols.toSet.intersect(rightCols.toSet)
    require(dup.isEmpty,
      s"range-join output would duplicate columns ${dup.mkString(", ")} — set rightPrefix")
  }

  /** Inner join of `points` rows to every `intervals` row whose
    * [loCol, hiCol] contains pointCol (inclusive both ends), optionally
    * also matching on equi-`keys` (same name both sides). Right-side
    * columns are emitted under `rightPrefix`. Intervals with hi < lo
    * match nothing. Left-outer composition: anti-join the result's left
    * ids back against `points`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      rightPrefix: String = "",
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rOut = intervals.columns.toSeq.map(rightPrefix + _)
    requireDisjoint(points.columns.toSeq, rOut)

    val l = points
      .withColumn("_gp", toLong(points, pointCol))
      .withColumn("_glb", bucket(col("_gp"), bucketWidth))
    val rBase = intervals
      .withColumn("_glo", toLong(intervals, loCol))
      .withColumn("_ghi", toLong(intervals, hiCol))
      .filter(col("_glo") <= col("_ghi"))
      .withColumn("_grb",
        explode(intervalBuckets(col("_glo"), col("_ghi"), bucketWidth, maxBucketsPerInterval)))
    val r = rBase.select(
      intervals.columns.toSeq.map(c => col(c).as(rightPrefix + c)) ++
        Seq(col("_glo"), col("_ghi"), col("_grb")): _*)

    val cond = (keys.map(k => l(k) === r(rightPrefix + k)) ++ Seq(
      col("_glb") === col("_grb"),
      col("_gp") >= col("_glo"), col("_gp") <= col("_ghi"))).reduce(_ && _)
    l.join(r, cond, "inner")
      .select((points.columns.toSeq ++ rOut).map(col): _*)
  }

  /** Inner join of interval pairs that overlap (touching endpoints
    * count): left [lLo, lHi] × right [rLo, rHi] with
    * lLo <= rHi && rLo <= lHi, optionally under equi-`keys`. Each
    * overlapping pair is emitted exactly ONCE even though the pair
    * shares many buckets: only the bucket holding the overlap start
    * (`greatest(lo_l, lo_r)` — a bucket both exploded sides contain by
    * construction) produces the match, so no dedup shuffle is needed.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      rightPrefix: String = "r_",
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rOut = right.columns.toSeq.map(rightPrefix + _)
    requireDisjoint(left.columns.toSeq, rOut)

    def exploded(df: DataFrame, loC: String, hiC: String, loN: String, hiN: String,
                 bN: String): DataFrame =
      df.withColumn(loN, toLong(df, loC))
        .withColumn(hiN, toLong(df, hiC))
        .filter(col(loN) <= col(hiN))
        .withColumn(bN,
          explode(intervalBuckets(col(loN), col(hiN), bucketWidth, maxBucketsPerInterval)))

    val l = exploded(left, lLoCol, lHiCol, "_gllo", "_glhi", "_glb")
    val rBase = exploded(right, rLoCol, rHiCol, "_grlo", "_grhi", "_grb")
    val r = rBase.select(
      right.columns.toSeq.map(c => col(c).as(rightPrefix + c)) ++
        Seq(col("_grlo"), col("_grhi"), col("_grb")): _*)

    val cond = (keys.map(k => l(k) === r(rightPrefix + k)) ++ Seq(
      col("_glb") === col("_grb"),
      col("_gllo") <= col("_grhi"), col("_grlo") <= col("_glhi"),
      // multiplicity kill: only the overlap-start bucket emits the pair
      col("_glb") === bucket(greatest(col("_gllo"), col("_grlo")), bucketWidth))).reduce(_ && _)
    l.join(r, cond, "inner")
      .select((left.columns.toSeq ++ rOut).map(col): _*)
  }
}
