package graft.skew

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (the north rule's "salting and
  * repartitioning hot languages/repos at 10^12-file scale").
  *
  * The reference is single-machine and has no skew story (SURVEY.md
  * §4.2); this is Spark-native design: measure per-key weight on a
  * sample, give each key a salt domain proportional to its weight, and
  * repartition on (key, salt). Hot keys fan out over many partitions;
  * cold keys stay on one. The weights table is tiny and broadcast.
  */
object Skew {

  val SALT_COL = "__graft_salt"

  /** Per-key byte weights measured on a sample (exact for low-card keys
    * like lang; for high-card keys like repo the sample bounds cost).
    */
  def keyWeights(df: DataFrame, keyCol: String, weightExpr: Column,
                 sampleFraction: Double = 1.0): DataFrame = {
    val base = if (sampleFraction < 1.0) df.sample(withReplacement = false, sampleFraction, 42L) else df
    base.groupBy(col(keyCol)).agg(sum(weightExpr).as("weight"))
  }

  /** Repartition df over `targetPartitions` so that each key's share of
    * partitions is proportional to its byte weight (min 1). The salt is
    * a deterministic hash of the salt-source columns, so retries place
    * rows identically.
    */
  def saltedRepartition(
      df: DataFrame,
      keyCol: String,
      weightExpr: Column,
      saltSourceCols: Seq[String],
      targetPartitions: Int,
      sampleFraction: Double = 1.0
  ): DataFrame = {
    val weights = keyWeights(df, keyCol, weightExpr, sampleFraction)
    val total = weights.agg(sum(col("weight"))).head().getLong(0).toDouble
    val salts = weights.withColumn(
      "__graft_nsalts",
      greatest(lit(1), least(lit(targetPartitions),
        round(col("weight") / lit(total) * lit(targetPartitions)).cast("int"))))
      .select(col(keyCol), col("__graft_nsalts"))
    df.join(broadcast(salts), Seq(keyCol), "left")
      .withColumn(SALT_COL,
        pmod(xxhash64(saltSourceCols.map(col): _*), coalesce(col("__graft_nsalts"), lit(1))).cast("int"))
      .repartition(targetPartitions, col(keyCol), col(SALT_COL))
      .drop("__graft_nsalts", SALT_COL)
  }

  /** Max-over-mean bytes per partition — the skew measurement used in
    * tests and benchmarks (1.0 = perfectly balanced).
    */
  def partitionImbalance(df: DataFrame, byteExpr: Column): Double = {
    val sizes = df.select(byteExpr.as("b"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(sum("b").as("bytes"))
      .collect().map(_.getLong(1))
    if (sizes.isEmpty) 1.0
    else sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
  }
}
