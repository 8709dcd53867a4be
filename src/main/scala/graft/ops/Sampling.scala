package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixture knob of a
  * training pipeline ("keep 100% of en, 12.5% of zh, …") implemented
  * as a pure filter, NOT an RNG sample: membership is a function of the
  * row id alone, so the sample is reproducible across runs, engines,
  * partitionings and retries (rerunning a failed task keeps the same
  * rows — `df.sample()`'s per-partition RNG does not survive a
  * repartition), and composable (a 50% sample of a 50% sample with
  * different salts is an independent 25%).
  *
  * The keep decision is `mix(id) mod 1000 < rate‰(stratum)` with a
  * multiply-xorshift mixer — plain 64-bit arithmetic that any engine
  * reproduces exactly (the oracle recomputes it in SQL), and a single
  * codegen'd predicate Spark pushes into the scan: sampling 100 TB
  * reads each row once and shuffles nothing.
  */
object Sampling {

  /** Knuth multiplicative constant; one xorshift round decorrelates the
    * low bits from sequential ids before the mod-1000 bucket.
    */
  def mix(id: Column): Column = {
    val h = id.cast("long") * lit(2654435761L)
    pmod(h.bitwiseXOR(shiftright(h, 13)), lit(1000L))
  }

  /** Keep rows where the stratum's per-mille rate admits the id's mix
    * bucket. Strata absent from `ratesPerMille` use `defaultPerMille`.
    */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 ratesPerMille: Map[String, Int], defaultPerMille: Int = 0): DataFrame = {
    require((ratesPerMille.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "rates are per-mille: 0..1000")
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(mix(col(idCol)) < rate.cast("long"))
  }
}
