package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget training sequences (the concat-then-chunk packing
  * used for pretraining batches — every document's tokens are laid out
  * in a deterministic stream and the stream is cut every `budget`
  * tokens; a document belongs to the sequence its first token lands
  * in).
  *
  * Spark-first shape: ONE hash shuffle into `nShards` independent
  * streams (shard = id % nShards), then a per-shard ordered window
  * prefix-sum — there is NO global sort or single-partition window, so
  * the operator scales linearly: 100 TB of documents is still one
  * shuffle plus embarrassingly parallel per-shard scans. `nShards`
  * bounds per-task state (a running sum), not memory.
  *
  * The assignment is fully deterministic (id-ordered within a shard),
  * which makes packed batches reproducible across runs and engines —
  * the property the oracle checks by recomputing the identical layout
  * in SQL window functions.
  */
object Pack {

  /** Per-document packing assignment: adds `shard` (which stream),
    * `seq` (sequence number within the shard), and `tok` (this
    * document's token count) to `idCol`. Documents with zero/negative
    * token counts still land in a sequence (they consume nothing).
    */
  def assignments(docs: DataFrame, idCol: String, tokens: Column,
                  nShards: Int, budget: Long): DataFrame = {
    require(nShards > 0 && budget > 0, "nShards and budget must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    docs
      .select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        tokens.cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      // first token of this doc sits at cum-tok in the shard's stream
      .withColumn("seq", floor((col("cum") - col("tok")) / lit(budget.toDouble)).cast("long"))
      .drop("cum")
  }

  /** Per-sequence summary (the packing manifest a batch loader reads):
    * one row per (shard, seq) with document and token counts.
    */
  def summary(docs: DataFrame, idCol: String, tokens: Column,
              nShards: Int, budget: Long): DataFrame =
    assignments(docs, idCol, tokens, nShards, budget)
      .groupBy("shard", "seq")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
}
