package graft

import graft.ops.{Pack, Sampling}
import org.apache.spark.sql.functions._

/** Sequence packing and deterministic stratified sampling: layout
  * correctness against a hand-computed stream, shard independence, the
  * no-global-sort plan shape, sample determinism and composability.
  */
class PackSamplingSpec extends SparkTestBase {

  import spark.implicits._

  test("packing lays out each shard's token stream in id order and cuts at the budget") {
    // one shard (ids all ≡ 0 mod 1): stream 400,400,400,100,900 → cuts at 1000
    val docs = Seq((0L, 400L), (1L, 400L), (2L, 400L), (3L, 100L), (4L, 900L))
      .toDF("doc_id", "tok")
    val out = Pack.assignments(docs, "doc_id", col("tok"), nShards = 1, budget = 1000L)
      .select("doc_id", "seq").as[(Long, Long)].collect().toMap
    // first-token offsets: 0, 400, 800, 1200, 1300 → seqs 0,0,0,1,1
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L), out.toString)
  }

  test("shards pack independently and the summary accounts for every token") {
    val docs = (0L until 1000L).map(i => (i, (i % 37) + 1)).toDF("doc_id", "tok")
    val sum8 = Pack.summary(docs, "doc_id", col("tok"), nShards = 8, budget = 256L)
    val total = sum8.agg(org.apache.spark.sql.functions.sum("n_tokens")).as[Long].head()
    assert(total == (0L until 1000L).map(i => (i % 37) + 1).sum)
    val shards = sum8.select("shard").distinct().as[Long].collect().toSet
    assert(shards == (0L until 8L).toSet)
    // a doc's assignment must not depend on other shards: recompute shard 3 alone
    val alone = Pack.assignments(docs.filter($"doc_id" % 8 === 3), "doc_id", col("tok"),
        nShards = 8, budget = 256L)
      .select("doc_id", "seq").as[(Long, Long)].collect().toMap
    val together = Pack.assignments(docs, "doc_id", col("tok"), nShards = 8, budget = 256L)
      .filter($"shard" === 3).select("doc_id", "seq").as[(Long, Long)].collect().toMap
    assert(alone == together)
  }

  test("packing plan: hash-partitioned window, no single-partition exchange") {
    val docs = (0L until 100L).map(i => (i, i + 1)).toDF("doc_id", "tok")
    val plan = Pack.assignments(docs, "doc_id", col("tok"), nShards = 8, budget = 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning"), s"expected a hash shuffle on shard:\n$plan")
    assert(!plan.contains("SinglePartition"), s"packing must never serialize globally:\n$plan")
  }

  test("stratified sample is deterministic, rate-accurate, and composes") {
    val docs = (0L until 10000L).map(i => (i, if (i % 3 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 800, "zh" -> 200)
    val s1 = Sampling.stratified(docs, "doc_id", "lang", rates).select("doc_id")
      .as[Long].collect().toSet
    val s2 = Sampling.stratified(docs, "doc_id", "lang", rates).select("doc_id")
      .as[Long].collect().toSet
    assert(s1 == s2, "same input must give the identical sample")
    val nEn = s1.count(_ % 3 == 0).toDouble / docs.filter($"lang" === "en").count()
    val nZh = s1.count(_ % 3 != 0).toDouble / docs.filter($"lang" === "zh").count()
    assert(math.abs(nEn - 0.8) < 0.03, s"en rate $nEn")
    assert(math.abs(nZh - 0.2) < 0.03, s"zh rate $nZh")
    // unknown strata fall back to the default rate
    val none = Sampling.stratified(docs, "doc_id", "lang", Map("fr" -> 500)).count()
    assert(none == 0L, "defaultPerMille=0 must drop unknown strata")
  }

  test("sampling is a pushed-down filter: no shuffle in the plan") {
    val docs = (0L until 100L).map(i => (i, "en")).toDF("doc_id", "lang")
    val plan = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 500))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
