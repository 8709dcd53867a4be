package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Writes PLANS.md: `explain("formatted")` physical plans of the
  * headline queries — the plan-shape evidence (broadcasts chosen,
  * TakeOrderedAndProject for top-k, partial+final aggregation, pushed
  * filters/pruned schemas, whole-stage codegen spans, no unpartitioned
  * windows) reviewed after each operator lands.
  *
  *   runMain graft.PlanDump /root/testdata/sf0.001 PLANS.md
  *
  * Store-probe queries (index_, store_, dict_ prefixed) are multi-JOB
  * pipelines whose IO behavior is asserted byte-level in the specs
  * instead (StoreLayoutSpec, MetaIndexSpec, DictFilterSpec SparkListener
  * bytesRead); a single explain string cannot show them, so they are
  * listed with a pointer, not a misleading final-frame plan.
  */
object PlanDump {

  private val headline = Seq(
    "q1_agg" -> "group-by aggregate: partial+final hash agg, no unnecessary shuffle",
    "q2_filter_project" -> "filter+project: predicate and pruned schema reach the parquet scan",
    "q3_join_broadcast" -> "star join: every dimension broadcast, fact never shuffled",
    "q4_topk" -> "top-k: TakeOrderedAndProject (per-partition top-k + driver merge, no global sort)",
    "q7_window_cumsum" -> "window: partitioned running sum (no unpartitioned window)",
    "q22_argminmax" -> "argmin/argmax + covariance: one partial+final aggregate pass",
    "q23_cov_matrix" -> "covariance matrix: k(k+1)/2 partials in ONE scan, exploded to long form",
    "dedup_exact" -> "exact dedup: hash-partial group-by on the digest",
    "dedup_embedding" -> "near-dup pairs: bucket-equality join (never a cartesian), codegen'd dot",
    "sim_topk_cosine" -> "brute-force cosine top-k: native vec_dot inside WholeStageCodegen + TakeOrdered",
    "text_quality" -> "text metrics: pure column expressions, single codegen'd scan",
    "asof_join" -> "as-of join: ONE shuffle (union on key), window carry — no range nested loop",
    "range_join_point" -> "range join: bucketized shuffled equi-join, inequality as residual filter",
    "pack_sequences" -> "sequence packing: hash-partitioned per-shard windows, no global sort",
    "sample_stratified" -> "stratified sample: id-hash filter inside the scan stage (the only exchange is the presentation sort; the operator itself is shuffle-free, PackSamplingSpec)"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val sb = new StringBuilder
    sb ++= s"# PLANS — `explain(\"formatted\")` of the headline queries ($sfDir)\n\n"
    sb ++= "Regenerate: `runMain graft.PlanDump <sfDir> PLANS.md`. Store-probe\n"
    sb ++= "queries (index_* / store_* / dict_isin_scan / sim_ann_store_*) are\n"
    sb ++= "multi-job metadata→gather pipelines; their IO discipline is asserted\n"
    sb ++= "byte-level in StoreLayoutSpec / MetaIndexSpec / DictFilterSpec via\n"
    sb ++= "SparkListener bytesRead rather than a single plan string.\n"
    headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb ++= s"\n## $name — $why\n\n```\n$plan```\n"
    }
    Files.write(Paths.get(out), sb.toString.getBytes(UTF_8))
    println(s"""{"job":"plandump","queries":${headline.size},"out":"$out"}""")
    spark.stop()
  }
}
