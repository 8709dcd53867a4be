package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-column ingest validation — the reference's schema
  * constraint surface (`ge`/`gt`/`le`/`lt`, `min_length`/`max_length`,
  * `pattern`: python-blosc2 schema.py:79-160, vectorized batch checks
  * schema_vectorized.py:64-176) re-expressed as ONE Catalyst aggregate
  * pass: every rule folds to a codegen'd predicate, all rules are
  * counted (plus one example value captured) in a single job — no
  * per-row driver loop, no UDF, no second scan.
  *
  * NULL semantics follow the reference (schema_validation.py:86-118
  * `_mask_nulls`): a NULL cell passes every constraint — nullability
  * itself is the schema's business, bounds only judge present values.
  */
object Validation {

  /** Constraints for one column; unset fields are unchecked. */
  final case class Rule(
      col: String,
      ge: Option[Double] = None,
      gt: Option[Double] = None,
      le: Option[Double] = None,
      lt: Option[Double] = None,
      minLength: Option[Int] = None,
      maxLength: Option[Int] = None,
      pattern: Option[String] = None
  ) {
    def describe: String = Seq(
      ge.map(v => s"ge=$v"), gt.map(v => s"gt=$v"), le.map(v => s"le=$v"),
      lt.map(v => s"lt=$v"), minLength.map(v => s"min_length=$v"),
      maxLength.map(v => s"max_length=$v"), pattern.map(v => s"pattern=$v")
    ).flatten.mkString(", ")
  }

  /** TRUE where the row VIOLATES `rule` (NULL cells never violate). */
  def violates(rule: Rule): Column = {
    val c = col(rule.col)
    val checks = Seq(
      rule.ge.map(v => c < v),
      rule.gt.map(v => c <= v),
      rule.le.map(v => c > v),
      rule.lt.map(v => c >= v),
      rule.minLength.map(v => length(c) < v),
      rule.maxLength.map(v => length(c) > v),
      // rlike is a substring match; anchor so `pattern` means the
      // whole cell, as the reference's fullmatch-style check does
      rule.pattern.map(p => !c.rlike(s"^(?:$p)$$"))
    ).flatten
    require(checks.nonEmpty, s"rule for ${rule.col} has no constraints")
    coalesce(checks.reduce(_ || _), lit(false))
  }

  /** One row per rule: violation count + the MINIMUM offending value
    * (min, not first — deterministic under parallel partitions) — a
    * single aggregate job over the input regardless of rule count.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      val bad = violates(r)
      Seq(
        // coalesce: sum over ZERO rows is NULL — an empty batch must
        // report 0 violations, not NPE in getLong
        coalesce(sum(bad.cast("long")), lit(0L)).as(s"_n$i"),
        min(when(bad, col(r.col).cast("string"))).as(s"_ex$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = rules.zipWithIndex.map { case (r, i) =>
      (r.col, r.describe, row.getLong(i * 2), row.getString(i * 2 + 1))
    }
    df.sparkSession.createDataFrame(out).toDF("col", "rule", "violations", "example")
  }

  /** Fail-fast gate (the reference's `extend()` behavior): one pass; if
    * any rule is violated, throw naming every violated constraint, its
    * count, and an example value.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = report(df, rules).filter(col("violations") > 0).collect()
    if (bad.nonEmpty) {
      val msg = bad.map(r =>
        s"column '${r.getString(0)}': ${r.getLong(2)} value(s) violate ${r.getString(1)} " +
          s"(min example: ${Option(r.getString(3)).getOrElse("")})").mkString("; ")
      throw new IllegalArgumentException(s"schema validation failed: $msg")
    }
  }

  /** Split into (valid, violating) without an extra pass over the data
    * (both sides are lazy filters of the same scan).
    */
  def partition(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val anyBad = rules.map(violates).reduce(_ || _)
    (df.filter(!anyBad), df.filter(anyBad))
  }
}
