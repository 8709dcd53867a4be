package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's Catalyst
  * functions available in ANY session (including pure-SQL clients and
  * thrift/connect servers) via
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — the injection mechanism Spark provides for libraries that extend
  * the planner, as opposed to the per-session
  * `GraftFunctions.register(spark)` temp-function route (kept for
  * notebooks). Functions are injected as persistent builtin-style
  * entries with documentation, so `DESCRIBE FUNCTION graft_block_rows`
  * works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("graft_block_rows"),
      new ExpressionInfo(
        classOf[GraftFunctions.BlockRows].getName, null, "graft_block_rows",
        "graft_block_rows(block) - logical row count from a graft encoded-block header (no decode).",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.BlockRows(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier("graft_block_raw_len"),
      new ExpressionInfo(
        classOf[GraftFunctions.BlockRawLen].getName, null, "graft_block_raw_len",
        "graft_block_raw_len(block) - logical byte size from a graft encoded-block header (no decode).",
        ""),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.BlockRawLen(exprs.head)))
  }
}
