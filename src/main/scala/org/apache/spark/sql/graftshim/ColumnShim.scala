package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column<->Expression converters (Spark 4
  * moved Column onto plan nodes; ExpressionUtils is the supported
  * internal conversion — this shim lives in the sql package namespace
  * to reach it, the standard approach for Catalyst extensions).
  */
object ColumnShim {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
