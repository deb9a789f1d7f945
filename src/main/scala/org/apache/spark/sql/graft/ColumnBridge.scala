package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 wraps Column around ColumnNode; converting to/from Catalyst
  * Expression goes through the classic-API `ExpressionUtils`, which is
  * private[sql] — this bridge re-exports the two conversions the engine's
  * custom codegen expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
