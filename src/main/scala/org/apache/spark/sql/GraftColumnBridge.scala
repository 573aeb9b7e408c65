package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression converters so the
  * engine can expose custom Catalyst expressions (graft.functions.*) as
  * user-facing Columns on Spark 4 (where `new Column(expr)` is gone).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
