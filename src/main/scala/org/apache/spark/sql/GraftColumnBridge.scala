package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression converters so the
  * engine can expose custom Catalyst expressions (graft.functions.*) as
  * user-facing Columns on Spark 4 (where `new Column(expr)` is gone).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  import org.apache.spark.sql.{internal => in}
  import org.apache.spark.sql.types.{ArrayType, DataType}

  /** The fresh name of a HOF lambda argument Column — `functions.transform`
    * and friends invoke the user's Scala function with a Column wrapping an
    * UnresolvedNamedLambdaVariable node; this surfaces its generated name.
    */
  def lambdaArgName(c: Column): Option[String] = c.node match {
    case v: in.UnresolvedNamedLambdaVariable => Some(v.name)
    case _ => None
  }

  /** Analyze `body`'s data type with lambda variables in scope. A column
    * that references a HOF lambda argument cannot be analyzed standalone
    * (`df.select` has no lambda binding), so the body is wrapped in nested
    * `transform(<typed null array>, <name> -> body)` calls DECLARING the
    * same argument names — the analyzer then re-binds them by name, and
    * the result type is unwrapped through the introduced array layers.
    * The wrap is built from catalyst nodes directly: the ColumnNode-level
    * LambdaFunction freshens its argument names on conversion (capture
    * avoidance), which would break the by-name re-binding.
    */
  def typeUnderLambdas(df: DataFrame, body: Column,
      args: Seq[(String, DataType)]): DataType = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayTransform,
      LambdaFunction => CLambda, UnresolvedNamedLambdaVariable => CUnlv}
    val wrapped = args.foldLeft(body) { case (b, (name, t)) =>
      val lam = CLambda(expression(b), Seq(CUnlv(Seq(name))))
      val arr = functions.lit(null).cast(ArrayType(t))
      column(ArrayTransform(expression(arr), lam))
    }
    val res = df.select(wrapped).schema.head.dataType
    args.foldLeft(res)((t, _) => t.asInstanceOf[ArrayType].elementType)
  }
}
