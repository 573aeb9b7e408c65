package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions into the SQL function registry so they are callable
  * from spark.sql(...) as well as the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — both only take effect when the
  * builder actually CREATES the session; for a session that already exists
  * (the shared getOrCreate case), use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (id, info, builder) =>
      e.injectFunction((id, info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] =
    Seq((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product(a, b) takes two array arguments")
        DotProduct(exprs(0), exprs(1))
      }))

  /** Install the same functions into an ALREADY-RUNNING session.
    * `withExtensions`/`spark.sql.extensions` silently no-op when
    * `getOrCreate` returns an existing session, so any shared-session
    * consumer (notebooks, test suites) registers through here instead.
    * Idempotent — re-registration overwrites with the same builder.
    */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
