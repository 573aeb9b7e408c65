package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions.{lit, sqrt}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns — a native Catalyst
  * Expression replacing the interpreted higher-order-function chain
  * (aggregate(zip_with(...))), which is CodegenFallback and ~50× slower in
  * the all-pairs similarity hot path. Accumulation is sequential
  * left-to-right, exactly matching SQL list_sum(list_transform(...)) so
  * oracle parity is preserved bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

object VectorFunctions {

  /** Cast to array<double> via Cast (codegen'd; float→double is exact). */
  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(toDoubleArray(a)),
      GraftColumnBridge.expression(toDoubleArray(b))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine with precomputed norms (norms computed once per vector, not per
    * pair — the all-pairs fast path).
    */
  def cosinePre(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  def one: Column = lit(1.0)
}
