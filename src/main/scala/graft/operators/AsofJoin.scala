package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the single right row with the greatest
  * rightTs <= leftTs within the same key (left-outer semantics — unmatched
  * left rows keep NULL right columns).
  *
  * Spark lacks this operator natively; per the engine's design rules it is
  * COMPOSED from built-ins rather than hand-scheduled: tag both sides,
  * union, and take `last(right, ignoreNulls)` over a (key, ts)-ordered
  * window. Cost = one shuffle on the key + one ordered scan — no theta
  * join, no per-row range probe, no row explosion; skew on a hot key is
  * AQE's standard problem. (A time-bucketed variant would pre-partition by
  * (key, ts-bucket) for bounded windows; not needed at this data shape.)
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPrefix: String = "r_"): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rStruct = StructType(right.schema.fields)
    val lStruct = StructType(left.schema.fields)
    val l = left.select(col(key).cast("long").as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(col(key).cast("long").as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(rCols.map(col): _*).as("__r"))
    // right rows sort before left rows at equal ts, so <= is inclusive
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rCols.map(c => col(s"__m.$c").as(rightPrefix + c)): _*)
  }
}
