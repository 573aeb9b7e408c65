package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows whose timestamp falls in
  * [start, end) of a right-side interval, optionally key-scoped.
  *
  * Spark plans a raw `BETWEEN` theta join as a broadcast-nested-loop —
  * quadratic and unshufflable. This composition bucketizes time instead:
  * each interval explodes into the fixed-width epoch buckets it spans,
  * the probe side computes its single bucket, and containment becomes a
  * (keys, bucket) EQUI-join plus a residual filter. Cost: one shuffle on
  * (keys, bucket); interval explosion is bounded by span/bucketSeconds
  * (pick the bucket near the median interval width).
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, leftTs: String,
      right: DataFrame, startTs: String, endTs: String,
      keys: Seq[String], bucketSeconds: Long,
      rightPrefix: String = "r_"): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    def bucketOf(c: String) =
      floor(col(c).cast("double") / bucketSeconds).cast("long")
    val lb = left.withColumn("__b", bucketOf(leftTs))
    val rb = right
      .withColumn("__b",
        explode(sequence(bucketOf(startTs), bucketOf(endTs))))
      .select((col("__b") +: keys.map(col) :+
        struct(rCols.map(col): _*).as("__r")).toIndexedSeq: _*)
    lb.join(rb, keys :+ "__b")
      .where(col(leftTs) >= col(s"__r.$startTs") && col(leftTs) < col(s"__r.$endTs"))
      .select(lCols.map(col) ++ rCols.map(c => col(s"__r.$c").as(rightPrefix + c)): _*)
  }
}
