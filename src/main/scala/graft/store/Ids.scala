package graft.store

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed contiguous id allocation. The naive
  * `row_number().over(Window.orderBy(...))` forces the whole relation
  * through a single partition (Spark warns); these helpers compute the same
  * dense sequences with per-partition offsets (`RDD.zipWithIndex`: one
  * lightweight count job to learn partition sizes, then a map) — the
  * pattern the reference's per-label id counters
  * (/root/reference/src/storage/rocksdb_store.rs:302-304) become when the
  * allocation must scale out.
  */
object Ids {

  /** Append `colName` = 1..n in partition order. No single-partition
    * exchange; determinism follows the input's partition order (same
    * contract as a row_number over monotonically_increasing_id).
    */
  def withSequence(df: DataFrame, colName: String): DataFrame = {
    val schema = df.schema.add(colName, LongType, nullable = false)
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }

  /** Append `colName` = dense 1..n_label per `labelCol` group, ordered by
    * `keyCols` within each group. Scale shape: a range-partitioned global
    * sort on (label, keys) + zipWithIndex + a broadcast per-label rebase —
    * never a per-label single-partition window. Deterministic for unique
    * (label, keys).
    */
  def withSequencePerLabel(df: DataFrame, labelCol: String, keyCols: Seq[String],
      colName: String): DataFrame = {
    val sortCols = (labelCol +: keyCols).map(col)
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val withIdx = withSequence(sorted, "__gidx").localCheckpoint()
    val bases = withIdx.groupBy(labelCol).agg(min(col("__gidx")).as("__base"))
    withIdx.join(broadcast(bases), labelCol)
      .withColumn(colName, col("__gidx") - col("__base") + 1L)
      .drop("__gidx", "__base")
  }
}
