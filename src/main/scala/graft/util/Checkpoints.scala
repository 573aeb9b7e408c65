package graft.util

import org.apache.spark.sql.SparkSession

/** Capture-and-release for persistent RDDs created inside a scope.
  *
  * Loop operators truncate lineage with a localCheckpoint per level; when
  * the final result is a DRIVER value (a collected path, a one-row count),
  * every block those checkpoints pinned is dead the moment the value is on
  * the driver — but Spark's ContextCleaner frees blocks only via weak
  * references, so on a large heap they can survive for dozens of queries
  * (the r5 x21 finding). Wrapping the computation releases exactly the
  * delta it created, so hosts that run queries without a Bench-style
  * getPersistentRDDs sweep do not leak blocks per invocation.
  *
  * ONLY sound when the scope's result carries no distributed lineage (a
  * local Seq, a DataFrame built from one) — a DataFrame backed by swept
  * blocks would recompute through truncated lineage and fail loudly.
  * Single-driver assumption (SURVEY §8.1): a concurrent query's RDDs
  * persisted inside the window would be swept too.
  */
object Checkpoints {

  def sweepingDelta[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally release(spark, sc.getPersistentRDDs.keySet -- before)
  }

  /** Snapshot-diff capture of the persistent RDDs one localCheckpoint
    * registers: the checkpointed frame plus a release handle for exactly
    * the blocks the call created. The single helper behind every loop
    * operator's per-round lineage cut (the temporal sweeps, brandesCore,
    * the community family) — previously copy-pasted per operator.
    */
  def tracked(df: org.apache.spark.sql.DataFrame, eager: Boolean)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(eager)
    val mine = sc.getPersistentRDDs.keySet -- before
    (out, () => mine.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))))
  }

  /** The persistent RDD ids backing a checkpointed Dataset — the
    * LogicalRDD leaves of its analyzed plan. EXACT attribution: unlike a
    * getPersistentRDDs before/after diff, ids read off the Dataset itself
    * can never pick up a concurrent session's persists (the r11 ADVICE
    * transaction footgun on a shared SparkContext).
    */
  def idsOf(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet

  /** Unpersist the given RDD ids (non-blocking — the blocks are dead, the
    * caller does not need to wait for their removal).
    */
  def release(spark: SparkSession, ids: scala.collection.Set[Int]): Unit = {
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }
}
