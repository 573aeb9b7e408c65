package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Empirical scaling probe (not part of the driver contract): replicates
  * the input K× with shifted ids and times an operator at each multiple.
  * Near-linear growth = the banded/pair-restricted/frontier design holds;
  * quadratic growth would flag a hidden all-pairs stage.
  *
  * `SPARK_GRAFT_PROBE=dedup|kcore` picks the pipeline (default dedup,
  * which replicates the MinHash-LSH near-dup path; kcore replicates the
  * TPC-H graph edge list — replicas are disjoint components, so the peel
  * work per replica is constant and total work should grow linearly).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") match {
      case "kcore" => kcoreProbe(spark, sfDir)
      case _       => dedupProbe(spark, sfDir)
    }
    spark.stop()
  }

  private def dedupProbe(spark: SparkSession, sfDir: String): Unit = {
    val base = graft.store.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n0 = base.count()
    for (k <- Seq(1, 2, 4, 8)) {
      val df = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          // vary text slightly per replica so replicas aren't exact dups
          concat(col("text"), lit(" r" + i)).as("text")))
        .reduce(_ unionByName _)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashNearDupPairs(df, "doc_id", "text").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE k=$k docs=${n0 * k} pairs=$pairs time=$dt%.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }

  private def kcoreProbe(spark: SparkSession, sfDir: String): Unit = {
    val base = graft.store.GraphStore.tpch(spark, sfDir)
      .allEdges.select(col("src"), col("dst")).localCheckpoint()
    val n0 = base.count()
    // the per-k cleanup must spare the shared base checkpoint
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    // ids use the top 16 bits for labels, so shift replicas within the
    // 48-bit local space to keep components disjoint
    for (k <- Seq(1, 2, 4)) {
      val df = (0 until k).map(i =>
        base.select((col("src") + lit(i.toLong << 28)).as("src"),
          (col("dst") + lit(i.toLong << 28)).as("dst")))
        .reduce(_ unionByName _)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (core, rounds) =
        graft.algorithms.GraphAlgorithms.kCoreRounds(df, 3, maxRounds = 32)
      val n = core.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE k=$k edges=${n0 * k} core=$n rounds=$rounds time=$dt%.2f s")
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep.contains(id)) rdd.unpersist(false) }
    }
  }
}
