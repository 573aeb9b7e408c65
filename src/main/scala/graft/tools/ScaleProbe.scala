package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Empirical scaling probe (not part of the driver contract): replicates
  * the documents table K× with shifted ids and times the end-to-end
  * MinHash-LSH near-dup pipeline at each multiple. Near-linear growth =
  * the banded/pair-restricted design holds; quadratic growth would flag a
  * hidden all-pairs stage.
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
    spark.stop()
  }
}
