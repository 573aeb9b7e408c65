package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling main for MERGE-heavy script replay: per-statement wall
  * times across the script, isolating where the cost grows (lineage depth
  * between compactions vs per-statement constants).
  */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_MERGE_N", "40").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_MERGE_COMPACT", "32").toInt
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = new graft.cypher.CypherSession(spark,
      new graft.store.GraphStore(Map.empty, Map.empty))
    val t0 = System.nanoTime()
    var last = t0
    (1 to n).foreach { i =>
      sess.run(s"MERGE (x:P {k: ${i % (n / 2)}}) ON CREATE SET x.fresh = 1")
      if (i % compactEvery == 0) {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        sess.store = sess.store.compact(eager = true)
        graft.util.Checkpoints.release(spark, before)
      }
      val now = System.nanoTime()
      println(f"stmt $i%3d ${(now - last) / 1e9}%6.2f s")
      last = now
    }
    println(f"total ${(System.nanoTime() - t0) / 1e9}%6.2f s for $n statements")
    spark.stop()
  }
}
