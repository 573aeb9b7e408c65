package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.GraphStore

/** Dev profiling main: stage-by-stage timing of the PageRank-family gates
  * (x6/x7/x17) — separates the tpch graph-construction cost from the
  * iteration cost so perf work aims at the right stage.
  */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warm JIT/codegen once end-to-end, then measure
    (1 to 2).foreach { round =>
      println(s"--- round $round ${if (round == 1) "(cold)" else "(warm)"}")
      val g = GraphStore.tpch(spark, sfDir)
      val edges = time("allEdges build+materialize") {
        val e = g.allEdges.select(col("src"), col("dst")).localCheckpoint()
        e.count(); e
      }
      time("pageRankStable 5 iters") {
        graft.algorithms.GraphAlgorithms.pageRankStable(edges, 5)
          .orderBy(col("pr").desc, col("id")).limit(20).count()
      }
      time("pageRankStable 5 iters chainDepth=5") {
        graft.algorithms.GraphAlgorithms.pageRankStable(edges, 5, chainDepth = 5)
          .orderBy(col("pr").desc, col("id")).limit(20).count()
      }
      time("graphx staticPageRank 10") {
        graft.algorithms.GraphAlgorithms.pageRank(spark, edges).count()
      }
      time("graphx connectedComponents") {
        graft.algorithms.GraphAlgorithms.connectedComponents(spark, edges).count()
      }
      time("kCore k=3 (total)") {
        import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        val listener = new SparkListener {
          override def onJobStart(js: SparkListenerJobStart): Unit =
            starts.put(js.jobId, System.nanoTime())
          override def onJobEnd(je: SparkListenerJobEnd): Unit = {
            val t0 = Option(starts.get(je.jobId)).getOrElse(0L)
            println(f"    job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        var lastT = System.nanoTime()
        var i = 0
        try graft.algorithms.GraphAlgorithms.kCoreRounds(edges, 3, 32, roundProbe = { _ =>
          i += 1
          println(f"  kCore round $i built in ${(System.nanoTime() - lastT) / 1e9}%6.2f s")
          lastT = System.nanoTime()
        })._1.count()
        finally spark.sparkContext.removeSparkListener(listener)
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
