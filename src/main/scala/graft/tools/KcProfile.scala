package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.GraphStore

/** Dev profiling main for the g17_kcore gate: per-job wall times across
  * repeated runs in one session, isolating which stage of the build/peel
  * balloons when the query's wall time swings (the r4 verdict measured a
  * 2.8x spread on identical binaries).
  */
object KcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
    // boxed value type: with [Int, Long] args, get/remove auto-unbox a
    // missing entry's null to 0L before any null check can see it
    val starts = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        // null = start event missed (listener registered mid-job); skip
        // instead of printing a bogus nanoTime-sized duration
        val t0 = starts.remove(Integer.valueOf(je.jobId))
        if (t0 != null) {
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > 0.2) println(f"    job ${je.jobId}%4d ${dt}%6.2f s")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    graft.store.Tables.all.foreach(t => graft.store.Tables.load(spark, sfDir, t).count())
    val reps = sys.env.getOrElse("SPARK_GRAFT_KC_REPS", "5").toInt
    // A/B the r6 layer-collapse knob: 1 = one peel layer per materialized
    // round (the r5 shape), 2 = collapsed (the default)
    val layers = sys.env.getOrElse("SPARK_GRAFT_KC_LAYERS", "2").toInt
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val g = GraphStore.tpch(spark, sfDir)
      val edges = g.allEdges.select(col("src"), col("dst"))
      val tEdges = System.nanoTime()
      var lastT = System.nanoTime()
      var i = 0
      val (surv, rounds) = graft.algorithms.GraphAlgorithms.kCoreRounds(
        edges, 3, 32, roundProbe = { _ =>
          i += 1
          println(f"  round $i built in ${(System.nanoTime() - lastT) / 1e9}%6.2f s")
          lastT = System.nanoTime()
        }, layersPerRound = layers)
      val n = surv.groupBy(graft.model.Graphid.labidCol(col("id"))).count().count()
      println(f"rep $rep total ${(System.nanoTime() - t0) / 1e9}%6.2f s ($rounds rounds, $n label groups)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
