package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the g30_scc gate: repeated isolated runs of
  * stronglyConnectedComponents on the referral digraph with per-job wall
  * times, A/B-able on the layer-collapse knob
  * (SPARK_GRAFT_SCC_LAYERS=1|2) — attributes the gate's wall time to the
  * trim / coloring / backward phases via the job trace.
  */
object SccProfile {
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
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
    val starts = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    val slow = sys.env.getOrElse("SPARK_GRAFT_SCC_SLOWJOB", "0.2").toDouble
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        starts.put(js.jobId, System.nanoTime()); jobs += 1
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(Integer.valueOf(je.jobId))
        if (t0 != null) {
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > slow) println(f"    job ${je.jobId}%4d ${dt}%6.2f s")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val c = graft.store.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").cast("long").as("k")).localCheckpoint()
    val n = c.count()
    def ref(mul: Long) = c.select(col("k").as("src"),
      (lit(1L) + (col("k") * mul) % n).as("dst"))
    val edges = ref(48271L).unionByName(ref(16807L))
      .where(col("src") =!= col("dst")).localCheckpoint()
    edges.count()
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCC_REPS", "5").toInt
    val layers = sys.env.getOrElse("SPARK_GRAFT_SCC_LAYERS", "2").toInt
    sys.env.get("SPARK_GRAFT_SCC_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    (1 to reps).foreach { rep =>
      jobs = 0
      val j0 = jobs
      val t0 = System.nanoTime()
      val probe: String => Unit =
        if (sys.env.get("SPARK_GRAFT_SCC_PHASES").contains("1"))
          s => println(s"    $s") else _ => ()
      val hist = graft.algorithms.GraphAlgorithms
        .stronglyConnectedComponents(edges, layersPerRound = layers,
          phaseProbe = probe)
        .groupBy(col("scc_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n"))
        .collect().map(r => s"${r.getLong(0)}x${r.getLong(1)}").mkString(",")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  rep $rep layers=$layers time=$dt%.2f s jobs=${jobs - j0} hist=$hist")
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep.contains(id)) rdd.unpersist(false) }
    }
    spark.stop()
  }
}
