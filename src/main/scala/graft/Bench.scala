package graft
import org.apache.spark.sql.SparkSession
import graft.store.Tables

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: file-footer reads + JIT/codegen warm so per-query numbers
    // measure the query, not session startup
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    // optional comma-separated query filter for profiling single queries
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case t: Throwable => Some(t.toString.replaceAll("[\"\\\\\n]", " ").take(160)) }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop cached/checkpointed blocks so one
      // query's state never pressures the next (measured outside the timer).
      // Blocking so the next query starts from a clean BlockManager instead
      // of racing an async removal.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // Spark's ContextCleaner reclaims shuffle files / broadcasts only via
      // weak references — with a 32g heap GC may not run for dozens of
      // queries and the accumulated state slows later (GraphX-heavy)
      // queries several-fold. One explicit GC per query keeps the session
      // flat; it runs outside the timer.
      System.gc()
      (name, elapsed, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a broken query must surface as an error, not a fast green number
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
