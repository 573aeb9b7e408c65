package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.GraphStore

/** Per-phase timing for labelPropagation at a given SF dir — identifies
  * whether the cost sits in the symmetric-relation build, the per-round
  * vote aggregation, or the broadcast collects.
  */
object LpaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lpa] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val edges = t("edges build+count") {
      val g = GraphStore.tpch(spark, sfDir)
      val e = Seq("PLACED", "CUST_NATION", "SUPP_NATION", "IN_REGION")
        .map(l => g.edges(l).select(col("src"), col("dst")))
        .reduce(_.unionByName(_))
        .localCheckpoint(false)
      e.count(); e
    }
    val e0 = edges.where(col("src") =!= col("dst"))
    val und = t("und distinct+ckpt") {
      val u = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(false)
      u.count(); u
    }
    val verts = t("verts distinct+ckpt") {
      val v = edges.select(col("src").as("id"))
        .unionByName(edges.select(col("dst").as("id"))).distinct()
        .localCheckpoint(false)
      v.count(); v
    }
    val nVerts = verts.count()
    println(s"[lpa] nVerts=$nVerts undRows=${und.count()}")
    var lbl = verts.withColumn("lbl", col("id"))
    for (i <- 1 to 4) {
      lbl = t(s"round $i") {
        val freq = und.join(broadcast(lbl), col("id") === und("src"))
          .groupBy(und("dst").as("vid"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .unionByName(lbl.select(col("id").as("vid"), col("lbl"), lit(0L).as("c")))
        val n = freq.groupBy(col("vid"))
          .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("b"))
          .select(col("vid").as("id"), (-col("b.nl")).as("lbl"))
          .localCheckpoint(false)
        n.count(); n
      }
    }
    t("final histogram") {
      lbl.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n")).orderBy(col("sz")).count()
    }
    spark.stop()
  }
}
