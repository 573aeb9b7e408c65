package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Empirical scaling probe (not part of the driver contract): replicates
  * the input K× with shifted ids and times an operator at each multiple.
  * Near-linear growth = the banded/pair-restricted/frontier design holds;
  * quadratic growth would flag a hidden all-pairs stage.
  *
  * `SPARK_GRAFT_PROBE=dedup|kcore|incdedup|nodesim` picks the pipeline
  * (default dedup, which replicates the MinHash-LSH near-dup path; kcore
  * and nodesim replicate the TPC-H graph edge list — replicas are disjoint
  * components, so per-replica work is constant and total work should grow
  * linearly; incdedup grows the CORPUS side against a fixed incoming
  * batch, the amortized-streaming axis d10 cares about).
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
      case "kcore"    => kcoreProbe(spark, sfDir)
      case "incdedup" => incDedupProbe(spark, sfDir)
      case "nodesim"  => nodeSimProbe(spark, sfDir)
      case _          => dedupProbe(spark, sfDir)
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

  /** d10's scale axis: a FIXED incoming batch deduped against a corpus
    * replicated Kx. The candidate join is restricted to incoming x corpus
    * bucket pairs, so time should grow linearly with corpus size (the
    * signature/shingle pass) — superlinear growth would flag a hidden
    * corpus x corpus stage.
    */
  private def incDedupProbe(spark: SparkSession, sfDir: String): Unit = {
    val base = graft.store.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n0 = base.count()
    // incoming: a ~10% slice, id-shifted clear of every corpus replica
    val incoming = base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(1L << 40)).as("doc_id"), col("text"))
      .localCheckpoint()
    val nInc = incoming.count()
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    for (k <- Seq(1, 4, 16)) {
      val corpus = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          concat(col("text"), lit(" r" + i)).as("text")))
        .reduce(_ unionByName _)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val kept = Dedup.dedupAgainstCorpus(incoming, corpus,
        "doc_id", "text", minJaccard = 0.7).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE k=$k corpus=${n0 * k} incoming=$nInc kept=$kept time=$dt%.2f s")
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep.contains(id)) rdd.unpersist(false) }
    }
  }

  /** g18's scale axis: disjoint replicas of g18's own bipartite
    * part->supplier adjacency — linear growth expected, quadratic would
    * flag the shared-neighbor join exploding. (NOT the full social graph:
    * node similarity is defined over bounded-degree neighborhoods; a graph
    * whose neighbors have unbounded in-degree generates d^2/2 pairs per
    * neighbor by definition, which is the documented hub-cap trade-off,
    * not a scaling property of the implementation.)
    */
  private def nodeSimProbe(spark: SparkSession, sfDir: String): Unit = {
    val base = graft.store.Tables.load(spark, sfDir, "lineitem")
      .where(col("l_partkey") < 2000)
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      .localCheckpoint()
    val n0 = base.count()
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    for (k <- Seq(1, 4, 16)) {
      val df = (0 until k).map(i =>
        base.select((col("src") + lit(i.toLong << 28)).as("src"),
          (col("dst") + lit(i.toLong << 28)).as("dst")))
        .reduce(_ unionByName _)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val n = graft.algorithms.GraphAlgorithms.nodeSimilarity(df, topK = 10).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE k=$k edges=${n0 * k} rows=$n time=$dt%.2f s")
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep.contains(id)) rdd.unpersist(false) }
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
