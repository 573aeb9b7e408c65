package graft.algorithms

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-graph analytics on GraphX (beyond the reference's algorithm set —
  * its rayon helpers never wire into anything, SURVEY.md §2.6 G7; Spark
  * gives us the full Pregel family).
  */
object GraphAlgorithms {

  private def toGraph(spark: SparkSession, edges: DataFrame): Graph[Int, Int] = {
    import spark.implicits._
    val edgeRdd = edges.select("src", "dst").as[(Long, Long)].rdd
      .map { case (s, d) => Edge(s, d, 1) }
    Graph.fromEdges(edgeRdd, 0)
  }

  /** Standard PageRank (damping 0.85), returns (id, rank). */
  def pageRank(spark: SparkSession, edges: DataFrame, tol: Double = 1e-4): DataFrame = {
    import spark.implicits._
    toGraph(spark, edges).pageRank(tol).vertices.toDF("id", "rank")
  }

  /** Connected components (undirected): (id, component) where component is
    * the minimum vertex id in the component — deterministic.
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    toGraph(spark, edges).connectedComponents().vertices.toDF("id", "component")
  }

  /** Degree table: (id, in_degree, out_degree) via two aggregations —
    * DataFrame-native, no GraphX needed.
    */
  def degrees(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"))
  }

  /** Triangle count per vertex (GraphX canonical orientation). */
  def triangleCount(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.graphx.PartitionStrategy
    toGraph(spark, edges)
      .partitionBy(PartitionStrategy.EdgePartition2D)
      .triangleCount().vertices.toDF("id", "triangles")
  }
}
