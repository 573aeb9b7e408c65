package graft.algorithms

import org.apache.spark.graphx.{Edge, Graph, Pregel, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Weighted single-source shortest paths on GraphX Pregel — the
  * cluster-scale counterpart of the reference's binary-heap Dijkstra
  * (/root/reference/src/algorithms/shortest_path.rs:77-141). Each superstep
  * relaxes all frontier edges in parallel instead of popping one vertex at a
  * time; with uniform weights this is exactly the BFS the reference runs.
  *
  * DataFrame in / DataFrame out so it composes with the rest of the engine;
  * GraphX is used internally (RDD-based) because Pregel's message combine is
  * the right primitive for value-propagation (path *enumeration* stays in
  * Traversals.vle — Pregel aggregates, it does not enumerate).
  */
object PregelSssp {

  /** edges: (src: Long, dst: Long[, weight: Double]); absent weight = 1.0.
    * Returns (id, dist) for every vertex reachable from srcId.
    */
  def run(spark: SparkSession, edges: DataFrame, srcId: Long,
      maxIterations: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val hasW = edges.columns.contains("weight")
    val edgeRdd = (if (hasW) edges.select("src", "dst", "weight").as[(Long, Long, Double)].rdd
      else edges.select("src", "dst").as[(Long, Long)].rdd.map(e => (e._1, e._2, 1.0)))
      .map { case (s, d, w) => Edge(s: VertexId, d: VertexId, w) }
    val graph = Graph.fromEdges(edgeRdd, Double.PositiveInfinity)
      .mapVertices((id, _) => if (id == srcId) 0.0 else Double.PositiveInfinity)
    val result = Pregel(graph, Double.PositiveInfinity, maxIterations)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr + triplet.attr < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + triplet.attr))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    result.vertices.filter(_._2 != Double.PositiveInfinity)
      .toDF("id", "dist")
  }
}
