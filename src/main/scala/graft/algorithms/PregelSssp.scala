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

  /** Weighted SSSP with predecessor tracking: (id, dist, parent), parent =
    * the minimum-id neighbor among those achieving the minimal distance
    * (deterministic; NULL for the source). The weighted counterpart of
    * Traversals.bfsParents — walking parents backwards reconstructs the
    * min-cost path like the reference's Dijkstra predecessor map
    * (/root/reference/src/algorithms/shortest_path.rs:98-141).
    */
  def runWithParents(spark: SparkSession, edges: DataFrame, srcId: Long,
      maxIterations: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val hasW = edges.columns.contains("weight")
    val edgeRdd = (if (hasW) edges.select("src", "dst", "weight").as[(Long, Long, Double)].rdd
      else edges.select("src", "dst").as[(Long, Long)].rdd.map(e => (e._1, e._2, 1.0)))
      .map { case (s, d, w) => Edge(s: VertexId, d: VertexId, w) }
    // state/message = (dist, parent); order lexicographic so equal-cost
    // paths resolve to the lowest parent id — run-to-run deterministic
    val inf = (Double.PositiveInfinity, Long.MaxValue)
    def better(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) a else b
    val graph = Graph.fromEdges(edgeRdd, inf)
      .mapVertices((id, _) => if (id == srcId) (0.0, -1L) else inf)
    val result = Pregel(graph, inf, maxIterations)(
      (_, st, msg) => better(st, msg),
      triplet =>
        if (triplet.srcAttr._1 + triplet.attr < triplet.dstAttr._1 ||
          (triplet.srcAttr._1 + triplet.attr == triplet.dstAttr._1 &&
            triplet.srcId < triplet.dstAttr._2))
          Iterator((triplet.dstId, (triplet.srcAttr._1 + triplet.attr, triplet.srcId)))
        else Iterator.empty,
      better)
    result.vertices.filter(_._2._1 != Double.PositiveInfinity)
      .map { case (id, (d, p)) => (id, d, if (p < 0) None else Some(p)) }
      .toDF("id", "dist", "parent")
  }

  /** Full weighted shortest path src -> dst: one row (start_id, end_id,
    * dist, path) with the vertex-id sequence of the min-cost
    * (lowest-parent-id tie-broken) path; 0 rows when unreachable. Pointer
    * walk over the parents table — O(path length) point lookups, never a
    * |V| driver materialization.
    */
  def shortestPath(spark: SparkSession, edges: DataFrame, srcId: Long,
      dstId: Long, maxIterations: Int = Int.MaxValue): DataFrame = {
    val parents = runWithParents(spark, edges, srcId, maxIterations).localCheckpoint()
    val out = reconstruct(parents, srcId, dstId)
    parents.unpersist()
    out
  }

  /** Pointer walk over a (id, dist, parent) relation from `runWithParents`:
    * O(path length) point lookups against the (checkpointed) parents table.
    */
  def reconstruct(parents: DataFrame, srcId: Long, dstId: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = parents.sparkSession
    import spark.implicits._
    val endRow = parents.where(col("id") === dstId)
      .select("dist", "parent").collect()
    val out =
      if (endRow.isEmpty) Seq.empty[(Long, Long, Double, Seq[Long])]
      else {
        val dist = endRow(0).getDouble(0)
        val path = scala.collection.mutable.ArrayBuffer(dstId)
        var cur = if (endRow(0).isNullAt(1)) None else Some(endRow(0).getLong(1))
        while (cur.isDefined) {
          path.prepend(cur.get)
          val r = parents.where(col("id") === cur.get).select("parent").collect()
          cur = if (r.isEmpty || r(0).isNullAt(0)) None else Some(r(0).getLong(0))
        }
        Seq((srcId, dstId, dist, path.toSeq))
      }
    out.toDF("start_id", "end_id", "dist", "path")
  }
}
