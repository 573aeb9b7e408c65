package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge direction for expansion, mirroring the reference's
  * Out/In/Both dispatch (/root/reference/src/executor/match_executor.rs:149-177).
  */
sealed trait Direction
object Direction {
  case object Out extends Direction
  case object In extends Direction
  case object Both extends Direction

  /** Normalize an edge set to (src, dst) rows in traversal direction.
    * Both = union of forward and reversed — two scans, no per-row branching.
    */
  def orient(edges: DataFrame, dir: Direction): DataFrame = dir match {
    case Out  => edges.select(col("src"), col("dst"))
    case In   => edges.select(col("dst").as("src"), col("src").as("dst"))
    case Both => edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
  }
}

/** Distributed graph traversals as iterative DataFrame joins — the
  * Spark-native replacement for the reference's per-vertex loops:
  * Dijkstra (/root/reference/src/algorithms/shortest_path.rs:77-141) and
  * BFS variable-length expansion (/root/reference/src/algorithms/vle.rs:85-153).
  *
  * Scale posture: each hop is one equi-join of the frontier against the
  * (bucketable) edge table; frontiers are localCheckpoint'ed to cut lineage;
  * no driver-side materialization of vertex sets (loop termination uses
  * `isEmpty`, a cheap limit-1 job).
  */
object Traversals {

  /** Unweighted single/multi-source shortest-path distances (BFS level
    * sweep). `sources` must have an `id` column. Returns (id, dist) with
    * dist = minimal hop count, sources at dist 0.
    * Equivalent to the reference's uniform-weight Dijkstra (weights are all
    * 1 there: shortest_path.rs:108).
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxHops: Int,
      dir: Direction = Direction.Out): DataFrame = {
    // one materialization of the oriented edge set for all hops
    val e = Direction.orient(edges, dir).localCheckpoint()
    var visited = sources.select(col("id").cast("long").as("id"), lit(0).as("dist"))
      .distinct().localCheckpoint()
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      // frontier is broadcast: each hop is a map-side scan of the edge
      // table, no shuffle of the (large) edge side; dedup/anti shuffle only
      // frontier-sized data. AQE spills to sort-merge if a frontier ever
      // exceeds the broadcast threshold.
      val next = e.join(broadcast(frontier), frontier("id") === e("src"))
        .select(e("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint()
      // visited is a shallow union of already-checkpointed levels — no
      // re-materialization needed per hop
      visited = visited.unionByName(next)
      frontier = next
    }
    visited
  }

  /** Shortest-path distance between two vertices; empty result if
    * unreachable within maxHops (the reference errors on unreachable:
    * shortest_path.rs:66-73 — we return 0 rows, the relational idiom).
    */
  def shortestPathDist(edges: DataFrame, srcId: Long, dstId: Long, maxHops: Int,
      dir: Direction = Direction.Out): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sources = Seq(srcId).toDF("id")
    bfsDistances(edges, sources, maxHops, dir).where(col("id") === dstId)
  }

  /** Variable-length expansion: enumerate all simple paths (cycle-free, as
    * the reference checks via path.contains_vertex: vle.rs:117-121) of length
    * in [minLength, maxLength] starting from `starts` (an `id` column).
    *
    * Returns (start_id, end_id, len, path) where path is the full vertex-id
    * sequence. Result size is worst-case exponential — `maxPaths` caps it
    * deterministically (ordered by (len, path)) like the reference's
    * max_paths option (vle.rs:60-63,124-127).
    */
  def vle(edges: DataFrame, starts: DataFrame, minLength: Int, maxLength: Int,
      dir: Direction = Direction.Out, maxPaths: Option[Int] = None): DataFrame = {
    require(minLength >= 1 && maxLength >= minLength, "need 1 <= min <= max")
    val e = Direction.orient(edges, dir).localCheckpoint()
    var frontier = starts.select(col("id").cast("long").as("start_id"))
      .distinct()
      .withColumn("end_id", col("start_id"))
      .withColumn("path", array(col("start_id")))
      .localCheckpoint()
    var results: Option[DataFrame] = None
    var len = 0
    while (len < maxLength && !frontier.isEmpty) {
      len += 1
      frontier = e.join(broadcast(frontier), frontier("end_id") === e("src"))
        .where(!array_contains(col("path"), e("dst")))
        .select(col("start_id"), e("dst").as("end_id"),
          concat(col("path"), array(e("dst"))).as("path"))
        .localCheckpoint()
      if (len >= minLength) {
        val withLen = frontier.withColumn("len", lit(len))
        results = Some(results.map(_.unionByName(withLen)).getOrElse(withLen))
      }
    }
    val all = results.getOrElse(
      frontier.withColumn("len", lit(0)).limit(0))
      .select(col("start_id"), col("end_id"), col("len"), col("path"))
    maxPaths match {
      case Some(k) => all.orderBy(col("len"), col("path")).limit(k)
      case None    => all
    }
  }

  /** Vertices at exactly k hops (reference vle.rs:196-220): distinct BFS
    * level-k endpoints (note: reference defines this via simple paths; on a
    * DAG or when k is minimal these agree — we use distance semantics, which
    * is the scalable definition).
    */
  def kHopNeighbors(edges: DataFrame, starts: DataFrame, k: Int,
      dir: Direction = Direction.Out): DataFrame =
    bfsDistances(edges, starts, k, dir).where(col("dist") === k).select("id")

  /** All vertices within [1, k] hops (vle.rs:231-251). */
  def neighborsWithin(edges: DataFrame, starts: DataFrame, k: Int,
      dir: Direction = Direction.Out): DataFrame =
    bfsDistances(edges, starts, k, dir).where(col("dist").between(1, k)).select("id", "dist")
}
