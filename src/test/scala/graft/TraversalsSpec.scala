package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.algorithms.{Direction, PregelSssp, Traversals}
import graft.model.Graphid
import graft.store.GraphStore
import graft.tools.DataGenerator

/** Algorithm tests on the reference's canonical fixtures (FIXTURES.md §3):
  * the 5-node DAG (A→B, A→C, B→D, B→E, C→E) and R×C grids with known
  * shortest-path costs.
  */
class TraversalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def dag: GraphStore = {
    val v = Seq("A", "B", "C", "D", "E").zipWithIndex
      .map { case (n, i) => (Graphid.pack(1, i + 1), n) }.toDF("id", "name")
    def id(n: String) = Graphid.pack(1, "ABCDE".indexOf(n) + 1)
    val e = Seq(("A", "B"), ("A", "C"), ("B", "D"), ("B", "E"), ("C", "E")).zipWithIndex
      .map { case ((s, d), i) => (Graphid.pack(2, i + 1), id(s), id(d)) }
      .toDF("id", "src", "dst")
    new GraphStore(Map("Node" -> v), Map("LINK" -> e))
  }

  def idOf(n: String): Long = Graphid.pack(1, "ABCDE".indexOf(n) + 1)

  test("BFS distances on 5-node DAG: A→D cost 2") {
    val d = Traversals.shortestPathDist(dag.edges("LINK"), idOf("A"), idOf("D"), 5)
      .collect()
    assert(d.length == 1 && d(0).getInt(1) == 2)
  }

  test("VLE from A length 1..2 yields 5 paths, 2 of them reach E at length 2") {
    val paths = Traversals.vle(dag.edges("LINK"), Seq(idOf("A")).toDF("id"), 1, 2)
    assert(paths.count() == 5) // len 1: A→B, A→C; len 2: A→B→D, A→B→E, A→C→E
    val toE = paths.filter($"end_id" === idOf("E") && $"len" === 2)
    assert(toE.count() == 2)
  }

  test("k-hop neighbors: 1-hop of A = {B, C}") {
    val n = Traversals.kHopNeighbors(dag.edges("LINK"), Seq(idOf("A")).toDF("id"), 1)
      .collect().map(_.getLong(0)).toSet
    assert(n == Set(idOf("B"), idOf("C")))
  }

  test("neighborsWithin 2 of A = {B, C, D, E}") {
    val n = Traversals.neighborsWithin(dag.edges("LINK"), Seq(idOf("A")).toDF("id"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(n == Set(idOf("B"), idOf("C"), idOf("D"), idOf("E")))
  }

  test("Both direction: neighbors of E within 1 = {B, C}") {
    val n = Traversals.neighborsWithin(dag.edges("LINK"), Seq(idOf("E")).toDF("id"), 1,
      Direction.Both).select("id").collect().map(_.getLong(0)).toSet
    assert(n == Set(idOf("B"), idOf("C")))
  }

  test("grid 10x10: corner-to-corner BFS cost = 18, Pregel agrees") {
    val g = DataGenerator.grid(spark, 10, 10)
    val src = Graphid.pack(DataGenerator.GridLab, 1)
    val dst = Graphid.pack(DataGenerator.GridLab, 100)
    val bfs = Traversals.shortestPathDist(g.edges("CONNECTED"), src, dst, 20).collect()
    assert(bfs.length == 1 && bfs(0).getInt(1) == 18)
    val pregel = PregelSssp.run(spark, g.edges("CONNECTED"), src)
      .filter($"id" === dst).collect()
    assert(pregel.length == 1 && pregel(0).getDouble(1) == 18.0)
  }

  test("tree generator: root reaches all leaves at depth d") {
    val g = DataGenerator.tree(spark, 3, 2) // 15 nodes
    val root = Graphid.pack(DataGenerator.GridLab, 1)
    val leaves = Traversals.kHopNeighbors(g.edges("CONNECTED"), Seq(root).toDF("id"), 3)
    assert(leaves.count() == 8)
  }

  test("uniform generator is deterministic") {
    val a = DataGenerator.uniform(spark, 100, 300, seed = 7)
    val b = DataGenerator.uniform(spark, 100, 300, seed = 7)
    assert(a.edges("KNOWS").collect().toSeq == b.edges("KNOWS").collect().toSeq)
  }
}
