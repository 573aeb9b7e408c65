package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.algorithms.GraphAlgorithms
import graft.store.GraphStore
import graft.tools.DataGenerator

/** Whole-graph analytics + store persistence tests. */
class AlgorithmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("connected components: two disjoint chains") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val cc = GraphAlgorithms.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) == cc(2L) && cc(2L) == cc(3L))
    assert(cc(10L) == cc(11L))
    assert(cc(1L) != cc(10L))
  }

  test("DataFrame connected components equals GraphX min-id labels") {
    val g = graft.tools.DataGenerator.uniform(spark, 120, 150, seed = 13)
    val e = g.allEdges.select($"src", $"dst")
    val viaDf = GraphAlgorithms.connectedComponentsDF(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaGraphX = GraphAlgorithms.connectedComponents(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDf == viaGraphX && viaDf.nonEmpty)
  }

  test("degrees full-outer: sources, sinks, both") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = GraphAlgorithms.degrees(edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d(1L) == ((0L, 2L))) // pure source
    assert(d(3L) == ((2L, 0L))) // pure sink
    assert(d(2L) == ((1L, 1L)))
  }

  test("triangle count on a triangle") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val t = GraphAlgorithms.triangleCount(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(t == Map(1L -> 1, 2L -> 1, 3L -> 1))
  }

  test("pageRank: sink of a star ranks highest") {
    // 1..5 all point at 6
    val edges = (1L to 5L).map(i => (i, 6L)).toDF("src", "dst")
    val pr = GraphAlgorithms.pageRank(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(6L) > pr(1L))
  }

  test("GraphStore save/load roundtrip preserves tables and queries") {
    val g = DataGenerator.grid(spark, 4, 4)
    val dir = java.nio.file.Files.createTempDirectory("store").toString
    g.save(dir)
    val g2 = GraphStore.load(spark, dir)
    assert(g2.vertexLabels == Seq("GridNode"))
    assert(g2.edgeLabels == Seq("CONNECTED"))
    assert(g2.vertices("GridNode").count() == 16)
    assert(g2.edges("CONNECTED").count() == g.edges("CONNECTED").count())
    // still queryable through Cypher after reload
    val sess = new graft.cypher.CypherSession(spark, g2)
    val n = sess.run("MATCH (a:GridNode)-[:CONNECTED]->(b) RETURN count(*) AS n")
      .collect()(0).getLong(0)
    assert(n == 24) // 4x4 grid: 12 right + 12 down
  }
}
