package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Graphid
import graft.store.GraphStore

/** Seeded synthetic graph generator (reference tools/data_generator.rs:
  * uniform | power-law | grid | tree, seed-deterministic). Spark-native:
  * spark.range + xxhash64-derived pseudo-randomness — no driver-side RNG,
  * so generation is distributed and reproducible at any scale.
  */
object DataGenerator {

  private val cities = Seq("New York", "Los Angeles", "Chicago", "Houston",
    "Phoenix", "Philadelphia", "San Antonio", "San Diego", "Dallas", "San Jose")

  val PersonLab = 100
  val KnowsLab = 101
  val GridLab = 102
  val ConnLab = 103

  /** Deterministic pseudo-random long in [0, bound) from (seed, tag, i). */
  private def prand(seed: Long, tag: String, i: org.apache.spark.sql.Column, bound: Long) =
    pmod(xxhash64(lit(seed), lit(tag), i), lit(bound))

  private def persons(spark: SparkSession, n: Long, seed: Long): DataFrame =
    spark.range(n).select(
      Graphid.packCol(PersonLab, col("id") + 1).as("id"),
      concat(lit("Person"), col("id")).as("name"),
      (prand(seed, "age", col("id"), 63) + 18).as("age"),
      element_at(array(cities.map(lit): _*),
        (prand(seed, "city", col("id"), cities.size.toLong) + 1).cast("int")).as("city"))

  /** Uniform random graph: nEdges edges with uniform endpoints. */
  def uniform(spark: SparkSession, nVertices: Long, nEdges: Long, seed: Long = 42): GraphStore = {
    val edges = spark.range(nEdges).select(
      Graphid.packCol(KnowsLab, col("id") + 1).as("id"),
      Graphid.packCol(PersonLab, prand(seed, "src", col("id"), nVertices) + 1).as("src"),
      Graphid.packCol(PersonLab, prand(seed, "dst", col("id"), nVertices) + 1).as("dst"),
      (lit(2020) + prand(seed, "since", col("id"), 5)).as("since"))
    new GraphStore(Map("Person" -> persons(spark, nVertices, seed)),
      Map("KNOWS" -> edges))
  }

  /** Power-law-ish graph: destination popularity ~ u^3 concentrates edges on
    * low ids (preferential-attachment shape, seeded and distributed).
    */
  def powerLaw(spark: SparkSession, nVertices: Long, nEdges: Long, seed: Long = 42): GraphStore = {
    val u = prand(seed, "pl", col("id"), 1L << 30).cast("double") / lit((1L << 30).toDouble)
    val dst = (pow(u, 3.0) * nVertices).cast("long") % nVertices
    val edges = spark.range(nEdges).select(
      Graphid.packCol(KnowsLab, col("id") + 1).as("id"),
      Graphid.packCol(PersonLab, prand(seed, "src", col("id"), nVertices) + 1).as("src"),
      Graphid.packCol(PersonLab, dst + 1).as("dst"),
      (lit(2020) + prand(seed, "since", col("id"), 5)).as("since"))
    new GraphStore(Map("Person" -> persons(spark, nVertices, seed)),
      Map("KNOWS" -> edges))
  }

  /** R×C 4-connected grid with right+down CONNECTED edges (the reference's
    * shortest-path benchmark graph; corner→corner BFS cost = R+C-2).
    */
  def grid(spark: SparkSession, rows: Int, cols: Int): GraphStore = {
    val n = rows.toLong * cols
    val verts = spark.range(n).select(
      Graphid.packCol(GridLab, col("id") + 1).as("id"),
      (col("id") / cols).cast("int").as("x"),
      (col("id") % cols).cast("int").as("y"),
      concat(lit("node_"), col("id")).as("name"))
    // closed-form unique edge ids (2*from+{1,2}) — no global window, stays
    // inside whole-stage codegen at any grid size
    val right = spark.range(n).filter(col("id") % cols =!= (cols - 1))
      .select(col("id").as("from"), (col("id") + 1).as("to"),
        (col("id") * 2 + 1).as("eid"))
    val down = spark.range(n).filter(col("id") < n - cols)
      .select(col("id").as("from"), (col("id") + cols).as("to"),
        (col("id") * 2 + 2).as("eid"))
    val edges = right.unionByName(down)
      .select(
        Graphid.packCol(ConnLab, col("eid")).as("id"),
        Graphid.packCol(GridLab, col("from") + 1).as("src"),
        Graphid.packCol(GridLab, col("to") + 1).as("dst"),
        lit(1.0).as("distance"))
    new GraphStore(Map("GridNode" -> verts), Map("CONNECTED" -> edges))
  }

  /** Complete b-ary tree of the given depth, edges parent→child. */
  def tree(spark: SparkSession, depth: Int, branching: Int): GraphStore = {
    val n = (0 to depth).map(d => math.pow(branching, d).toLong).sum
    val verts = spark.range(n).select(
      Graphid.packCol(GridLab, col("id") + 1).as("id"),
      concat(lit("node_"), col("id")).as("name"))
    val edges = spark.range(1, n).select(
      Graphid.packCol(ConnLab, col("id")).as("id"),
      Graphid.packCol(GridLab, ((col("id") - 1) / branching).cast("long") + 1).as("src"),
      Graphid.packCol(GridLab, col("id") + 1).as("dst"),
      lit(1.0).as("distance"))
    new GraphStore(Map("GridNode" -> verts), Map("CONNECTED" -> edges))
  }
}
