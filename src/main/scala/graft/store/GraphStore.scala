package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Graphid

/** A directed labeled property graph over DataFrames — the Spark-native
  * analogue of the reference's per-label RocksDB keyspaces
  * (/root/reference/src/storage/rocksdb_store.rs:3-9). One DataFrame per
  * vertex label and per edge label, each with NATIVE typed property columns
  * (so Catalyst gets full predicate pushdown + column pruning, unlike the
  * reference's schemaless JSON blobs). Label-keyed maps are the analogue of
  * the reference's per-label key prefix: a label scan touches only its own
  * files.
  *
  * Vertex table schema: (id: Long, <typed props...>); id packs the label id
  * in the high 16 bits (graft.model.Graphid).
  * Edge table schema: (id: Long, src: Long, dst: Long, <typed props...>).
  *
  * At 100 TB: each label's DataFrame is its own parquet dataset; edges are
  * additionally stored bucketed by `src` (and a mirrored copy by `dst`) so
  * out-/in-expansion joins are shuffle-free — see `writeBucketed`.
  */
final class GraphStore(
    val vertexTables: Map[String, DataFrame],
    val edgeTables: Map[String, DataFrame]) extends Serializable {

  def vertexLabels: Seq[String] = vertexTables.keys.toSeq.sorted
  def edgeLabels: Seq[String] = edgeTables.keys.toSeq.sorted

  /** Label scan — the analogue of rocksdb_store.rs:606-627 prefix iteration.
    * O(label's own data) because labels are separate datasets.
    */
  def vertices(label: String): DataFrame = {
    val df = vertexTables.getOrElse(label, sys.error(s"unknown vertex label: $label"))
    df.withColumn("label", lit(label))
  }

  def edges(label: String): DataFrame = {
    val df = edgeTables.getOrElse(label, sys.error(s"unknown edge label: $label"))
    df.withColumn("label", lit(label))
  }

  /** All vertices with a uniform schema (id, label, properties as a JSON
    * string). Used only for label-free scans and export; typed per-label
    * tables are the hot path.
    */
  /** Typed prop columns fold into a JSON string; a table whose only prop
    * column IS `properties` (the schemaless shape) passes it through —
    * wrapping it again would nest the JSON one level deeper on every
    * export/reimport roundtrip and break unlabeled-scan property reads.
    */
  private def propsJson(df: DataFrame, props: Seq[String]): Column =
    if (props == Seq("properties")) col("properties")
    else to_json(struct(props.map(col).toIndexedSeq: _*))

  def allVertices: DataFrame =
    vertexTables.toSeq.sortBy(_._1).map { case (label, df) =>
      val props = df.columns.filterNot(_ == "id").toSeq
      df.select(col("id"), lit(label).as("label"),
        propsJson(df, props).as("properties"))
    }.reduce(_.unionByName(_))

  def allEdges: DataFrame =
    edgeTables.toSeq.sortBy(_._1).map { case (label, df) =>
      val props = df.columns.filterNot(Set("id", "src", "dst")).toSeq
      df.select(col("id"), col("src"), col("dst"), lit(label).as("label"),
        propsJson(df, props).as("properties"))
    }.reduce(_.unionByName(_))

  /** Point get (rocksdb_store.rs:499-509): id carries the label in its high
    * bits, so we prune to one label's dataset before the pushed-down filter.
    */
  def vertexById(id: Long, labelOf: Int => Option[String]): DataFrame = {
    val (labid, _) = Graphid.unpack(id)
    labelOf(labid) match {
      case Some(l) => vertices(l).where(col("id") === id)
      case None    => allVertices.where(col("id") === id)
    }
  }

  /** Out-edges of a set of vertices — the o: index analogue
    * (rocksdb_store.rs:652-681). `frontier` must have an `id` column.
    * A broadcast-able equi-join, not a per-vertex loop.
    */
  def outEdges(frontier: DataFrame, edgeLabel: Option[String] = None): DataFrame =
    edgesOf(edgeLabel).join(frontier.select(col("id").as("__fid")),
      col("src") === col("__fid")).drop("__fid")

  def inEdges(frontier: DataFrame, edgeLabel: Option[String] = None): DataFrame =
    edgesOf(edgeLabel).join(frontier.select(col("id").as("__fid")),
      col("dst") === col("__fid")).drop("__fid")

  private def edgesOf(label: Option[String]): DataFrame =
    label.map(edges).getOrElse(allEdges)

  def withVertexTable(label: String, df: DataFrame): GraphStore =
    new GraphStore(vertexTables + (label -> df), edgeTables)

  def withEdgeTable(label: String, df: DataFrame): GraphStore =
    new GraphStore(vertexTables, edgeTables + (label -> df))

  /** Truncate every table's lineage (lazy local checkpoint). Sequential
    * mutations (CypherSession script replay, SocialGraph follow/unfollow)
    * wrap tables in another union/filter per statement; without periodic
    * compaction a thousand-mutation session pays O(mutations) planning
    * time on every query. Callers compact every N mutations — planning
    * stays flat, and the default checkpoint is lazy so no job runs until
    * the next action anyway.
    *
    * `eager = true` materializes every table's checkpoint NOW (one small
    * job per table): callers that release the previous generation's blocks
    * right after compacting (CypherSession.runScript) need the new
    * generation independent of them first — releasing a block a LAZY
    * checkpoint still depends on would fail recomputation, because
    * localCheckpoint truncates the lineage it would recompute through.
    */
  def compact(eager: Boolean = false): GraphStore =
    new GraphStore(
      vertexTables.map { case (l, df) => l -> df.localCheckpoint(eager) },
      edgeTables.map { case (l, df) => l -> df.localCheckpoint(eager) })

  /** Persist the store as per-label parquet datasets (the durable layout:
    * one directory per label = the reference's per-label key prefix).
    */
  def save(dir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // independent per-label datasets: submit the write jobs concurrently so
    // small labels overlap the big ones instead of serializing 12 jobs
    val jobs =
      vertexTables.toSeq.map { case (l, df) =>
        Future(df.write.mode("overwrite").parquet(s"$dir/vertices/$l"))
      } ++ edgeTables.toSeq.map { case (l, df) =>
        Future(df.write.mode("overwrite").parquet(s"$dir/edges/$l"))
      }
    Await.result(Future.sequence(jobs), Duration.Inf)
  }

  /** Persist edges bucketed by src, plus a mirrored copy bucketed by dst —
    * at cluster scale this makes every hop join shuffle-free in BOTH
    * directions (out-expansion reads the src buckets, in-expansion the dst
    * mirror; SURVEY.md §1.2). The 2× storage is the standard trade: edge
    * data is a fraction of property data, and a per-hop shuffle of the
    * full edge relation costs more than the mirror at every query.
    * Local tests use the in-memory tables directly.
    */
  def writeBucketed(warehouseDir: String, buckets: Int = 64)(implicit spark: SparkSession): Unit = {
    edgeTables.foreach { case (label, df) =>
      df.write.mode("overwrite")
        .bucketBy(buckets, "src").sortBy("src")
        .option("path", s"$warehouseDir/edges_$label")
        .saveAsTable(s"edges_${label.toLowerCase}")
      df.write.mode("overwrite")
        .bucketBy(buckets, "dst").sortBy("dst")
        .option("path", s"$warehouseDir/edges_${label}_by_dst")
        .saveAsTable(s"edges_${label.toLowerCase}_by_dst")
    }
  }
}

object GraphStore {

  /** Load a store saved with `save` (per-label parquet directories). */
  def load(spark: SparkSession, dir: String): GraphStore = {
    def labelsIn(sub: String): Seq[String] = {
      val d = new java.io.File(s"$dir/$sub")
      if (d.isDirectory) d.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
      else Nil
    }
    new GraphStore(
      labelsIn("vertices").map(l => l -> spark.read.parquet(s"$dir/vertices/$l")).toMap,
      labelsIn("edges").map(l => l -> spark.read.parquet(s"$dir/edges/$l")).toMap)
  }

  /** Label-id dictionary for the TPC-H projection — the analogue of the
    * reference's l: label keyspace (rocksdb_store.rs:188-222).
    */
  object Lab {
    val Customer = 1; val Order = 2; val Part = 3
    val Supplier = 4; val Nation = 5; val Region = 6
    val Placed = 17; val Contains = 18; val SuppliedBy = 19
    val CustNation = 20; val SuppNation = 21; val InRegion = 22
    val byId: Map[Int, String] = Map(
      Customer -> "Customer", Order -> "Order", Part -> "Part",
      Supplier -> "Supplier", Nation -> "Nation", Region -> "Region",
      Placed -> "PLACED", Contains -> "CONTAINS", SuppliedBy -> "SUPPLIED_BY",
      CustNation -> "CUST_NATION", SuppNation -> "SUPP_NATION", InRegion -> "IN_REGION")
  }

  /** Deterministic property-graph projection of the driver testdata
    * (FIXTURES.md §6). Vertices: Customer, Order, Part, Supplier, Nation,
    * Region. Edges: PLACED (customer→order), CONTAINS (order→part, carrying
    * lineitem measures), SUPPLIED_BY (part→supplier), CUST_NATION,
    * SUPP_NATION, IN_REGION.
    */
  def tpch(spark: SparkSession, sfDir: String): GraphStore = {
    def t(n: String) = Tables.load(spark, sfDir, n)
    def packId(labid: Int, c: Column) = Graphid.packCol(labid, c)

    val customer = t("customer")
    val orders = t("orders")
    val part = t("part")
    val supplier = t("supplier")
    val nation = t("nation")
    val region = t("region")
    val lineitem = t("lineitem")

    val vCustomer = customer.select(
      packId(Lab.Customer, col("c_custkey")).as("id"),
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"))
    val vOrder = orders.select(
      packId(Lab.Order, col("o_orderkey")).as("id"),
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val vPart = part.select(
      packId(Lab.Part, col("p_partkey")).as("id"),
      col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice"))
    val vSupplier = supplier.select(
      packId(Lab.Supplier, col("s_suppkey")).as("id"),
      col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    val vNation = nation.select(
      packId(Lab.Nation, col("n_nationkey")).as("id"),
      col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val vRegion = region.select(
      packId(Lab.Region, col("r_regionkey")).as("id"),
      col("r_regionkey"), col("r_name"))

    val ePlaced = orders.select(
      packId(Lab.Placed, col("o_orderkey")).as("id"),
      packId(Lab.Customer, col("o_custkey")).as("src"),
      packId(Lab.Order, col("o_orderkey")).as("dst"),
      col("o_orderdate"))
    val eContains = lineitem.select(
      packId(Lab.Contains, col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
      packId(Lab.Order, col("l_orderkey")).as("src"),
      packId(Lab.Part, col("l_partkey")).as("dst"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    // edge id = the pair's minimal lineitem provenance key: unique (each
    // (part,supp) claims a distinct min), deterministic, and bounded by the
    // lineitem keyspace — `partkey * 1e6 + suppkey` would overflow the
    // 48-bit locid at large scale factors. Same shuffle as a distinct().
    val eSuppliedBy = lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_orderkey") * 8 + col("l_linenumber")).as("__prov"))
      .select(
        packId(Lab.SuppliedBy, col("__prov")).as("id"),
        packId(Lab.Part, col("l_partkey")).as("src"),
        packId(Lab.Supplier, col("l_suppkey")).as("dst"))
    val eCustNation = customer.select(
      packId(Lab.CustNation, col("c_custkey")).as("id"),
      packId(Lab.Customer, col("c_custkey")).as("src"),
      packId(Lab.Nation, col("c_nationkey")).as("dst"))
    val eSuppNation = supplier.select(
      packId(Lab.SuppNation, col("s_suppkey")).as("id"),
      packId(Lab.Supplier, col("s_suppkey")).as("src"),
      packId(Lab.Nation, col("s_nationkey")).as("dst"))
    val eInRegion = nation.select(
      packId(Lab.InRegion, col("n_nationkey")).as("id"),
      packId(Lab.Nation, col("n_nationkey")).as("src"),
      packId(Lab.Region, col("n_regionkey")).as("dst"))

    new GraphStore(
      Map("Customer" -> vCustomer, "Order" -> vOrder, "Part" -> vPart,
        "Supplier" -> vSupplier, "Nation" -> vNation, "Region" -> vRegion),
      Map("PLACED" -> ePlaced, "CONTAINS" -> eContains,
        "SUPPLIED_BY" -> eSuppliedBy, "CUST_NATION" -> eCustNation,
        "SUPP_NATION" -> eSuppNation, "IN_REGION" -> eInRegion))
  }
}
