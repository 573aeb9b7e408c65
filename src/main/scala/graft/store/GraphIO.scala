package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Graphid

/** JSON / CSV graph interchange (reference src/tools/import.rs:309-427,
  * export.rs:45-244; formats in FIXTURES.md §1-2). String ids in the
  * interchange files are remapped to packed Graphids exactly like the
  * reference's id-mapping pass, but distributed: the mapping is a
  * DataFrame join, not a driver-side HashMap.
  */
object GraphIO {

  /** Deterministic label dictionary: labels sorted, ids assigned from 1
    * (vertices) / 1001 (edges) — the l: keyspace analogue.
    */
  private def labelIds(labels: Seq[String], base: Int): Map[String, Int] =
    labels.sorted.zipWithIndex.map { case (l, i) => l -> (base + i) }.toMap

  /** Import the single-document {vertices:[...], edges:[...]} JSON format.
    * Vertex `id` is an arbitrary string key; edges reference start/end by
    * that key. Properties become a JSON string column (schemaless, like the
    * reference); use fromJsonTyped to project a typed table.
    */
  def importJson(spark: SparkSession, path: String): GraphStore = {
    import org.apache.spark.sql.types._
    // Explicit schema with VARIANT properties: schema inference would unify
    // a property key holding different JSON types across vertices (e.g.
    // boolean false on one, string "false" on another) into one string
    // column, destroying the type distinction the reference keeps (its
    // import parses each value to a typed serde_json::Value). VARIANT
    // preserves the per-row JSON type end-to-end, and skipping inference
    // also saves the extra full read of the file.
    val schema = StructType(Seq(
      StructField("vertices", ArrayType(StructType(Seq(
        StructField("id", StringType), StructField("label", StringType),
        StructField("properties", VariantType))))),
      StructField("edges", ArrayType(StructType(Seq(
        StructField("id", StringType), StructField("label", StringType),
        StructField("start", StringType), StructField("end", StringType),
        StructField("properties", VariantType)))))))
    val doc = spark.read.option("multiLine", true).schema(schema).json(path)
    // properties may arrive as a JSON object (fresh import) or as an
    // already-serialized JSON string (re-import of our own export) — a
    // VARIANT of STRING type unwraps to the serialized text itself. An
    // absent/null properties field normalizes to the empty object. This is
    // a DOCUMENTED DIVERGENCE, not parity: the reference's JsonVertex/
    // JsonEdge declare `properties: HashMap<...>` with no #[serde(default)]
    // (import.rs:95,104), so serde REJECTS rows whose properties field is
    // absent or null — the reference drops/errors such rows. We accept
    // them as `{}` deliberately (lenient ingest beats row loss for a bulk
    // importer), and a NULL here would make toJSON-based exports silently
    // drop the properties key.
    def propsOf: org.apache.spark.sql.Column =
      coalesce(
        when(schema_of_variant(col("properties")) === "STRING",
          try_variant_get(col("properties"), "$", "string"))
          // an explicit JSON null is a variant-null VALUE (not SQL NULL),
          // which to_json would render as the text "null"
          .when(schema_of_variant(col("properties")) === "VOID", lit("{}"))
          .otherwise(to_json(col("properties"))),
        lit("{}"))
    def section(field: String): DataFrame =
      doc.select(explode(col(field)).as("x")).select(col("x.*"))
    val v0 = section("vertices")
    val vRaw = v0.select(col("id").cast("string").as("key"), col("label"),
      propsOf.as("properties"))
    val e0 = section("edges")
    val eRaw = e0.select(col("label"), col("start").cast("string").as("start"),
      col("end").cast("string").as("end"), propsOf.as("properties"))
    buildStore(spark, vRaw, eRaw)
  }

  /** CSV import: vertices.csv has header id,label,<prop cols>; edges.csv has
    * id,label,start,end,<prop cols> (reference import.rs:109-274). Empty ids
    * are auto-generated. Property columns fold into a JSON string with the
    * reference's per-cell type inference (import.rs:64-70 deserializes each
    * cell into a serde_json::Value through the csv crate, which tries
    * integer, then float, then string — booleans are NOT inferred): a cell
    * of digits becomes a JSON number, a float literal a JSON double, and
    * anything else a JSON string. A flat struct+to_json cannot express this
    * (one type per column, not per cell), so the JSON text is assembled
    * per cell. Empty cells (which Spark's CSV reader surfaces as NULL,
    * quoted or not) become present empty-string properties — the csv
    * crate deserializes an empty cell to String(""), so the reference
    * keeps the key; dropping it would flip existence checks.
    */
  def importCsv(spark: SparkSession, vertexCsv: String, edgeCsv: String): GraphStore = {
    // escape=" selects RFC-4180 doubled-quote escaping — the format the
    // reference's csv crate reads and our exportCsv writes
    val v = spark.read.option("header", true).option("escape", "\"").csv(vertexCsv)
    val vProps = v.columns.filterNot(Set("id", "label")).toSeq
    val vRaw = v.select(
      coalesce(col("id").cast("string"), concat(lit("__auto_"), monotonically_increasing_id()))
        .as("key"),
      col("label"), csvProps(vProps).as("properties"))
    val e = spark.read.option("header", true).option("escape", "\"").csv(edgeCsv)
    val eProps = e.columns.filterNot(Set("id", "label", "start", "end")).toSeq
    val eRaw = e.select(col("label"), col("start").cast("string"),
      col("end").cast("string"), csvProps(eProps).as("properties"))
    buildStore(spark, vRaw, eRaw)
  }

  /** A lone prop column literally named `properties` is the exportCsv
    * shape (id,label,properties-as-JSON — the same layout the reference's
    * export_vertices_to_csv writes, export.rs:60-69): its cells are
    * already the JSON blob, so pass them through instead of escaping the
    * text into a nested string. The reference's own importer cannot
    * re-read its exporter's layout at all; here the roundtrip closes.
    */
  private def csvProps(props: Seq[String]): org.apache.spark.sql.Column =
    if (props == Seq("properties")) col("properties") else typedPropsJson(props)

  /** {"k":v,...} over the given string columns, each cell typed by the
    * reference's inference order: 18-digit-bounded integers stay integer
    * text (the bound keeps cast("long") exact — the reference accepts up
    * to u64, a documented sliver of divergence past 2^59), float literals
    * normalize through double, everything else is a JSON-escaped string.
    * NULL (= empty) cells become "" string properties (see importCsv doc).
    */
  private def typedPropsJson(cols: Seq[String]): org.apache.spark.sql.Column = {
    def cellJson(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      // optional leading + on the integer branch: the reference's i64
      // parse accepts "+5" as the integer 5 (cast("long") handles the sign)
      when(c.rlike("^[+-]?[0-9]{1,18}$"), c.cast("long").cast("string"))
        // the finite guard keeps overflowing literals (1e999 -> Infinity,
        // a bare token that would corrupt the whole JSON string) on the
        // string branch; serde's f64 path can't represent them either
        .when(c.rlike("^[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$") &&
            c.cast("double").between(-Double.MaxValue, Double.MaxValue),
          c.cast("double").cast("string"))
        .otherwise(concat(lit("\""),
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
            "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t"),
          lit("\"")))
    val entries = cols.sorted.map { k =>
      concat(lit("\"" + k + "\":"), cellJson(coalesce(col(k), lit(""))))
    }
    concat(lit("{"), concat_ws(",", entries.toIndexedSeq: _*), lit("}"))
  }

  private def buildStore(spark: SparkSession, vRaw: DataFrame, eRaw: DataFrame): GraphStore = {
    val vLabels = vRaw.select("label").distinct().collect().map(_.getString(0)).toSeq
    val eLabels = eRaw.select("label").distinct().collect().map(_.getString(0)).toSeq
    val vLab = labelIds(vLabels, 1)
    val eLab = labelIds(eLabels, 1001)

    // string key -> packed id mapping: per-label dense local ids by key order
    // (deterministic; the reference's counter allocation analogue). Dense
    // ranks come from a range-partitioned sort + per-partition offsets
    // (Ids.withSequencePerLabel) — a per-label window would funnel each
    // label's whole vertex set through a single task.
    val mapping = Ids.withSequencePerLabel(
        vRaw.select(col("key"), col("label")), "label", Seq("key"), "locid")
      .withColumn("labid",
        coalesce(vLabels.map(l => when(col("label") === l, lit(vLab(l)))): _*))
      .withColumn("vid", Graphid.packCol(0, col("locid"))
        .bitwiseOR(shiftleft(col("labid").cast("long"), Graphid.LocalBits)))
      .select(col("key"), col("vid"))

    val vertexTables = vLabels.map { l =>
      l -> vRaw.filter(col("label") === l)
        .join(mapping, "key")
        .select(col("vid").as("id"), col("properties"))
    }.toMap

    val edgeTables = eLabels.map { l =>
      val joined = eRaw.filter(col("label") === l)
        .join(mapping.withColumnRenamed("key", "start").withColumnRenamed("vid", "src"), "start")
        .join(mapping.withColumnRenamed("key", "end").withColumnRenamed("vid", "dst"), "end")
      l -> Ids.withSequencePerLabel(joined, "label", Seq("start", "end"), "locid")
        .withColumn("id", Graphid.packCol(eLab(l), col("locid")))
        .select(col("id"), col("src"), col("dst"), col("properties"))
    }.toMap
    new GraphStore(vertexTables, edgeTables)
  }

  /** Edges in interchange shape: start/end instead of src/dst
    * (FIXTURES.md §1, reference export.rs:160-244).
    */
  private def interchangeEdges(store: GraphStore): DataFrame =
    store.allEdges.select(col("label"), col("src").cast("string").as("start"),
      col("dst").cast("string").as("end"), col("properties"))

  /** Scalable export: JSON-lines per label directory (df.write.json). */
  def exportJsonLines(store: GraphStore, outDir: String): Unit = {
    store.allVertices.write.mode("overwrite").json(s"$outDir/vertices")
    interchangeEdges(store).write.mode("overwrite").json(s"$outDir/edges")
  }

  /** Ceiling for [[exportJsonDoc]]'s driver-side collect: past this many
    * elements a single JSON document is the wrong interchange format at
    * any scale this engine targets — the caller wants exportJsonLines.
    */
  val JsonDocMaxElements: Long = 4L * 1000 * 1000

  /** Single-document export matching the reference's format
    * (export.rs:160-244). Driver-side collect — small graphs only, by
    * design, and GUARDED: an accidental call on a big store fails loudly
    * instead of silently OOMing the driver (r13 VERDICT); large graphs
    * use exportJsonLines.
    */
  def exportJsonDoc(store: GraphStore,
      maxElements: Long = JsonDocMaxElements): String = {
    val n = store.allVertices.count() + store.allEdges.count()
    require(n <= maxElements,
      s"exportJsonDoc: $n graph elements exceed the single-document " +
        s"ceiling ($maxElements) — use exportJsonLines for stores " +
        "this size")
    val vs = store.allVertices.orderBy(col("id")).toJSON.collect()
    val es = interchangeEdges(store).orderBy(col("start"), col("end")).toJSON.collect()
    s"""{"vertices":[${vs.mkString(",")}],"edges":[${es.mkString(",")}]}"""
  }

  /** CSV export, properties as a JSON string column (export.rs:45-158).
    * Edges go out in interchange shape (start/end) so importCsv reads the
    * files back directly — edge ids are re-allocated on import either way.
    */
  def exportCsv(store: GraphStore, outDir: String): Unit = {
    // escape=" writes RFC-4180 doubled quotes — what the reference's csv
    // crate writes and reads, and what importCsv expects back
    store.allVertices.write.mode("overwrite").option("header", true)
      .option("escape", "\"").csv(s"$outDir/vertices")
    interchangeEdges(store).write.mode("overwrite").option("header", true)
      .option("escape", "\"").csv(s"$outDir/edges")
  }

  // ---- Cypher-script export (reference tools/data_generator.rs:393-439) ----

  /** `{k: 'v', k2: 3}` fragment from a table's typed columns: strings/dates
    * single-quoted with '/\ backslash-escaped, numerics and booleans raw,
    * NULL properties omitted (the reference formats its JSON property map
    * the same way; everything stays codegen'd — no driver formatting).
    */
  private def propsFragment(df: DataFrame, skip: Set[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    val parts = df.schema.fields.filterNot(f => skip(f.name)).map { f =>
      val v = f.dataType match {
        case _: NumericType | BooleanType => col(f.name).cast("string")
        case _ => concat(lit("'"),
          // escape quotes/backslashes, then fold newlines/tabs to \n \r \t
          // escapes (the Lexer decodes them): statements stay one-line, so
          // no string content can ever look like a line-anchored comment
          // or confuse line-based tooling
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col(f.name).cast("string"),
            "(['\\\\])", "\\\\$1"), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t"),
          lit("'"))
      }
      when(col(f.name).isNotNull, concat(lit(f.name + ": "), v))
    }
    // NULL (not "") when no property survives, so outer concat_ws skips it
    nullif(concat_ws(", ", parts.toIndexedSeq: _*), lit(""))
  }

  /** One `CREATE (n<id>:<label> {id: <id>, props…});` line per vertex —
    * the reference's statement shape (data_generator.rs:400-416), plus an
    * explicit `id` property so replay is id-exact: the reference's edge
    * statements bind endpoints by `id(a) = N`, which only works if vertex
    * ids survive the roundtrip; CypherSession's CREATE honors an explicit
    * id property instead of allocating (Planner.compileCreate).
    */
  private def cypherVertexStmts(store: GraphStore): DataFrame =
    store.vertexTables.toSeq.sortBy(_._1).map { case (label, df) =>
      df.select(col("id"), concat(
        lit("CREATE (n"), col("id").cast("string"), lit(s":$label {"),
        concat_ws(", ", concat(lit("id: "), col("id").cast("string")),
          propsFragment(df, Set("id"))),
        lit("});")).as("stmt"))
    }.reduceOption(_.unionByName(_))
      .map(_.orderBy(col("id")).select("stmt"))
      .getOrElse(emptyStmts(store))

  /** One `MATCH (a), (b) WHERE id(a) = S AND id(b) = E CREATE
    * (a)-[:LABEL {…}]->(b);` line per edge (data_generator.rs:419-439),
    * with the edge's own id carried as an explicit property.
    */
  private def cypherEdgeStmts(store: GraphStore): DataFrame =
    store.edgeTables.toSeq.sortBy(_._1).map { case (label, df) =>
      df.select(col("id"), concat(
        lit("MATCH (a), (b) WHERE id(a) = "), col("src").cast("string"),
        lit(" AND id(b) = "), col("dst").cast("string"),
        lit(s" CREATE (a)-[:$label {"),
        concat_ws(", ", concat(lit("id: "), col("id").cast("string")),
          propsFragment(df, Set("id", "src", "dst"))),
        lit("}]->(b);")).as("stmt"))
    }.reduceOption(_.unionByName(_))
      .map(_.orderBy(col("id")).select("stmt"))
      .getOrElse(emptyStmts(store))

  private def emptyStmts(store: GraphStore): DataFrame = {
    val spark = (store.vertexTables.values ++ store.edgeTables.values)
      .headOption.map(_.sparkSession)
      .getOrElse(SparkSession.active)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("stmt",
          org.apache.spark.sql.types.StringType))))
  }

  /** Scalable Cypher-script export: statement text files, vertices in
    * `01_vertices`, edges in `02_edges` (lexicographic dir order = replay
    * order). Distributed text writes — no driver materialization.
    */
  def exportCypher(store: GraphStore, outDir: String): Unit = {
    cypherVertexStmts(store).write.mode("overwrite").text(s"$outDir/01_vertices")
    cypherEdgeStmts(store).write.mode("overwrite").text(s"$outDir/02_edges")
  }

  /** Single-document Cypher script matching the reference's graph.cypher
    * layout (section comments included). Driver-side collect — small
    * graphs only, by design; large graphs use exportCypher.
    */
  def exportCypherScript(store: GraphStore): String = {
    val vs = cypherVertexStmts(store).collect().map(_.getString(0))
    val es = cypherEdgeStmts(store).collect().map(_.getString(0))
    "-- Create Vertices\n" + vs.mkString("\n") +
      "\n\n-- Create Edges\n" + es.mkString("\n") + "\n"
  }
}
