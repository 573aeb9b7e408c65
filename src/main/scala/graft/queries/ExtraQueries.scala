package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algorithms.Traversals
import graft.functions.Aggregators
import graft.model.Graphid
import graft.store.{GraphStore, Tables}

/** Coverage extensions: CUBE grouping sets, custom UDAFs, connected
  * components and fixed-point PageRank (all oracle-checked), plus the
  * approximate/sketch/sampling surface. Approximate results (HLL x1,
  * t-digest x2, RNG sample x3, ANN recall x9/x11, double-summing GraphX
  * PageRank x6) are engine-specific by nature, so those entries
  * deliberately have NO oracle SQL — the driver records its weaker
  * rows-only check, which is the right contract for approximation
  * operators; each has a deterministic oracle-checked counterpart
  * (x1→q14, x2→q18, x3→x15, x6→x17, x9/x11→e1).
  */
object ExtraQueries {

  private val DEC = "decimal(18,2)"

  /** Fixed probe inputs for the x32/x33 PortableLog diagnostic gates:
    * powers of two and their neighbors (exercising the exponent split's
    * boundaries), small degrees, typical counts, and the extremes of the
    * documented 1 ≤ n < 2^63 domain. One Seq feeds BOTH the Spark gate
    * and the generated oracle VALUES list so the relations are identical
    * by construction.
    */
  private val portableLogProbe: Seq[Long] = Seq(
    1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L, 10L, 15L, 16L, 17L, 31L, 32L, 33L,
    63L, 64L, 100L, 127L, 128L, 255L, 256L, 997L, 1000L, 1023L, 1024L,
    4095L, 65535L, 65536L, 1000000L, 123456789L, 2147483647L, 2147483648L,
    4294967295L, 4294967296L, 999999999999L, 1000000000000L,
    4611686018427387903L, 9223372036854775807L)

  private def probeValuesSql: String =
    portableLogProbe.map(v => s"($v)").mkString(", ")

  /** Fixed probe inputs for the x35 DECIMAL-coercion diagnostic: positive
    * decimal literals (scale ≤ 6) spanning both lnDouble branches (x < 1
    * and x ≥ 1), power-of-two neighborhoods where the exponent split's
    * FLOOR sits next to a boundary, typical price-like magnitudes (the
    * x5 geometric-mean inputs were DECIMAL(18,2) prices), and the large
    * end of the documented (2^-62, 2^62) domain. Strings, not doubles:
    * the whole point is that the oracle types them DECIMAL(18,6).
    */
  private val decimalProbe: Seq[String] = Seq(
    "0.000001", "0.015625", "0.25", "0.499999", "0.5", "0.500001",
    "0.75", "0.999999", "1", "1.000001", "1.5", "1.999999", "2",
    "2.000001", "2.718281", "3.141592", "7.389056", "8", "15.999999",
    "16", "16.000001", "63.999999", "64.000001", "100", "123.45",
    "901", "999.999999", "1000", "1024", "1789.99", "4095.999999",
    "4096.000001", "36485.12", "54321.123456", "65536", "90100.5",
    "999999.999999", "1000000", "123456789.123456",
    "999999999999.999999")

  private def decimalProbeValuesSql: String =
    decimalProbe.map { v =>
      val n = new java.math.BigDecimal(v).movePointRight(6).longValueExact()
      s"($n, '$v')"
    }.mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CUBE grouping sets (A7).
    "q16_cube" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DEC)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // multi-probe ANN (recall path for e2) — approximate, rows-only.
    "x9_ann_multiprobe" -> ((s, dir) => {
      graft.pipeline.Similarity.annTopKMultiProbe(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", Seq(0L, 1L, 2L), 5, 8)
        .orderBy(col("pid"), col("rank"))
    }),

    // Batched point-get: the Spark idiom for a point-read burst (the
    // README crossover vs the reference's embedded store) — a small probe
    // id relation arrives from ANOTHER table, is broadcast, and resolves
    // every lookup in ONE map-side join job instead of N point queries.
    "x20_batched_pointget" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      val probes = Tables.load(s, dir, "events")
        .where(col("event_type") === "purchase" && col("value") > 250)
        .select((col("user_id") + 1).as("c_custkey")).distinct()
      g.vertices("Customer")
        .join(broadcast(probes), Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // S9/bulk-load proof: save the whole store as per-label parquet, load
    // it back, and count every label — oracle-checked against the raw
    // tables, so the durable layout roundtrips losslessly.
    "x10_store_roundtrip" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      val tmp = "/tmp/graft_store_roundtrip"
      g.save(tmp)
      val loaded = GraphStore.load(s, tmp)
      // one distributed count job over every label (column pruning reads
      // only parquet footers + label literal), not 12 serial count() jobs
      loaded.allVertices.select(col("label"))
        .unionByName(loaded.allEdges.select(col("label")))
        .groupBy(col("label")).agg(count(lit(1)).as("n_rows"))
        .orderBy(col("label"))
    }),

    // end-to-end interchange: JSON graph document → GraphIO import
    // (distributed id remap) → Cypher over the schemaless store. The
    // driver-visible proof that S6 import feeds the query engine.
    "x14_graphio_cypher" -> ((s, dir) => {
      val json =
        """{"vertices":[
          |  {"id":"1","label":"Person","properties":{"name":"Alice","age":30}},
          |  {"id":"2","label":"Person","properties":{"name":"Bob","age":25}},
          |  {"id":"3","label":"Person","properties":{"name":"Charlie","age":35}}],
          |"edges":[
          |  {"label":"KNOWS","start":"1","end":"2","properties":{"since":2020}},
          |  {"label":"KNOWS","start":"2","end":"3","properties":{"since":2021}}]}"""
          .stripMargin
      val f = java.nio.file.Files.createTempFile("graft_io_gate", ".json")
      java.nio.file.Files.writeString(f, json)
      val store = graft.store.GraphIO.importJson(s, f.toString)
      new graft.cypher.CypherSession(s, store).run(
        """MATCH (a:Person)-[r:KNOWS]->(b:Person)
          |RETURN a.name AS a, toInteger(r.since) AS y, b.name AS b
          |ORDER BY a""".stripMargin)
    }),

    // S7/S8 proof: CSV vertex+edge import (auto ids, JSON-folded props,
    // distributed key remap) feeding Cypher — the CSV face of x14.
    "x18_csv_cypher" -> ((s, dir) => {
      val vCsv = "id,label,name,team\n1,Dev,Ana,core\n2,Dev,Bo,infra\n3,Dev,Cy,core\n"
      val eCsv = "id,label,start,end,since\n,REVIEWS,1,2,2023\n,REVIEWS,2,3,2024\n,REVIEWS,3,1,2024\n"
      val vf = java.nio.file.Files.createTempFile("graft_csv_v", ".csv")
      val ef = java.nio.file.Files.createTempFile("graft_csv_e", ".csv")
      java.nio.file.Files.writeString(vf, vCsv)
      java.nio.file.Files.writeString(ef, eCsv)
      val store = graft.store.GraphIO.importCsv(s, vf.toString, ef.toString)
      new graft.cypher.CypherSession(s, store).run(
        """MATCH (a:Dev)-[r:REVIEWS]->(b:Dev)
          |WHERE toInteger(r.since) >= 2024
          |RETURN a.name AS reviewer, b.name AS author, toInteger(r.since) AS y
          |ORDER BY reviewer""".stripMargin)
    }),

    // as-of join (composed union+window operator): each click joined to
    // the user's latest prior-or-equal purchase — oracle = DuckDB's native
    // ASOF LEFT JOIN.
    "x12_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.asof(clicks, purchases, "user_id", "ts", "ts")
        .select(col("event_id"), col("r_event_id").as("purchase_event_id"),
          col("r_value").as("purchase_value"))
        .orderBy(col("event_id"))
    }),

    // bucketed range join: clicks attributed to the purchase whose 1-hour
    // window contains them (same user) — equi-join on time buckets +
    // residual filter, never a broadcast-nested-loop.
    "x13_range_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      graft.operators.RangeJoin.intervalJoin(
          clicks, "ts", purchases, "w_start", "w_end", Seq("user_id"), 3600L)
        .groupBy(col("r_event_id").as("purchase_event_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy(col("purchase_event_id"))
    }),

    // IVF ANN (coarse-quantizer scale path) — approximate, rows-only.
    "x11_ann_ivf" -> ((s, dir) => {
      graft.pipeline.Similarity.ivfTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", Seq(0L, 1L, 2L), 5, 16, 4)
        .orderBy(col("pid"), col("rank"))
    }),

    // HLL approximate distinct (A7) — rows-only check by design.
    "x1_approx_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
        .orderBy(col("l_returnflag"))
    }),

    // approximate quantiles — rows-only.
    "x2_quantiles" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50"),
          percentile_approx(col("o_totalprice"), lit(0.99), lit(1000)).as("p99"))
        .orderBy(col("o_orderpriority"))
    }),

    // seeded Bernoulli sampling — rows-only (count varies by engine).
    "x3_sample" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .sample(withReplacement = false, fraction = 0.1, seed = 42)
        .agg(count(lit(1)).as("n_sampled"))
    }),

    // VLE with full path enumeration — every simple path of length 1..3
    // from customer 1, as vertex-id strings. Oracle-checked: the recursive
    // CTE enumerates the identical cycle-free walks.
    "x4_vle_paths" -> ((s, dir) => {
      import s.implicits._
      val g = GraphStore.tpch(s, dir)
      val starts = Seq(Graphid.pack(GraphStore.Lab.Customer, 1L)).toDF("id")
      Traversals.vle(g.allEdges.select(col("src"), col("dst")), starts, 1, 3)
        .select(col("start_id"), col("end_id"), col("len"),
          concat_ws("->", col("path")).as("path_str"))
        .orderBy(col("len"), col("path_str"))
    }),

    // deterministic 1-in-20 hash sample (reproducible across engines and
    // retries, unlike RNG-seeded sampling) — oracle applies the same hash.
    "x15_hash_sample" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      graft.operators.Sampling.hashSample(
          li, col("l_orderkey") * 8 + col("l_linenumber"), 20)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("l_quantity").cast(DEC)).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // salted skew join: lineitem (large, skewable l_suppkey) x supplier
    // (small dim) with 8-way key salting — result identical to the plain
    // join, hot keys spread over 8 reducers.
    "x16_salted_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val supp = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.operators.SkewJoin.saltedJoin(li, supp, Seq("l_suppkey"), 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DEC)).cast("double").as("sum_qty"))
        .orderBy(col("s_nationkey"))
    }),

    // Deterministic DataFrame PageRank: decimal-summed mass makes the FP
    // fixpoint reduction-order-independent — oracle-checked bit-for-bit
    // (GraphX x6 stays as the rows-only cross-check).
    "x17_pagerank_stable" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      // chainDepth=2: two iterations per materialized plan — measured the
      // sweet spot at sf0.1 (A/B reps, quiet host: depth 2 ~4.4 s vs
      // depth 5 ~4.9 s vs depth 1 ~4.4 s with one more job; the deep
      // chain's planning/codegen outgrows the job boundaries it saves).
      // Same fixed-point arithmetic bit-for-bit at every depth.
      graft.algorithms.GraphAlgorithms
        .pageRankStable(g.allEdges.select(col("src"), col("dst")), 5, chainDepth = 2)
        .orderBy(col("pr").desc, col("id"))
        .limit(20)
    }),

    // Personalized PageRank from customer 1 (r8) — proximity ranking, the
    // same all-integer fixpoint as x17 with teleport restricted to the
    // source; top-20 by (ppr DESC, id). Zero-mass vertices are pruned from
    // the per-iteration broadcast side (exact: they contribute nothing),
    // so early iterations ship only the reached frontier.
    "x23_ppr" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      graft.algorithms.GraphAlgorithms
        .personalizedPageRank(g.allEdges.select(col("src"), col("dst")),
          Seq(graft.model.Graphid.pack(GraphStore.Lab.Customer, 1L)), 5, chainDepth = 2)
        .orderBy(col("ppr").desc, col("id"))
        .limit(20)
    }),

    // Katz centrality index (r8), all-integer: beta^(L-l)-weighted directed
    // walk counts (alpha = 1/4, horizon 6 — exact on the TPC-H DAG whose
    // longest path is 5). Rolled up per label so the oracle checks EVERY
    // vertex's score through the per-label (n, sum, max) triple, not just
    // a top-k slice.
    "x25_katz" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      graft.algorithms.GraphAlgorithms
        .katzIndex(g.allEdges.select(col("src"), col("dst")), maxLen = 6, beta = 4L)
        .groupBy(shiftright(col("id"), 48).cast("int").as("labid"))
        .agg(count(lit(1)).as("n"),
          sum(col("katz")).as("sum_katz"),
          max(col("katz")).as("max_katz"))
        .orderBy(col("labid"))
    }),

    // Weighted PageRank (r8) — the g16 weighted relation (PLACED weight 1,
    // CONTAINS weight = quantity), mass split by integer weight ratio in
    // the same 10^-12 fixed-point arithmetic as x17: bit-exact, top-20.
    "x27_weighted_pagerank" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      val weighted = g.edges("PLACED")
        .select(col("src"), col("dst"), lit(1L).as("w"))
        .unionByName(g.edges("CONTAINS")
          .select(col("src"), col("dst"), col("l_quantity").cast("long").as("w")))
      graft.algorithms.GraphAlgorithms
        .pageRankWeighted(weighted, 5, chainDepth = 2)
        .orderBy(col("wpr").desc, col("id"))
        .limit(20)
    }),

    // Betweenness centrality (r8) — rows-only by design: the sigma-ratio
    // accumulation is FP-rounded, so the exact stress twin (g25, identical
    // sweeps, integer arithmetic) carries the oracle — the HLL/x1-vs-q14
    // pairing. Top-20 by (betweenness DESC, id) from the same 50 customer
    // sources.
    "x24_betweenness" -> ((s, dir) => {
      import s.implicits._
      val g = GraphStore.tpch(s, dir)
      val srcs = (1L to 50L)
        .map(k => graft.model.Graphid.pack(GraphStore.Lab.Customer, k)).toDF("id")
      graft.algorithms.GraphAlgorithms
        .betweennessCentrality(g.allEdges.select(col("src"), col("dst")), srcs, 6)
        .orderBy(col("betweenness").desc, col("id"))
        .limit(20)
    }),

    // Temporal betweenness (r15) — rows-only by design, the x24 pattern
    // carried to journeys: sigma-ratio completion over hop-minimal
    // time-respecting journeys on the SAME state DAG as g48 (identical
    // forward sweep and gate domain — the exact integer stress twin
    // carries the oracle; AlgorithmsSpec cross-validates the FP deltas
    // against brute-force journey enumeration). Top-20 by
    // (betweenness DESC, id).
    "x37_temporal_betweenness" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id").cast("long").as("u"),
          col("event_id").cast("long").as("eid"),
          unix_micros(col("ts")).as("t"))
      val b = ev.agg(max(col("u")), min(col("t"))).head()
      val (nu, t0) = (b.getLong(0) + 1, b.getLong(1))
      val te = ev.select(col("u").as("src"),
        ((col("u") + 1 + col("eid") % 97) % nu).as("dst"), col("t"))
      val srcs = ev.select(col("u")).distinct().orderBy(col("u")).limit(3)
        .select(col("u").as("sid"), lit(t0).as("t0"))
      graft.algorithms.TemporalGraph.temporalBetweenness(te, srcs, 4)
        .orderBy(col("betweenness").desc, col("id"))
        .limit(20)
    }),

    // GraphX PageRank over the TPC-H graph — FP iteration, rows-only.
    // Same 5-iteration budget as the oracle-checked x17 so the two
    // rankings cross-validate like-for-like (GraphX normalizes ranks
    // differently, but the induced ordering agrees).
    "x6_pagerank" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      graft.algorithms.GraphAlgorithms.pageRank(s, g.allEdges.select(col("src"), col("dst")), 5)
        .orderBy(col("rank").desc, col("id"))
        .limit(20)
    }),

    // Hard signal for the rows-only GraphX x6: its top-20 id SET must
    // match the oracle-checked fixed-point x17 ranking's top-20. Set (not
    // position) agreement: GraphX sums doubles in shuffle-reduction order,
    // which may swap near-tied adjacent positions run-to-run, while the
    // membership boundary is wide (the #20/#21 rank gap is orders of
    // magnitude at every SF). The oracle pins the agreement count as the
    // constant 20 — a GraphX wiring regression or a fixpoint bug that
    // reshuffles the ranking breaks this gate deterministically.
    // Streaming executed for REAL (not its batch twin): the q15 hourly
    // windowed aggregate run through the micro-batch engine — events
    // staged as 4 parquet files, maxFilesPerTrigger=1 forcing 4 separate
    // micro-batches through the stateful window operator, complete-mode
    // memory sink — then hashed against the SAME DuckDB oracle as q15.
    // windowedStats accumulates in decimal, so the result is independent
    // of the batch cut points and must match the batch oracle bit-exact.
    "x22_stream_hourly" -> ((s, dir) => {
      import graft.streaming.EventStreams
      val src = java.nio.file.Files.createTempDirectory("graft_x22_src")
      // batch staging infers the file's own schema (long nanos or
      // timestamp[us] — readStream sniffs and normalizes either)
      s.read.parquet(s"$dir/events.parquet")
        .repartition(4)
        .write.mode("overwrite").parquet(src.toString)
      val sink = "x22_stream_hourly_sink"
      val q = EventStreams.windowedStats(
          EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        // the memory sink holds the result; the staged source files are
        // dead weight after termination — repeated runs must not fill /tmp
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table(sink)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Streaming distinct-user cardinality per hour (r12) — the g40
    // integer-pure HLL sketch as a windowed MAX-aggregation through the
    // real micro-batch engine (4 staged files, maxFilesPerTrigger=1):
    // state is 16 register longs per open window regardless of user
    // volume, the estimate finishes batch-side over the tiny sketch
    // relation, and the exact per-window distinct count rides along so
    // the sketch's accuracy is visible in-row. MAX is order-free, so the
    // result is independent of batch cut points and hashes against the
    // batch oracle.
    "x34_stream_hll" -> ((s, dir) => {
      import graft.streaming.EventStreams
      val src = java.nio.file.Files.createTempDirectory("graft_x34_src")
      s.read.parquet(s"$dir/events.parquet")
        .repartition(4)
        .write.mode("overwrite").parquet(src.toString)
      val sink = "x34_stream_hll_sink"
      val q = EventStreams.windowedCardinalitySketch(
          EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      val est = EventStreams.finishCardinality(s.table(sink))
      val exact = graft.store.Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .select(col("window.start").as("window_start"), col("exact_users"))
      est.join(exact, "window_start")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n_regs"), col("est_users"), col("exact_users"))
        .orderBy(col("hour"))
    }),

    // Streaming Count-Min heavy hitters (r15) — t18's sketch as
    // cross-batch streaming state through the REAL micro-batch engine
    // (4 staged files, maxFilesPerTrigger=1, the x34 pattern): the
    // depth×width counters are order-free integer sums, so the streamed
    // sketch is bit-exact against the batch construction regardless of
    // batch cut points; the finisher reads the exact top-10 users with
    // the sketch estimate in-row, hashing against the t18-form oracle.
    "x38_stream_countmin" -> ((s, dir) => {
      import graft.streaming.EventStreams
      val src = java.nio.file.Files.createTempDirectory("graft_x38_src")
      s.read.parquet(s"$dir/events.parquet")
        .repartition(4)
        .write.mode("overwrite").parquet(src.toString)
      val sink = "x38_stream_countmin_sink"
      val q = EventStreams.countMinSketch(
          EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1))
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      EventStreams.finishCountMin(s.table(sink),
          Tables.load(s, dir, "events"))
        .orderBy(col("rank"))
    }),

    // Streaming dedup executed for REAL through the micro-batch engine
    // (r8; the ingestion-time dedup a training-data pipeline runs before
    // anything lands): events plus a planted duplicate subset — every
    // 10th event re-delivered a minute later under a fresh event_id, the
    // at-least-once retry shape — staged as 4 files, maxFilesPerTrigger=1
    // forcing 4 micro-batches through dropDuplicatesWithinWatermark
    // state. The watermark horizon exceeds the whole replay, so state
    // never evicts and the survivor set is exactly the distinct
    // fingerprint set; the output aggregate reads ONLY fingerprint
    // columns, so the engine's arbitrary within-batch survivor pick
    // cannot perturb it — bit-exact against the batch DISTINCT oracle
    // (decimal accumulation, the x22 pattern).
    "x26_stream_dedup" -> ((s, dir) => {
      import graft.streaming.EventStreams
      val src = java.nio.file.Files.createTempDirectory("graft_x26_src")
      val ev = Tables.load(s, dir, "events")
      val planted = ev.where(col("event_id") % 10 === 0)
        .withColumn("event_id", col("event_id") + lit(10000000L))
        .withColumn("ts", col("ts") + expr("INTERVAL 1 MINUTE"))
      ev.unionByName(planted).repartition(4)
        .write.mode("overwrite").parquet(src.toString)
      val sink = "x26_stream_dedup_sink"
      val q = EventStreams.dedupStream(
          EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1),
          Seq("user_id", "event_type", "value"), watermark = "10000 hours")
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table(sink)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Streaming sessionization executed for REAL (r8): events staged as 4
    // chronological time-range files (ascending mtimes force the file
    // source's batch order) + one far-future flush-sentinel file per user
    // (the punctuation pattern that closes still-open sessions at replay
    // end), maxFilesPerTrigger=1 -> 5 micro-batches through the
    // flatMapGroupsWithState operator with CROSS-BATCH state: a session
    // spanning a batch boundary must come out as ONE session, micros-
    // exact against the q17-family SQL sessionization oracle. Sentinel
    // sessions are never closed, so they stay in state and never reach
    // the sink - the output is exactly the real session set.
    // Stream-STATIC enrichment join executed for REAL (r8): the canonical
    // streaming lookup pattern - events stream through 4 micro-batches
    // (maxFilesPerTrigger=1) and each batch equi-joins the STATIC customer
    // dimension (broadcast per batch, no join state), then a per-nation
    // aggregate accumulates across batches in decimal - the final table
    // must be bit-identical to the batch join + GROUP BY whatever the
    // batch cut points were.
    "x30_stream_enrich" -> ((s, dir) => {
      import graft.streaming.EventStreams
      val src = java.nio.file.Files.createTempDirectory("graft_x30_src")
      s.read.parquet(s"$dir/events.parquet")
        .repartition(4)
        .write.mode("overwrite").parquet(src.toString)
      val sink = "x30_stream_enrich_sink"
      val q = EventStreams.enrichedNationStats(
          EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1),
          Tables.load(s, dir, "customer"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table(sink)
        .select(col("c_nationkey"), col("n"), col("sum_value"))
        .orderBy(col("c_nationkey"))
    }),

    // Streaming EVICTION gate (r10; the r8 verdict ask): every other
    // §2.10 gate keeps the watermark horizon beyond the replay so nothing
    // evicts — this one proves the opposite contract: state is bounded
    // and late arrivals past the watermark are DROPPED. Three staged
    // files with ascending mtimes force the batch order: (1) the kept
    // subset (event_id % 4 = 1) at its real times; (2) one far-future
    // sentinel (+20 h) that advances the watermark beyond every kept
    // window; (3) late re-deliveries of a kept sub-subset under fresh
    // event_ids, timestamps unchanged — their windows are now below the
    // watermark, so the Append-mode aggregate must ignore every one of
    // them. The oracle is the batch aggregate over file (1) ALONE: it
    // matches only if the drop actually happened (an engine that kept
    // the late rows would inflate n and sum_value). The sentinel's own
    // window never finalizes (nothing advances the watermark past it),
    // so it stays in state and out of the sink — filtered defensively
    // anyway. StreamingSpec's twin pins numRowsDroppedByWatermark > 0
    // and the bounded final state.
    // PortableLog diagnostic probes (r12): two rounds of ln-adjacent
    // driver-hash failures (g34/t17 r10-r11, x5 r11) could not be
    // reproduced locally — PortableLog is bit-identical to local DuckDB
    // 1.0.0 over 200k inputs, yet every gate routing hashed values
    // through it stayed driver-red. These gates expose each PortableLog
    // primitive as its own BIGINT column over a fixed 39-value literal
    // relation, so the driver's per-query hash check NAMES the
    // primitive its DuckDB evaluates differently. x32: the exact
    // integer exponent split (bin-length e, 1<<e). If x32 is red, the
    // driver's bin()/<< semantics differ; if green, the split is
    // exonerated and x33 isolates the double series.
    "x32_bits" -> ((s, dir) => {
      import s.implicits._
      val e = (length(bin(col("n"))) - lit(1)).cast("int")
      portableLogProbe.toDF("n")
        .select(col("n"), e.cast("long").as("e"),
          call_function("shiftleft", lit(1L), e).cast("long").as("p2"))
        .orderBy(col("n"))
    }),

    // x33: the full lnLong output floor-snapped onto the 10^-6 grid —
    // the exact integer the red gates hashed. Green here + green x32
    // exonerates PortableLog entirely (the hunt then moves to value
    // rendering); red here with green x32 pins the divergence inside
    // the correctly-rounded double series evaluation.
    "x33_series" -> ((s, dir) => {
      import s.implicits._
      portableLogProbe.toDF("n")
        .select(col("n"),
          floor(lit(1000000.0) * graft.util.PortableLog.lnLong(col("n"))
            + lit(0.5)).cast("long").as("wm"))
        .orderBy(col("n"))
    }),

    // x35 (r13): the remaining driver-divergence suspect after x32/x33
    // exonerated the integer primitives — lnDoubleSql evaluated on a
    // DECIMAL-typed operand (the x5/g34/t17 red gates all fed DECIMAL
    // table columns into it) vs the same value pre-cast AS DOUBLE. The
    // Spark side is the JVM mirror (lnDoubleJvm — the exact scalar the
    // typed Aggregators run on executors) over the correctly-rounded
    // double of each literal; the oracle computes wm_dec through the
    // DECIMAL coercion path and wm_dbl through the explicit DOUBLE path.
    // Green ⇒ the DECIMAL suspect is exonerated too and the hunt moves to
    // value rendering; red ⇒ culprit named (and wm_dbl says which side).
    "x35_decimal_coercion" -> ((s, dir) => {
      import s.implicits._
      decimalProbe.map { v =>
        val bd = new java.math.BigDecimal(v)
        val n = bd.movePointRight(6).longValueExact()
        val x = bd.doubleValue()
        val wm = math.floor(
          1000000.0 * graft.util.PortableLog.lnDoubleJvm(x) + 0.5).toLong
        (n, wm, wm)
      }.toDF("n", "wm_dec", "wm_dbl").orderBy(col("n"))
    }),

    // x36 (r14): the LAST named driver-divergence suspect — value
    // RENDERING. x32/x33 proved the ln doubles bit-identical on both
    // engines locally and x35 exonerated DECIMAL coercion; this gate
    // hashes the SAME double column twice: `txt` rendered to a string
    // by each engine's own double→text path (Spark's Java shortest-
    // round-trip vs DuckDB's CAST AS VARCHAR) and `wm` through the
    // proven integer grid snap as the in-row control. A red txt next to
    // a green wm NAMES the renderer; green on both exhausts the suspect
    // list and the standing integer-only rule for hashed transcendentals
    // becomes the documented final answer.
    "x36_render" -> ((s, dir) => {
      import s.implicits._
      portableLogProbe.toDF("n")
        .select(col("n"),
          graft.util.PortableLog.lnLong(col("n")).cast("string").as("txt"),
          floor(lit(1000000.0) * graft.util.PortableLog.lnLong(col("n"))
            + lit(0.5)).cast("long").as("wm"))
        .orderBy(col("n"))
    }),

    "x31_stream_eviction" -> ((s, dir) => {
      import graft.streaming.EventStreams
      import scala.jdk.CollectionConverters._
      val src = java.nio.file.Files.createTempDirectory("graft_x31_src")
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val keep = ev.where(col("event_id") % 4 === 1)
      val hiUs = keep.agg(max(unix_micros(col("ts")))).head.getLong(0)
      val sentinel = s.range(1).select(
        lit(2000000000L).as("event_id"),
        timestamp_micros(lit(hiUs + 20L * 3600L * 1000000L)).as("ts"),
        lit(-1L).as("user_id"), lit("__advance").as("event_type"),
        lit(0.0).as("value"))
      val late = keep.where(col("event_id") % 20 === 1)
        .withColumn("event_id", col("event_id") + lit(10000000L))
      Seq(keep, sentinel, late).zipWithIndex.foreach { case (df, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_x31_b$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
        val target = src.resolve(f"b$i%02d.parquet")
        java.nio.file.Files.move(part, target)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      val sink = "x31_stream_eviction_sink"
      val q = EventStreams.windowedStats(
          EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1),
          watermark = "10 minutes")
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table(sink)
        .where(col("event_type") =!= "__advance")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // Stream-stream interval join executed for REAL (r8): both sides
    // branch off one staged file source (4 files, maxFilesPerTrigger=1 ->
    // 4 micro-batches through the symmetric-hash join state), watermark
    // horizon beyond the replay so no state evicts and the join is
    // COMPLETE regardless of which batch each side of a pair lands in -
    // bit-exact against the batch theta-join oracle. This closes the
    // §2.10 set: windows (x22), dedup (x26), sessions (x28), join (x29)
    // all proven through the actual micro-batch engine.
    "x29_stream_join" -> ((s, dir) => {
      import graft.streaming.EventStreams
      val src = java.nio.file.Files.createTempDirectory("graft_x29_src")
      Tables.load(s, dir, "events").repartition(4)
        .write.mode("overwrite").parquet(src.toString)
      val stream = EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1)
      val sink = "x29_stream_join_sink"
      val q = EventStreams.clickPurchaseJoin(
          stream.where(col("event_type") === "click"),
          stream.where(col("event_type") === "purchase"),
          watermark = "36500 days")
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table(sink)
        .select(col("click_id"), col("user_id"), col("purchase_id"),
          col("click_ts"), col("purchase_ts"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    "x28_stream_sessions" -> ((s, dir) => {
      import graft.streaming.EventStreams
      import s.implicits._
      val src = java.nio.file.Files.createTempDirectory("graft_x28_src")
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val mm = ev.agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).head
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / 4 + 1
      val sentinelUs = hi + 10L * 86400L * 1000000L
      val batches = (0 until 4).map { i =>
        ev.where(unix_micros(col("ts")) >= lo + i * width &&
          unix_micros(col("ts")) < lo + (i + 1) * width)
      } :+ ev.select(col("user_id")).distinct()
        .select((col("user_id") + lit(1000000000L)).as("event_id"),
          timestamp_micros(lit(sentinelUs)).as("ts"), col("user_id"),
          lit("__flush").as("event_type"), lit(0.0).as("value"))
      // flat staging dir, one parquet file per chronological batch with
      // ascending mtimes: the file source's modification-time order IS the
      // replay order, which cross-batch session state depends on
      batches.zipWithIndex.foreach { case (df, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_x28_b$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val part = java.nio.file.Files.list(tmp).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
        val target = src.resolve(f"b$i%02d.parquet")
        java.nio.file.Files.move(part, target)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      val sink = "x28_stream_sessions_sink"
      val stream = EventStreams.readStream(s, src.toString, maxFilesPerTrigger = 1)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EventStreams.Event]
      val q = EventStreams.sessionizeStream(stream)
        .writeStream.format("memory").queryName(sink)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      s.table(sink)
        .select(col("user_id"), col("n_events"),
          col("session_start"), col("session_end"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "x21_pagerank_crosscheck" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      // eager: both PageRank variants consume the edge relation. The
      // checkpoint's persistent-RDD delta is captured so the 2|E| blocks
      // can be released HERE, after the one-row agreement count has been
      // materialized — hosts that run queries without a Bench-style
      // getPersistentRDDs sweep must not leak blocks per invocation. The
      // count runs inside the builder (Bench times builder + count, so
      // nothing escapes the timer); the returned literal row is the result.
      val sc = s.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val edges = g.allEdges.select(col("src"), col("dst")).localCheckpoint(true)
      val mine = sc.getPersistentRDDs.keySet -- before
      // the two variants are independent reads of the pinned edge
      // checkpoint and each underfills the executor at this partition
      // count, so they run CONCURRENTLY from two driver threads (Spark's
      // documented multi-threaded job submission) — wall time is
      // max(half, half), not the sum. Each half's top-20 is a bounded
      // driver collect with a (rank desc, id) total order, so the
      // intersection count is deterministic. The RDD-delta capture
      // stays single-threaded: it closed over `mine` before the threads
      // start, and the halves' own checkpoints are swept by the caller.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
        (r: Runnable) => { val t = new Thread(r, "x21-half"); t.setDaemon(true); t })
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val nAgree =
        try {
          val fStable = Future {
            graft.algorithms.GraphAlgorithms
              .pageRankStable(edges, 5, chainDepth = 2) // same A/B-measured depth as x17
              .orderBy(col("pr").desc, col("id")).limit(20).select(col("id"))
              .collect().map(_.getLong(0)).toSet
          }
          val fGx = Future {
            graft.algorithms.GraphAlgorithms.pageRank(s, edges, 5)
              .orderBy(col("rank").desc, col("id")).limit(20).select(col("id"))
              .collect().map(_.getLong(0)).toSet
          }
          val (stableTop, gxTop) =
            (Await.result(fStable, 10.minutes), Await.result(fGx, 10.minutes))
          (stableTop intersect gxTop).size.toLong
        } finally {
          pool.shutdown()
          mine.foreach(id =>
            sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        }
      s.range(1).select(lit(nAgree).as("n_agree"))
    }),

    // GraphX connected components, oracle-checked: min-label fixpoint
    // unrolled as iteration CTEs (the x17 pattern) — GraphX labels each
    // component with its minimum vertex id, exactly what the fixpoint
    // computes once it has run >= eccentricity-of-min rounds.
    "x7_components" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      graft.algorithms.GraphAlgorithms
        .connectedComponents(s, g.allEdges.select(col("src"), col("dst")))
        .groupBy(col("component")).agg(count(lit(1)).as("n_vertices"))
        .orderBy(col("component"))
    }),

    // full-outer degree table — oracle-checked.
    "x8_degrees" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      graft.algorithms.GraphAlgorithms.degrees(g.allEdges.select(col("src"), col("dst")))
        .orderBy(col("id"))
    }),

    // Cypher-script export → replay roundtrip (reference
    // data_generator.rs:393-439 export_cypher): a Region+Nation subgraph is
    // exported as CREATE statements, replayed through the parser/mutation
    // path into an EMPTY session (explicit-id CREATE keeps ids exact, so
    // the id(a)=N edge bindings resolve), then aggregated with Cypher —
    // gates export format, script splitting, parser, CREATE and MATCH
    // end-to-end against the relational oracle.
    "x19_cypher_roundtrip" -> ((s, dir) => {
      val g = GraphStore.tpch(s, dir)
      val sub = new graft.store.GraphStore(
        Map("Region" -> g.vertexTables("Region"),
          "Nation" -> g.vertexTables("Nation")
            .where(col("n_nationkey") < 10)),
        Map("IN_REGION" -> g.edgeTables("IN_REGION")
          .where(Graphid.locidCol(col("src")) < 10)))
      val script = graft.store.GraphIO.exportCypherScript(sub)
      val sess = new graft.cypher.CypherSession(s,
        new graft.store.GraphStore(Map.empty, Map.empty))
      sess.runScript(script)
      sess.run("""MATCH (n:Nation)-[:IN_REGION]->(r:Region)
        RETURN r.r_name AS region, count(*) AS n_nations
        ORDER BY region""")
    }),

    // custom typed Aggregators (UDAF) — fixed-point geometric mean + exact
    // frequency top-k, both reduction-order independent → oracle-checked.
    "x5_custom_udaf" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(Aggregators.geometric_mean(col("l_extendedprice")).as("geo_price"),
          Aggregators.top_k(col("l_suppkey"), 3).as("top_suppliers"))
        .select(col("l_returnflag"), round(col("geo_price"), 2).as("geo_price"),
          concat_ws(",", col("top_suppliers")).as("top_suppliers"))
        .orderBy(col("l_returnflag"))
    }))

  val oracle: Map[String, String] = Map(
    // the agreement count is pinned as a constant: full set-agreement of
    // the GraphX and fixed-point top-20 (see the gate's comment for why
    // set, not position)
    "x21_pagerank_crosscheck" -> "SELECT CAST(20 AS BIGINT) AS n_agree",
    // op-for-op the gate's exponent split: bin-length minus one, then a
    // BIGINT left shift — the primitives lnLongSql builds on. No table
    // reference: the VALUES list is generated from the same Seq as the
    // Spark relation.
    "x32_bits" ->
      s"""WITH v AS (SELECT CAST(n AS BIGINT) AS n
         |           FROM (VALUES $probeValuesSql) AS t(n))
         |SELECT n, CAST((length(bin(n)) - 1) AS BIGINT) AS e,
         |  CAST((1::BIGINT << (length(bin(n)) - 1)) AS BIGINT) AS p2
         |FROM v ORDER BY n""".stripMargin,
    // the full lnLongSql rendering, floor-snapped at 10^-6 — exactly the
    // integer construction the r10/r11 red gates hashed.
    "x33_series" ->
      s"""WITH v AS (SELECT CAST(n AS BIGINT) AS n
         |           FROM (VALUES $probeValuesSql) AS t(n))
         |SELECT n, CAST(FLOOR(CAST(1000000 AS DOUBLE) *
         |    ${graft.util.PortableLog.lnLongSql("n")}
         |    + (CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE))) AS BIGINT) AS wm
         |FROM v ORDER BY n""".stripMargin,
    // wm_dec routes lnDoubleSql through the DECIMAL operand exactly as
    // the r10/r11 red gates did; wm_dbl pre-casts to DOUBLE first — the
    // only difference between the two columns is the coercion path.
    "x35_decimal_coercion" ->
      s"""WITH v AS (SELECT CAST(n AS BIGINT) AS n, CAST(s AS DECIMAL(18,6)) AS d
         |           FROM (VALUES $decimalProbeValuesSql) AS t(n, s))
         |SELECT n,
         |  CAST(FLOOR(CAST(1000000 AS DOUBLE) *
         |    ${graft.util.PortableLog.lnDoubleSql("d")}
         |    + (CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE))) AS BIGINT) AS wm_dec,
         |  CAST(FLOOR(CAST(1000000 AS DOUBLE) *
         |    ${graft.util.PortableLog.lnDoubleSql("CAST(d AS DOUBLE)")}
         |    + (CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE))) AS BIGINT) AS wm_dbl
         |FROM v ORDER BY n""".stripMargin,
    // txt = each engine's own double→text rendering of the bit-identical
    // ln value; wm = the proven grid snap as the in-row control
    "x36_render" ->
      s"""WITH v AS (SELECT CAST(n AS BIGINT) AS n
         |           FROM (VALUES $probeValuesSql) AS t(n))
         |SELECT n,
         |  CAST(${graft.util.PortableLog.lnLongSql("n")} AS VARCHAR) AS txt,
         |  CAST(FLOOR(CAST(1000000 AS DOUBLE) *
         |    ${graft.util.PortableLog.lnLongSql("n")}
         |    + (CAST(1 AS DOUBLE) / CAST(2 AS DOUBLE))) AS BIGINT) AS wm
         |FROM v ORDER BY n""".stripMargin,
    // the streaming gate answers to the SAME oracle as its batch twin q15
    // file (1)'s rows alone: the late re-deliveries must have been
    // dropped at the watermark, and the sentinel never finalizes
    "x31_stream_eviction" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_id % 4 = 1
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    // same register construction as the g40 sketch (h32("hll|" + user),
    // lowbit rank, power-of-two harmonic sums), grouped per hour window;
    // every aggregate BIGINT-pinned
    "x34_stream_hll" -> {
      val h = graft.pipeline.TextHash.h32Sql(
        "'hll|' || CAST(CAST(user_id AS BIGINT) AS VARCHAR)")
      s"""WITH regs AS (
         |  SELECT date_trunc('hour', ts) AS wstart, x % 16 AS j,
         |         MAX(y & -y) AS lb
         |  FROM (SELECT ts, x, (x // 16) + 1 AS y
         |        FROM (SELECT ts, $h AS x FROM events))
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT wstart, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |    CAST((172288 * 4294967296)
         |      // (1000 * (CAST(SUM(4294967296 // lb) AS BIGINT)
         |                  + (16 - COUNT(*)) * 4294967296)) AS BIGINT)
         |      AS est_users
         |  FROM regs GROUP BY wstart),
         |ex AS (
         |  SELECT date_trunc('hour', ts) AS wstart,
         |    CAST(COUNT(DISTINCT CAST(user_id AS BIGINT)) AS BIGINT)
         |      AS exact_users
         |  FROM events GROUP BY 1)
         |SELECT strftime(est.wstart, '%Y-%m-%d %H:%M:%S') AS hour,
         |       n_regs, est_users, exact_users
         |FROM est JOIN ex ON ex.wstart = est.wstart
         |ORDER BY hour""".stripMargin
    },
    // the t18 Count-Min replay over the event user stream: same
    // depth 4 x width 256 counters (pure integer sums — batch-cut-
    // insensitive, which is why the STREAMED sketch hashes here), exact
    // top-10 with the MIN-estimate in-row
    "x38_stream_countmin" -> {
      val b = graft.pipeline.TextHash.h32Sql("CAST(r AS VARCHAR) || '|' || tok")
      s"""WITH toks AS (
         |  SELECT CAST(CAST(user_id AS BIGINT) AS VARCHAR) AS tok FROM events),
         |rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |sketch AS (
         |  SELECT r, ($b) % 256 AS bkt, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM toks, rows_ GROUP BY 1, 2),
         |exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
         |          FROM toks GROUP BY tok),
         |top AS (
         |  SELECT rank, tok, exact_n FROM (
         |    SELECT tok, exact_n,
         |      ROW_NUMBER() OVER (ORDER BY exact_n DESC, tok) AS rank
         |    FROM exact)
         |  WHERE rank <= 10),
         |look AS (
         |  SELECT t.rank, t.tok, t.exact_n, rows_.r, ($b) % 256 AS bkt
         |  FROM top t, rows_)
         |SELECT CAST(rank AS BIGINT) AS rank, tok, exact_n,
         |       CAST(MIN(c) AS BIGINT) AS cm_est
         |FROM look JOIN sketch USING (r, bkt)
         |GROUP BY rank, tok, exact_n
         |ORDER BY rank""".stripMargin
    },
    "x22_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    "x20_batched_pointget" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey IN (
        |  SELECT DISTINCT user_id + 1 FROM events
        |  WHERE event_type = 'purchase' AND value > 250)
        |ORDER BY c_custkey""".stripMargin,
    "x19_cypher_roundtrip" ->
      """SELECT r.r_name AS region, COUNT(*) AS n_nations
        |FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE n.n_nationkey < 10
        |GROUP BY r.r_name ORDER BY region""".stripMargin,
    "x7_components" -> {
      // min-label propagation unrolled for a fixed round budget; converged
      // (= equal to GraphX's run-to-fixpoint labels) once rounds >= the
      // eccentricity of each component's minimum-id vertex — the TPC-H
      // graph's diameter is ~8, so 12 rounds has margin.
      val rounds = 12
      // MATERIALIZED: each round references its predecessor twice — inlined
      // CTEs would expand 2^rounds times
      val iterCtes = (1 to rounds).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT id, MIN(comp) AS comp FROM (
           |    SELECT u.dst AS id, c.comp FROM und u JOIN c${i - 1} c ON c.id = u.src
           |    UNION ALL SELECT id, comp FROM c${i - 1})
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${GraphQueries.edgesCte},
         |und AS MATERIALIZED (SELECT src, dst FROM edges
         |        UNION ALL SELECT dst AS src, src AS dst FROM edges),
         |c0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM und),
         |$iterCtes
         |SELECT comp AS component, COUNT(*) AS n_vertices FROM c$rounds
         |GROUP BY comp ORDER BY component""".stripMargin
    },
    "x5_custom_udaf" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_suppkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |ranked AS (
        |  SELECT l_returnflag, l_suppkey,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, l_suppkey) AS rn
        |  FROM counts),
        |tops AS (
        |  SELECT l_returnflag,
        |    string_agg(CAST(l_suppkey AS VARCHAR), ',' ORDER BY rn) AS top_suppliers
        |  FROM ranked WHERE rn <= 3 GROUP BY l_returnflag),
        |geo AS (
        |  SELECT l_returnflag,
        |    ROUND(EXP(CAST(SUM(CAST(FLOOR(LN(l_extendedprice) * 1e9) AS BIGINT))
        |                   // COUNT(*) AS DOUBLE) / 1e9), 2) AS geo_price
        |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY l_returnflag)
        |SELECT g.l_returnflag, g.geo_price, t.top_suppliers
        |FROM geo g JOIN tops t ON g.l_returnflag = t.l_returnflag
        |ORDER BY g.l_returnflag""".stripMargin,
    "x17_pagerank_stable" -> {
      val iters = 5
      // fixed-point mirror of GraphAlgorithms.pageRankStable: all-integer
      // fixpoint (DuckDB SUM(BIGINT) is HUGEINT -> cast back), one
      // long->double conversion at the end
      val iterCtes = (1 to iters).map { i =>
        s"""pr$i AS (
           |  SELECT v.id, 150000000000 + (85 * COALESCE(m.mass, CAST(0 AS BIGINT))) // 100 AS prf
           |  FROM verts v LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM(p.prf // d.deg) AS BIGINT) AS mass
           |    FROM pr${i - 1} p JOIN deg d ON d.id = p.id JOIN edges e ON e.src = p.id
           |    GROUP BY e.dst) m ON m.id = v.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${GraphQueries.edgesCte},
         |verts AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src),
         |pr0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS prf FROM verts),
         |$iterCtes
         |SELECT id, CAST(prf AS DOUBLE) / 1e12 AS pr FROM pr$iters
         |ORDER BY pr DESC, id LIMIT 20""".stripMargin
    },
    "x23_ppr" -> {
      val iters = 5
      val src = "(CAST(1 AS BIGINT)<<48)|CAST(1 AS BIGINT)"
      // fixed-point mirror of personalizedPageRank: source-only initial
      // mass and teleport, otherwise identical to the x17 oracle
      val iterCtes = (1 to iters).map { i =>
        s"""pr$i AS (
           |  SELECT v.id,
           |    (CASE WHEN v.id = $src THEN 150000000000 ELSE 0 END)
           |      + (85 * COALESCE(m.mass, CAST(0 AS BIGINT))) // 100 AS prf
           |  FROM verts v LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM(p.prf // d.deg) AS BIGINT) AS mass
           |    FROM pr${i - 1} p JOIN deg d ON d.id = p.id JOIN edges e ON e.src = p.id
           |    WHERE p.prf > 0
           |    GROUP BY e.dst) m ON m.id = v.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${GraphQueries.edgesCte},
         |verts AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |deg AS (SELECT src AS id, COUNT(*) AS deg FROM edges GROUP BY src),
         |pr0 AS (SELECT id,
         |  CAST(CASE WHEN id = $src THEN 1000000000000 ELSE 0 END AS BIGINT) AS prf
         |  FROM verts),
         |$iterCtes
         |SELECT id, CAST(prf AS DOUBLE) / 1e12 AS ppr FROM pr$iters
         |ORDER BY ppr DESC, id LIMIT 20""".stripMargin
    },
    "x29_stream_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  p.event_id AS purchase_id, c.ts AS click_ts, p.ts AS purchase_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "x28_stream_sessions" ->
      // the q17 gaps-and-islands sessionization without the sid column
      // (the stream emits sessions, not island ids); same 30-minute gap,
      // same (ts, event_id) tie order, exact micros
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |),
        |b AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM x
        |),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b
        |)
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "x27_weighted_pagerank" -> {
      val iters = 5
      // x17's fixed-point mirror with the weight ratio: mass per edge is
      // (prf * w) // wsum; quantities are integral so the BIGINT cast is
      // exact in both engines
      val iterCtes = (1 to iters).map { i =>
        s"""wpr$i AS (
           |  SELECT v.id, v.wsum,
           |    150000000000 + (85 * COALESCE(m.mass, CAST(0 AS BIGINT))) // 100 AS prf
           |  FROM wverts v LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM((p.prf * e.w) // p.wsum) AS BIGINT) AS mass
           |    FROM wpr${i - 1} p JOIN wedges e ON e.src = p.id
           |    WHERE p.wsum > 0
           |    GROUP BY e.dst) m ON m.id = v.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH wedges AS (
         |  SELECT (CAST(1 AS BIGINT)<<48)|CAST(o_custkey AS BIGINT) AS src,
         |         (CAST(2 AS BIGINT)<<48)|CAST(o_orderkey AS BIGINT) AS dst,
         |         CAST(1 AS BIGINT) AS w FROM orders
         |  UNION ALL
         |  SELECT (CAST(2 AS BIGINT)<<48)|CAST(l_orderkey AS BIGINT),
         |         (CAST(3 AS BIGINT)<<48)|CAST(l_partkey AS BIGINT),
         |         CAST(l_quantity AS BIGINT) FROM lineitem),
         |wverts AS (SELECT id, CAST(SUM(c) AS BIGINT) AS wsum FROM (
         |  SELECT src AS id, w AS c FROM wedges
         |  UNION ALL SELECT dst, CAST(0 AS BIGINT) FROM wedges) GROUP BY id),
         |wpr0 AS (SELECT id, wsum, CAST(1000000000000 AS BIGINT) AS prf
         |         FROM wverts),
         |$iterCtes
         |SELECT id, CAST(prf AS DOUBLE) / 1e12 AS wpr FROM wpr$iters
         |ORDER BY wpr DESC, id LIMIT 20""".stripMargin
    },
    "x30_stream_enrich" ->
      // the batch face of the streamed enrichment: plain dim join + GROUP
      // BY — the stream must reach the identical table through 4 batches
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "x26_stream_dedup" ->
      // the batch face of the streamed dedup: first-per-fingerprint =
      // DISTINCT on the fingerprint columns (planted re-deliveries add no
      // new fingerprint, so they must all be dropped by the stream)
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM (SELECT DISTINCT user_id, event_type, value FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "x25_katz" -> {
      val maxLen = 6
      val beta = 4L
      // walk counts per length, statically unrolled; weights beta^(L-l)
      // match katzIndex's accumulator ladder exactly (all BIGINT)
      val levelCtes = (1 to maxLen).map { l =>
        s"""p$l AS MATERIALIZED (
           |  SELECT e.dst AS id, CAST(SUM(p.c) AS BIGINT) AS c
           |  FROM p${l - 1} p JOIN edges e ON e.src = p.id GROUP BY 1)"""
          .stripMargin
      }.mkString(",\n")
      val weighted = (1 to maxLen).map { l =>
        val w = Seq.fill(maxLen - l)(beta).product
        s"SELECT id, c * CAST($w AS BIGINT) AS k FROM p$l"
      }.mkString("\nUNION ALL ")
      s"""WITH ${GraphQueries.edgesCte},
         |allv AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |p0 AS (SELECT id, CAST(1 AS BIGINT) AS c FROM allv),
         |$levelCtes,
         |k AS (SELECT id, CAST(SUM(k) AS BIGINT) AS katz
         |      FROM ($weighted) GROUP BY id)
         |SELECT CAST(a.id >> 48 AS INTEGER) AS labid,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(COALESCE(k.katz, 0)) AS BIGINT) AS sum_katz,
         |       CAST(MAX(COALESCE(k.katz, 0)) AS BIGINT) AS max_katz
         |FROM allv a LEFT JOIN k ON k.id = a.id
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "x4_vle_paths" -> {
      val start = "(CAST(1 AS BIGINT)<<48)|CAST(1 AS BIGINT)"
      s"""WITH RECURSIVE ${GraphQueries.edgesCte},
         |walk(end_id, path, len) AS (
         |  SELECT dst, [$start, dst], 1 FROM edges WHERE src = $start
         |  UNION ALL
         |  SELECT e.dst, list_append(w.path, e.dst), w.len + 1
         |  FROM walk w JOIN edges e ON e.src = w.end_id
         |  WHERE w.len < 3 AND NOT list_contains(w.path, e.dst)
         |)
         |SELECT $start AS start_id, end_id, CAST(len AS INT) AS len,
         |  array_to_string(path, '->') AS path_str
         |FROM walk ORDER BY len, path_str""".stripMargin
    },
    "x15_hash_sample" -> {
      val h = graft.pipeline.TextHash.h32Sql(
        "('' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR))")
      s"""SELECT l_returnflag, COUNT(*) AS n_sampled,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         |FROM lineitem WHERE $h % 20 = 0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "x16_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "x18_csv_cypher" ->
      """SELECT * FROM (VALUES ('Bo', 'Cy', CAST(2024 AS BIGINT)),
        |  ('Cy', 'Ana', CAST(2024 AS BIGINT))) t(reviewer, author, y)
        |ORDER BY reviewer""".stripMargin,
    "x14_graphio_cypher" ->
      """SELECT * FROM (VALUES ('Alice', CAST(2020 AS BIGINT), 'Bob'),
        |  ('Bob', CAST(2021 AS BIGINT), 'Charlie')) t(a, y, b)
        |ORDER BY a""".stripMargin,
    "x13_range_join" ->
      """SELECT p.event_id AS purchase_event_id, COUNT(*) AS n_clicks
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x12_asof_join" ->
      """SELECT c.event_id, p.event_id AS purchase_event_id,
        |  p.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
        |                WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "x10_store_roundtrip" ->
      """SELECT * FROM (
        |  SELECT 'Customer' AS label, COUNT(*) AS n_rows FROM customer
        |  UNION ALL SELECT 'Order', COUNT(*) FROM orders
        |  UNION ALL SELECT 'Part', COUNT(*) FROM part
        |  UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
        |  UNION ALL SELECT 'Nation', COUNT(*) FROM nation
        |  UNION ALL SELECT 'Region', COUNT(*) FROM region
        |  UNION ALL SELECT 'PLACED', COUNT(*) FROM orders
        |  UNION ALL SELECT 'CONTAINS', COUNT(*) FROM lineitem
        |  UNION ALL SELECT 'SUPPLIED_BY', COUNT(*)
        |    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |  UNION ALL SELECT 'CUST_NATION', COUNT(*) FROM customer
        |  UNION ALL SELECT 'SUPP_NATION', COUNT(*) FROM supplier
        |  UNION ALL SELECT 'IN_REGION', COUNT(*) FROM nation
        |) ORDER BY label""".stripMargin,
    "x8_degrees" ->
      s"""WITH ${GraphQueries.edgesCte},
         |outd AS (SELECT src AS id, COUNT(*) AS out_degree FROM edges GROUP BY src),
         |ind AS (SELECT dst AS id, COUNT(*) AS in_degree FROM edges GROUP BY dst)
         |SELECT COALESCE(o.id, i.id) AS id,
         |  COALESCE(in_degree, 0) AS in_degree,
         |  COALESCE(out_degree, 0) AS out_degree
         |FROM outd o FULL OUTER JOIN ind i ON o.id = i.id
         |ORDER BY id""".stripMargin,
    "q16_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
}
