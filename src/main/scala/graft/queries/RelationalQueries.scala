package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.Tables

/** Relational operator surface (SURVEY.md §2.2–§2.5): projection, filter,
  * joins (inner/outer/semi/anti/cross), aggregation with implicit grouping,
  * DISTINCT, set ops, window functions, sort/limit/top-k, rollup.
  *
  * Every query is deterministic (total ORDER BY with tie-breaks) and uses
  * exact decimal accumulation for double-typed measures so the DuckDB oracle
  * hash-matches bit-for-bit: per-row double arithmetic is IEEE-identical
  * across engines, and summing after a cast to decimal removes
  * accumulation-order nondeterminism. Results are presented as doubles.
  */
object RelationalQueries {
  private val DEC = "decimal(18,2)"
  private val DEC6 = "decimal(18,6)"

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-scan aggregate with implicit grouping (TPC-H Q1 shape). A2-A6.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DEC)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DEC)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DEC6))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(DEC)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Filter + projection with parquet pushdown (P1/P3). Predicates reach the scan.
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_size") > 40 && col("p_type").startsWith("STANDARD"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    // 3-way join + agg + top-k (TPC-H Q3 shape). J1/J2 analogue on raw tables;
    // customer side broadcast (small dim at any SF relative to lineitem).
    "q3_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DEC6))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ORDER BY + LIMIT = TakeOrderedAndProject top-k (O1/O2).
    "q4_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
    }),

    // DISTINCT (A7).
    "q5_distinct" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),

    // Set operations: INTERSECT / EXCEPT / UNION ALL (O4).
    "q6_setops" -> ((s, dir) => {
      val custN = t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val suppN = t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      val both = custN.intersect(suppN).withColumn("tag", lit("both"))
      val custOnly = custN.except(suppN).withColumn("tag", lit("cust_only"))
      both.unionByName(custOnly).select(col("tag"), col("nk")).orderBy(col("tag"), col("nk"))
    }),

    // Window functions: per-customer top-2 orders by price (O5).
    "q7_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Semi + anti join (EXISTS / NOT EXISTS) in one tagged result (J5).
    "q8_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      val hasOrder = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .withColumn("tag", lit("has_order"))
      val noOrder = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .withColumn("tag", lit("no_order"))
      hasOrder.unionByName(noOrder)
        .select(col("tag"), col("c_custkey"))
        .orderBy(col("tag"), col("c_custkey"))
    }),

    // Left outer join + count, keeping zero-order customers (J4 semantics).
    "q9_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(DEC)).cast("double"), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // Cross join (J3 cartesian analogue) on a tiny dimension.
    "q10_cross" -> ((s, dir) => {
      val r1 = t(s, dir, "region").select(col("r_name").as("r1"))
      val r2 = t(s, dir, "region").select(col("r_name").as("r2"))
      r1.crossJoin(r2).filter(col("r1") < col("r2")).orderBy(col("r1"), col("r2"))
    }),

    // Scalar expression surface: CASE WHEN, arithmetic promotion, concat (P6-P9).
    "q11_expr" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large").as("size_class"),
          (col("p_retailprice") / col("p_size")).as("price_per_size"))
        .orderBy(col("p_partkey"))
    }),

    // GROUP BY + HAVING (A1 + post-agg filter).
    "q12_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DEC)).cast("double").as("total_qty"))
        .filter(col("n_items") > 50)
        .orderBy(col("l_suppkey"))
    }),

    // ROLLUP grouping sets (A7).
    "q13_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DEC)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // COUNT(DISTINCT) per group (A7).
    "q14_countd" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    }),

    // Time-bucketed aggregation over the events table (streaming-shaped batch).
    "q15_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DEC6)).cast("double").as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // batch sessionization (gaps-and-islands; the batch face of
    // EventStreams.sessionize): a >30-min gap starts a new session.
    // Microsecond-exact gap comparison on both engines.
    "q17_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("brk"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("sid"))
    }),

    // explicit GROUPING SETS (A7, beyond rollup/cube): per-flag, per-status
    // and grand-total aggregates in one pass.
    "q19_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(s"""
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS $DEC)) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """.stripMargin)
    }),

    // window frames (O5): running decimal-exact revenue, lag, and ntile
    // over a per-customer frame — ROWS BETWEEN, ranking and analytic
    // functions in one window chain.
    "q20_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DEC))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("run_rev"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // exact interpolated quantiles (vs x2's approximate sketch): both
    // engines use the standard (n-1)*p linear interpolation on the sorted
    // values, so the doubles match exactly.
    "q18_exact_quantiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr(
          "percentile(CAST(o_totalprice AS DOUBLE), array(0.25D, 0.5D, 0.75D))").as("q"))
        .select(col("o_orderpriority"),
          element_at(col("q"), 1).as("p25"),
          element_at(col("q"), 2).as("p50"),
          element_at(col("q"), 3).as("p75"))
        .orderBy(col("o_orderpriority"))
    }))

  val oracle: Map[String, String] = Map(
    "q19_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q20_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_rev,
        |  LAG(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
        |  NTILE(4) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q18_exact_quantiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25) AS p25,
        |  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
        |  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75) AS p75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT p_partkey, p_name, p_brand, p_size
        |FROM part
        |WHERE p_size > 40 AND p_type LIKE 'STANDARD%'
        |ORDER BY p_partkey""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,
    "q5_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q6_setops" ->
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |  INTERSECT
        |  SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |), co AS (
        |  SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |  EXCEPT
        |  SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |)
        |SELECT 'both' AS tag, nk FROM b
        |UNION ALL
        |SELECT 'cust_only' AS tag, nk FROM co
        |ORDER BY tag, nk""".stripMargin,
    "q7_window" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,
    "q8_semi_anti" ->
      """SELECT 'has_order' AS tag, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_order' AS tag, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag, c_custkey""".stripMargin,
    "q9_outer_join" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q10_cross" ->
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b
        |WHERE a.r_name < b.r_name
        |ORDER BY r1, r2""".stripMargin,
    "q11_expr" ->
      """SELECT p_partkey,
        |  p_brand || '/' || p_type AS brand_type,
        |  CASE WHEN p_size < 10 THEN 'small'
        |       WHEN p_size < 30 THEN 'medium'
        |       ELSE 'large' END AS size_class,
        |  p_retailprice / p_size AS price_per_size
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q12_having" ->
      """SELECT l_suppkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(*) > 50
        |ORDER BY l_suppkey""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q14_countd" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q15_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    "q17_sessions" ->
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
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin)
}
