package graft.queries

import graft.core.Tables
import graft.operators.{DailyKpi, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational + KPI core queries (SURVEY.md §2.3), each paired with a DuckDB
  * oracle. Aggregated doubles are rounded identically on both sides so the
  * driver's hash compare is insensitive to FP summation order.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")

  val defs: Map[String, Q] = Map(
    // R5-style wide aggregation over the big fact table (TPC-H Q1 shape).
    // Filter reaches the parquet scan as a pushed predicate; agg is
    // partial+final hash agg — no raw-row shuffle.
    "q01_pricing_summary" -> ((s, d) => {
      li(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1999-12-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // The reference's KPI core: daily UTC bucketing + sum/avg/count/distinct
    // (services/kpi.py:14-134). metric_daily materialization query.
    "q02_kpi_daily" -> ((s, d) => {
      DailyKpi.aggregate(Tables.cleanEvents(s, d), distinctCol = Some("ts"))
        .select(
          col("metric_date"), col("source_id"), col("metric"),
          round(col("value_sum"), 2).as("value_sum"),
          round(col("value_avg"), 6).as("value_avg"),
          col("value_count"), col("value_distinct"))
        .orderBy("metric_date", "source_id", "metric")
    }),

    // Fact ⋈ dim ⋈ fact with group + deterministic top-k (TPC-H Q3 shape).
    // customer is broadcast; orders⋈lineitem shuffles on orderkey once.
    "q03_shipping_priority" -> ((s, d) => {
      val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = ord(s, d).filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val l = li(s, d).filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
      val joined = l
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      joined
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Multi-way star join through region→nation→(customer,supplier) with the
    // TPC-H Q5 local-supplier constraint; all dims broadcast, single big
    // shuffle on orderkey.
    "q04_region_volume" -> ((s, d) => {
      val r = Tables(s, d, "region")
      val n = Tables(s, d, "nation")
      val su = Tables(s, d, "supplier")
      val c = cust(s, d)
      val o = ord(s, d).filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val l = li(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // Existential semi-join (TPC-H Q4 shape): orders having any lineitem
    // shipped in-window, counted per priority. left_semi avoids
    // materializing the match multiplicity.
    "q05_order_priority" -> ((s, d) => {
      val o = ord(s, d).filter(
        col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val l = li(s, d).filter(col("l_shipdate") > to_timestamp(lit("1999-01-01 00:00:00")))
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Pure filter+agg, no grouping (TPC-H Q6 shape) — the whole plan is one
    // codegen stage over the scan with pushed predicates.
    "q06_revenue_delta" -> ((s, d) => {
      li(s, d)
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
            col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
            col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // R9: distinct metric names, sorted (metrics_fetch.py:118-141).
    "q07_distinct_metrics" -> ((s, d) =>
      Relational.distinctSorted(Tables.cleanEvents(s, d), "metric")),

    // R7: per-source ts bounds; timestamps emitted as epoch micros so the
    // oracle compare is precision-exact.
    "q08_source_bounds" -> ((s, d) => {
      DailyKpi.tsBounds(Tables.cleanEvents(s, d), Seq("source_id"))
        .select(col("source_id"),
          unix_micros(col("min_ts")).as("min_ts_us"),
          unix_micros(col("max_ts")).as("max_ts_us"),
          col("n"))
        .orderBy("source_id")
    }),

    // R11: last-7 per series via ranked window, chronological output
    // (forecast_reliability.py:26-37 pattern).
    "q09_last_n" -> ((s, d) => {
      val md = DailyKpi.aggregate(Tables.cleanEvents(s, d))
      DailyKpi.lastN(md, 7, Seq("source_id", "metric"))
        .select(col("source_id"), col("metric"), col("metric_date"),
          round(col("value_sum"), 2).as("value_sum"))
        .orderBy("source_id", "metric", "metric_date")
    }),

    // R8: unified value selector, agg=avg (metrics_calc.py:28-58) plus the
    // safe-divide avg recompute (routers/kpi.py:132).
    "q10_agg_selector" -> ((s, d) => {
      val md = DailyKpi.aggregate(Tables.cleanEvents(s, d))
        .withColumn("value_avg", DailyKpi.safeAvg(col("value_sum"), col("value_count")))
      DailyKpi.withUnifiedValue(md, "avg")
        .select(col("metric_date"), col("source_id"), col("metric"),
          round(col("value"), 6).as("value"))
        .orderBy("metric_date", "source_id", "metric")
    }),

    // Deterministic top-k over a dim join: top 10 brands by shipped quantity.
    "q11_top_brands" -> ((s, d) => {
      val p = Tables(s, d, "part")
      val l = li(s, d)
      val g = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
          count(lit(1)).as("n_items"))
      Relational.topK(g, 10, "total_qty", "p_brand")
    }),

    // C/F: value fallback chain with the reference's falsy-0.0 semantics
    // (anomaly.py:29-44, forecast.py:33 `value_sum or value_avg or ...`).
    "q12_value_fallback" -> ((s, d) => {
      val md = DailyKpi.aggregate(Tables.cleanEvents(s, d))
      md.withColumn("value",
          DailyKpi.valueFallback(Seq(col("value_sum"), col("value_avg"), col("value_count").cast("double"))))
        .select(col("metric_date"), col("source_id"), col("metric"),
          round(col("value"), 6).as("value"))
        .orderBy("metric_date", "source_id", "metric")
    }),

    // R5/R8: the exact-distinct KPI measure on a column with true repeats
    // (2-decimal values collide within a day, so distinct < count — q02's
    // distinct-on-ts is degenerate: timestamps are unique per group and a
    // bug conflating countDistinct with count would pass). Routed through
    // the unified-value selector with agg="distinct"
    // (kpi.py:61; tests/kpi_metrics_engine/test_kpi_variants.py:66-85).
    "q90_value_distinct" -> ((s, d) => {
      val md = DailyKpi.aggregate(Tables.cleanEvents(s, d), distinctCol = Some("value"))
      DailyKpi.withUnifiedValue(md, "distinct")
        .select(col("metric_date"), col("source_id"), col("metric"),
          col("value_count"), col("value_distinct"), col("value"))
        .orderBy("metric_date", "source_id", "metric")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_extendedprice),6) AS avg_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_kpi_daily" ->
      """SELECT CAST(ts AS DATE) AS metric_date, user_id AS source_id, event_type AS metric,
        | round(sum(value),2) AS value_sum,
        | round(avg(value),6) AS value_avg,
        | count(*) AS value_count,
        | count(DISTINCT ts) AS value_distinct
        |FROM events
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_orderpriority,
        | round(sum(l.l_extendedprice*(1.0-l.l_discount)),2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1,2,3
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q04_region_volume" ->
      """SELECT n.n_name,
        | round(sum(l.l_extendedprice*(1.0-l.l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q05_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q06_revenue_delta" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.04 AND l_discount <= 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q07_distinct_metrics" ->
      "SELECT DISTINCT event_type AS metric FROM events ORDER BY metric",
    "q08_source_bounds" ->
      """SELECT user_id AS source_id,
        | epoch_ns(min(ts))//1000 AS min_ts_us,
        | epoch_ns(max(ts))//1000 AS max_ts_us,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_last_n" ->
      """WITH md AS (
        |  SELECT CAST(ts AS DATE) AS metric_date, user_id AS source_id,
        |         event_type AS metric, sum(value) AS value_sum
        |  FROM events GROUP BY 1,2,3
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date DESC) AS rn
        |  FROM md
        |)
        |SELECT source_id, metric, metric_date, round(value_sum,2) AS value_sum
        |FROM ranked WHERE rn <= 7
        |ORDER BY source_id, metric, metric_date""".stripMargin,
    "q10_agg_selector" ->
      """SELECT CAST(ts AS DATE) AS metric_date, user_id AS source_id, event_type AS metric,
        | round(CASE WHEN count(*) <> 0 THEN sum(value)/count(*) END, 6) AS value
        |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q11_top_brands" ->
      """SELECT p.p_brand, round(sum(l.l_quantity),2) AS total_qty, count(*) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand
        |ORDER BY total_qty DESC, p_brand ASC
        |LIMIT 10""".stripMargin,
    "q12_value_fallback" ->
      """WITH md AS (
        |  SELECT CAST(ts AS DATE) AS metric_date, user_id AS source_id, event_type AS metric,
        |         sum(value) AS value_sum, avg(value) AS value_avg,
        |         CAST(count(*) AS DOUBLE) AS value_count
        |  FROM events GROUP BY 1,2,3
        |)
        |SELECT metric_date, source_id, metric,
        | round(coalesce(
        |   CASE WHEN value_sum IS NOT NULL AND value_sum <> 0.0 THEN value_sum END,
        |   CASE WHEN value_avg IS NOT NULL AND value_avg <> 0.0 THEN value_avg END,
        |   CASE WHEN value_count IS NOT NULL AND value_count <> 0.0 THEN value_count END,
        |   0.0), 6) AS value
        |FROM md ORDER BY 1,2,3""".stripMargin,
    "q90_value_distinct" ->
      """SELECT CAST(ts AS DATE) AS metric_date, user_id AS source_id, event_type AS metric,
        | count(*) AS value_count,
        | count(DISTINCT value) AS value_distinct,
        | count(DISTINCT value) AS value
        |FROM events GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin
  )
}
