package graft.queries

import graft.core.Tables
import graft.operators.DailyKpi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP shapes the reference's dashboard queries imply but never name:
  * subtotal rollups, metric pivots, exact distribution quantiles, and a
  * conversion funnel. Each is a single declarative plan (rollup's Expand,
  * pivot's conditional agg, percentile's typed agg) so Catalyst keeps the
  * partial-agg/pushdown structure, and each has an exact DuckDB twin.
  */
object OlapQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Revenue rollup with subtotals and grand total (GROUP BY ROLLUP).
    // Prices are exact cents, so summing as DECIMAL(18,2) is exact and
    // order-independent — the grand-total row over the whole fact table
    // would otherwise be the most order-sensitive double sum in the repo.
    "q84_rollup" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("gid"), col("sum_price"), col("n"))
        .orderBy("gid", "l_returnflag", "l_linestatus")
    }),

    // CUBE — rollup's full-lattice sibling: all four grouping sets of
    // (returnflag, linestatus) in ONE Expand pass (no union of scans).
    // Same exact-cents decimal sums as q84, so every subtotal row —
    // including the two cross-cuts rollup cannot express — is
    // order-independent.
    "q219_cube" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
          col("gid"), col("sum_price"), col("n"))
        .orderBy("gid", "l_returnflag", "l_linestatus")
    }),

    // Month × event-type count matrix via pivot. The value list is pinned
    // (the generator's five event types) so the output schema is static —
    // at scale an unpinned pivot would first run a distinct over the fact
    // table just to learn its columns.
    "q85_pivot" -> ((s, d) => {
      Tables.cleanEvents(s, d)
        .withColumn("month", trunc(to_date(col("ts")), "month"))
        .groupBy(col("month"))
        .pivot("metric", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("month")
    }),

    // Exact per-metric quantiles of the daily KPI distribution. Input values
    // are cents-quantized (identical doubles in both engines), so only the
    // engines' shared type-7 interpolation arithmetic is on the hash path.
    "q86_quantiles" -> ((s, d) => {
      OracleCte.roundMd(DailyKpi.aggregate(Tables.cleanEvents(s, d)))
        .groupBy(col("metric"))
        .agg(expr("percentile(value_sum, array(0.25D, 0.5D, 0.75D, 0.95D))").as("qs"),
          count(lit(1)).as("n_days"))
        .select(col("metric"),
          OracleCte.qround6(element_at(col("qs"), 1)).as("p25"),
          OracleCte.qround6(element_at(col("qs"), 2)).as("p50"),
          OracleCte.qround6(element_at(col("qs"), 3)).as("p75"),
          OracleCte.qround6(element_at(col("qs"), 4)).as("p95"),
          col("n_days"))
        .orderBy("metric")
    }),

    // Strictly-ordered conversion funnel view → click → purchase: each stage
    // keeps users whose first qualifying event is strictly after their entry
    // into the previous stage. All comparisons are on BIGINT microseconds —
    // the one representation both engines derive identically from the
    // nanosecond source column (`TESTDATA.md` events gotcha).
    "q87_funnel" -> ((s, d) => {
      val ev = Tables(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("t1"))
        .groupBy("user_id").agg(min(col("us")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("t2"))
        .groupBy("user_id").agg(min(col("us")).as("t3"))
      v.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
        .unionByName(c.agg(count(lit(1)).as("users")).select(lit("2_click").as("stage"), col("users")))
        .unionByName(p.agg(count(lit(1)).as("users")).select(lit("3_purchase").as("stage"), col("users")))
        .orderBy("stage")
    }),

    // Column profiler over the documents table: completeness, exact
    // cardinality, and typed bounds per column in ONE pass (multi-distinct
    // Expand + one hash aggregate, then a stack projection to long form).
    "q137_profile" -> ((s, d) => {
      graft.operators.Profile.profile(
          Tables(s, d, "documents"), Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy("column_name")
    })
  )

  /** One q137 oracle branch: the per-column stats row, with bounds routed
    * to the numeric or string pair exactly as [[graft.operators.Profile]]
    * types them.
    */
  private def profileBranch(c: String, num: Boolean): String = {
    val (mn, mx) = if (num) (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
      else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
    val (ms, xs) = if (num) ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      else (s"min($c)", s"max($c)")
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
       |  $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
       |FROM documents""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q137_profile" ->
      s"""${profileBranch("doc_id", num = true)}
         |UNION ALL
         |${profileBranch("lang", num = false)}
         |UNION ALL
         |${profileBranch("source", num = false)}
         |UNION ALL
         |${profileBranch("n_chars", num = true)}
         |ORDER BY column_name""".stripMargin,
    "q84_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
        |  coalesce(l_linestatus, '(all)') AS l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 3, 1, 2""".stripMargin,
    "q219_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
        |  coalesce(l_linestatus, '(all)') AS l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 3, 1, 2""".stripMargin,
    "q85_pivot" ->
      """SELECT date_trunc('month', CAST(ts AS DATE)) AS month,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q86_quantiles" ->
      s"""WITH ${OracleCte.md}
         |SELECT metric,
         |  ${OracleCte.qround6Sql("quantile_cont(floor(value_sum*100.0 + 0.5)/100.0, 0.25)")} AS p25,
         |  ${OracleCte.qround6Sql("quantile_cont(floor(value_sum*100.0 + 0.5)/100.0, 0.5)")} AS p50,
         |  ${OracleCte.qround6Sql("quantile_cont(floor(value_sum*100.0 + 0.5)/100.0, 0.75)")} AS p75,
         |  ${OracleCte.qround6Sql("quantile_cont(floor(value_sum*100.0 + 0.5)/100.0, 0.95)")} AS p95,
         |  count(*) AS n_days
         |FROM md GROUP BY 1 ORDER BY 1""".stripMargin,
    "q87_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
        |),
        |v AS (SELECT user_id, min(us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.us) AS t2 FROM ev e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1
        |),
        |p AS (
        |  SELECT e.user_id, min(e.us) AS t3 FROM ev e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1
        |)
        |SELECT '1_view' AS stage, count(*) AS users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p
        |ORDER BY 1""".stripMargin
  )
}
