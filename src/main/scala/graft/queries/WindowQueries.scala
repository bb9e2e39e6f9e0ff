package graft.queries

import graft.core.Tables
import graft.operators.{DailyKpi, Windows}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared DuckDB oracle CTE fragments over the `events` table, mirroring the
  * metric_daily -> series pipeline exactly as the Spark side builds it.
  */
object OracleCte {
  import org.apache.spark.sql.Column

  /** Order-independent average of potentially huge-magnitude terms: each term
    * is computed identically in Spark and DuckDB (per-element IEEE ops are
    * exact-rounded on identical inputs), then summed as DECIMAL(38,18) so the
    * shuffle/partial-agg order cannot change the result. Used for MAPE over
    * gap-filled series, whose eps-denominator terms reach ~1e8 and make plain
    * double summation order-sensitive beyond the rounding quantum.
    */
  def stableAvg(term: Column): Column = {
    import org.apache.spark.sql.functions._
    sum(floor(term * 1e8).cast("decimal(38,0)")).cast("double") / 1e8 / count(term)
  }

  /** DuckDB twin of [[stableAvg]]. Quantizes each term at 1e-8 (exact-rounded
    * double ops on identical inputs give identical longs), sums exactly as
    * integers, so neither engine's summation order matters.
    */
  def stableAvgSql(termSql: String): String =
    s"CAST(sum(CAST(floor(($termSql) * 1e8) AS BIGINT)) AS DOUBLE) / 1e8 / count(*)"

  /** Deterministic 6-decimal rounding for large-magnitude doubles: Spark's
    * `round` (BigDecimal HALF_UP) and DuckDB's (scaled rint) differ by ulps
    * at 1e9 magnitude; floor(x*1e6+0.5)/1e6 is exact-rounded IEEE ops on
    * identical inputs and thus bit-identical across engines.
    */
  def qround6(c: Column): Column = {
    import org.apache.spark.sql.functions._
    floor(c * 1e6 + 0.5) / 1e6
  }

  def qround6Sql(x: String): String = s"floor(($x)*1e6 + 0.5)/1e6"

  /** DuckDB twin of [[graft.expressions.Hex60]] — the ONE definition every
    * oracle shares (a drifted copy would silently break hash equivalence
    * for every query using the stale text).
    */
  val hex60Sql: String => String =
    e => s"CAST(concat('0x', substr(md5($e),1,15)) AS BIGINT)"

  /** DuckDB twin of [[graft.dedup.Dedup.wordShingles]] at n=3 over the
    * documents table — the ONE shingle definition the dedup/decontamination
    * oracles share (same drifted-copy argument as [[hex60Sql]]).
    */
  val triCte: String = triCteOver("documents")

  /** [[triCte]] parameterized over the corpus relation, so delta-cycle
    * oracles (q178) can root the SAME shingle definition at a derived
    * snapshot CTE instead of the documents table.
    */
  def triCteOver(rel: String): String =
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $rel
      |),
      |tri AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
      |)""".stripMargin

  /** Spark twin of the quantization inside the `series` oracle CTE.
    *
    * Event values are exact 2-decimal quantities, so the true per-day sums
    * are integers of cents; `floor(x*100 + 0.5)/100` lands both engines on
    * bit-identical doubles regardless of their (order-dependent) FP sums —
    * the true value is always 0.5 away from the floor boundary, while the
    * engines' sums differ only at ~1e-12. `round(x, n)` is NOT usable for
    * this: Spark rounds via BigDecimal, DuckDB via scaled rint, and their
    * results differ by 1 ulp, which eps-denominator metrics amplify.
    */
  def roundMd(md: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def cents(c: org.apache.spark.sql.Column) = floor(c * 100.0 + 0.5) / 100.0
    md.withColumn("value_sum", cents(org.apache.spark.sql.functions.col("value_sum")))
      .withColumn("value_avg", cents(org.apache.spark.sql.functions.col("value_avg")))
  }

  /** metric_daily from events (reference KPI aggregation, kpi.py:48-87). */
  val md: String =
    """md AS (
      |  SELECT CAST(ts AS DATE) AS metric_date, user_id AS source_id,
      |         event_type AS metric, sum(value) AS value_sum,
      |         avg(value) AS value_avg, count(*) AS value_count
      |  FROM events GROUP BY 1,2,3
      |)""".stripMargin

  /** Gap-filled fallback-chain series (forecast.py:22-37). Values are
    * quantized at 1e-6 so the FP summation order of the upstream KPI sums
    * cannot leak into eps-amplified downstream metrics.
    */
  val series: String = md +
    """,
      |fb AS (
      |  SELECT source_id, metric, metric_date,
      |    coalesce(CASE WHEN floor(value_sum*100.0 + 0.5)/100.0 <> 0.0 THEN floor(value_sum*100.0 + 0.5)/100.0 END,
      |             CASE WHEN floor(value_avg*100.0 + 0.5)/100.0 <> 0.0 THEN floor(value_avg*100.0 + 0.5)/100.0 END,
      |             CASE WHEN CAST(value_count AS DOUBLE) <> 0.0 THEN CAST(value_count AS DOUBLE) END,
      |             0.0) AS value
      |  FROM md
      |),
      |bounds AS (
      |  SELECT source_id, metric, min(metric_date) AS d0, max(metric_date) AS d1
      |  FROM fb GROUP BY 1,2
      |),
      |spine AS (
      |  SELECT source_id, metric,
      |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS metric_date
      |  FROM bounds
      |),
      |series AS (
      |  SELECT s.source_id, s.metric, s.metric_date, coalesce(f.value, 0.0) AS value
      |  FROM spine s LEFT JOIN fb f USING (source_id, metric, metric_date)
      |)""".stripMargin
}

/** Window / time-series queries (SURVEY.md §2.4 W1-W6). */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  private def md(s: SparkSession, d: String): DataFrame =
    DailyKpi.aggregate(Tables.cleanEvents(s, d))

  private def mdValue(s: SparkSession, d: String): DataFrame =
    md(s, d).select(col("source_id"), col("metric"), col("metric_date"),
      col("value_sum").as("value"))

  val defs: Map[String, Q] = Map(
    "q13_zscore_strict" -> ((s, d) => {
      Windows.zScoreStrict(mdValue(s, d), 7, Seq("source_id", "metric"))
        .select(col("source_id"), col("metric"), col("metric_date"),
          round(col("value"), 2).as("value"), round(col("z"), 6).as("z"))
        .orderBy("source_id", "metric", "metric_date")
    }),
    "q14_zscore_partial" -> ((s, d) => {
      Windows.zScorePartial(mdValue(s, d), 7, 3.0, Seq("source_id", "metric"))
        .select(col("source_id"), col("metric"), col("metric_date"),
          round(col("value"), 2).as("value"), round(col("z"), 6).as("z"), col("is_outlier"))
        .orderBy("source_id", "metric", "metric_date")
    }),
    "q15_gapfill" -> ((s, d) => {
      graft.forecast.Forecast.fetchSeries(OracleCte.roundMd(md(s, d)))
        .select(col("source_id"), col("metric"), col("metric_date"),
          round(col("value"), 6).as("value"))
        .orderBy("source_id", "metric", "metric_date")
    }),
    "q16_iforest_features" -> ((s, d) => {
      Windows.iforestFeatures(mdValue(s, d), Seq("source_id", "metric"))
        .select(col("source_id"), col("metric"), col("metric_date"),
          round(col("value"), 2).as("value"),
          round(col("roll_mean"), 6).as("roll_mean"),
          round(col("roll_std"), 6).as("roll_std"),
          round(col("diff1"), 6).as("diff1"))
        .orderBy("source_id", "metric", "metric_date")
    }),
    "q17_lag_health" -> ((s, d) => {
      val keys = Seq(col("source_id"), col("metric"))
      val series = graft.forecast.Forecast.fetchSeries(OracleCte.roundMd(md(s, d)))
      val wDesc = Window.partitionBy(keys: _*).orderBy(col("metric_date").desc)
      val wAsc = Window.partitionBy(keys: _*).orderBy(col("metric_date").asc)
      val tailed = series.withColumn("rd", row_number().over(wDesc)).filter(col("rd") <= 91)
      val lagged = Windows.lagPersistence(tailed, Seq("source_id", "metric"))
        .filter(col("pred").isNotNull)
      val mapeTerm = abs(col("value") - col("pred")) / greatest(abs(col("value")), lit(1e-6))
      lagged.groupBy(keys: _*)
        .agg(OracleCte.qround6(OracleCte.stableAvg(mapeTerm) * 100.0).as("mape"),
          count(lit(1)).as("n_pairs"))
        .withColumn("window_n", lit(90))
        .orderBy("source_id", "metric")
    }),
    "q18_fold_split" -> ((s, d) => {
      Windows.foldSplit(mdValue(s, d), folds = 3, horizon = 7, Seq("source_id", "metric"))
        .filter(col("fold_idx").isNotNull)
        .select(col("source_id"), col("metric"), col("metric_date"), col("fold_idx"))
        .orderBy("source_id", "metric", "metric_date")
    })
  )

  val oracles: Map[String, String] = Map(
    "q13_zscore_strict" ->
      s"""WITH ${OracleCte.md}
         |SELECT source_id, metric, metric_date, round(value,2) AS value,
         |  round(CASE WHEN cnt = 7 AND sd > 0 THEN (value-mu)/sd END, 6) AS z
         |FROM (
         |  SELECT source_id, metric, metric_date, value_sum AS value,
         |    avg(value_sum) OVER w AS mu, stddev_pop(value_sum) OVER w AS sd,
         |    count(value_sum) OVER w AS cnt
         |  FROM md
         |  WINDOW w AS (PARTITION BY source_id, metric ORDER BY metric_date
         |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
         |)
         |ORDER BY source_id, metric, metric_date""".stripMargin,
    "q14_zscore_partial" ->
      s"""WITH ${OracleCte.md}
         |SELECT source_id, metric, metric_date, round(value,2) AS value,
         |  round(CASE WHEN cnt >= 2 THEN
         |    CASE WHEN sd = 0.0 THEN CASE WHEN value <> mu THEN 1e9 ELSE 0.0 END
         |         ELSE least(greatest((value-mu)/sd, -1e9), 1e9) END
         |  END, 6) AS z,
         |  coalesce(CASE WHEN cnt >= 2 THEN
         |    CASE WHEN sd = 0.0 THEN value <> mu ELSE abs((value-mu)/sd) >= 3.0 END
         |  END, false) AS is_outlier
         |FROM (
         |  SELECT source_id, metric, metric_date, value_sum AS value,
         |    avg(value_sum) OVER w AS mu, stddev_samp(value_sum) OVER w AS sd,
         |    count(value_sum) OVER w AS cnt
         |  FROM md
         |  WINDOW w AS (PARTITION BY source_id, metric ORDER BY metric_date
         |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
         |)
         |ORDER BY source_id, metric, metric_date""".stripMargin,
    "q15_gapfill" ->
      s"""WITH ${OracleCte.series}
         |SELECT source_id, metric, metric_date, round(value,6) AS value
         |FROM series ORDER BY 1,2,3""".stripMargin,
    "q16_iforest_features" ->
      s"""WITH ${OracleCte.md}
         |SELECT source_id, metric, metric_date, round(value,2) AS value,
         |  round(mu7, 6) AS roll_mean,
         |  round(coalesce(sd7, 0.0), 6) AS roll_std,
         |  round(coalesce(value - prev, 0.0), 6) AS diff1
         |FROM (
         |  SELECT source_id, metric, metric_date, value_sum AS value,
         |    avg(value_sum) OVER w7 AS mu7, stddev_pop(value_sum) OVER w7 AS sd7,
         |    lag(value_sum, 1) OVER wo AS prev
         |  FROM md
         |  WINDOW w7 AS (PARTITION BY source_id, metric ORDER BY metric_date
         |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
         |         wo AS (PARTITION BY source_id, metric ORDER BY metric_date)
         |)
         |ORDER BY source_id, metric, metric_date""".stripMargin,
    "q17_lag_health" ->
      s"""WITH ${OracleCte.series},
         |tailed AS (
         |  SELECT *, row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date DESC) AS rd
         |  FROM series QUALIFY rd <= 91
         |),
         |lagged AS (
         |  SELECT *, lag(value) OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS pred
         |  FROM tailed QUALIFY pred IS NOT NULL
         |)
         |SELECT source_id, metric,
         |  ${OracleCte.qround6Sql(OracleCte.stableAvgSql("abs(value - pred) / greatest(abs(value), 1e-6)") + " * 100.0")} AS mape,
         |  count(*) AS n_pairs, 90 AS window_n
         |FROM lagged GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q18_fold_split" ->
      s"""WITH ${OracleCte.md},
         |idx AS (
         |  SELECT source_id, metric, metric_date,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS rn,
         |    count(*) OVER (PARTITION BY source_id, metric) AS n
         |  FROM md
         |)
         |SELECT source_id, metric, metric_date,
         |  CAST(floor((n - rn) / 7.0) AS INT) AS fold_idx
         |FROM idx
         |WHERE floor((n - rn) / 7.0) < 3 AND rn > n - 21
         |ORDER BY 1,2,3""".stripMargin
  )
}
