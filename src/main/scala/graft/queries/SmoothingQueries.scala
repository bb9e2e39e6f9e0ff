package graft.queries

import graft.core.Tables
import graft.forecast.{Forecast, Smoothing}
import graft.operators.DailyKpi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exponential-smoothing queries (EWMA / Holt / Holt-Winters). The DuckDB
  * oracles replay the exact per-series fold with recursive CTEs — the
  * recursions use only IEEE `*`/`+`/`-` on dyadic coefficients, so both
  * engines produce bit-identical doubles (see [[graft.forecast.Smoothing]]).
  */
object SmoothingQueries {
  type Q = (SparkSession, String) => DataFrame

  private def series(s: SparkSession, d: String): DataFrame =
    Forecast.fetchSeries(OracleCte.roundMd(DailyKpi.aggregate(Tables.cleanEvents(s, d))))

  /** Chronological row index per series over the shared gap-filled series. */
  private val idxCte: String =
    """idx AS (
      |  SELECT source_id, metric, metric_date, value,
      |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS rn
      |  FROM series
      |)""".stripMargin

  val defs: Map[String, Q] = Map(
    // EWMA smoothing (alpha = 0.25), every row with its smoothed value.
    "q81_ewma" -> ((s, d) => {
      Smoothing.ewma(series(s, d), alpha = 0.25)
        .select(col("source_id"), col("metric"), col("metric_date"), col("value"),
          OracleCte.qround6(col("ewma")).as("ewma"))
        .orderBy("source_id", "metric", "metric_date")
    }),
    // Holt linear-trend forecast, horizon 7 (alpha = 0.5, beta = 0.25).
    "q82_holt" -> ((s, d) => {
      Smoothing.holtForecast(series(s, d), horizon = 7, alpha = 0.5, beta = 0.25)
        .select(col("source_id"), col("metric"), col("target_date"),
          OracleCte.qround6(col("yhat")).as("yhat"), col("method"))
        .orderBy("source_id", "metric", "target_date")
    }),
    // Additive Holt-Winters, weekly cycle, horizon 10 so the forecast wraps
    // past one full season (alpha = 0.5, beta = 0.25, gamma = 0.25).
    "q83_holt_winters" -> ((s, d) => {
      Smoothing.holtWintersForecast(series(s, d), horizon = 10, period = 7,
          alpha = 0.5, beta = 0.25, gamma = 0.25)
        .select(col("source_id"), col("metric"), col("target_date"),
          OracleCte.qround6(col("yhat")).as("yhat"), col("method"))
        .orderBy("source_id", "metric", "target_date")
    })
  )

  val oracles: Map[String, String] = Map(
    "q81_ewma" ->
      s"""WITH RECURSIVE ${OracleCte.series},
         |$idxCte,
         |ew AS (
         |  SELECT source_id, metric, metric_date, value, rn, value AS ewma
         |  FROM idx WHERE rn = 1
         |  UNION ALL
         |  SELECT i.source_id, i.metric, i.metric_date, i.value, i.rn,
         |         0.25 * i.value + 0.75 * e.ewma
         |  FROM ew e JOIN idx i
         |    ON i.source_id = e.source_id AND i.metric = e.metric AND i.rn = e.rn + 1
         |)
         |SELECT source_id, metric, metric_date, value,
         |  ${OracleCte.qround6Sql("ewma")} AS ewma
         |FROM ew ORDER BY 1,2,3""".stripMargin,
    "q82_holt" -> {
      val newL = "0.5 * i.value + 0.5 * (h.l + h.b)"
      s"""WITH RECURSIVE ${OracleCte.series},
         |$idxCte,
         |hw AS (
         |  SELECT source_id, metric, rn, value AS l, CAST(0.0 AS DOUBLE) AS b
         |  FROM idx WHERE rn = 1
         |  UNION ALL
         |  SELECT i.source_id, i.metric, i.rn,
         |    $newL AS l,
         |    0.25 * (($newL) - h.l) + 0.75 * h.b AS b
         |  FROM hw h JOIN idx i
         |    ON i.source_id = h.source_id AND i.metric = h.metric AND i.rn = h.rn + 1
         |),
         |fin AS (
         |  SELECT source_id, metric, l, b FROM hw
         |  QUALIFY rn = max(rn) OVER (PARTITION BY source_id, metric)
         |),
         |per AS (SELECT source_id, metric, max(metric_date) AS last_date FROM series GROUP BY 1,2),
         |fc AS (
         |  SELECT f.source_id, f.metric,
         |    CAST(p.last_date + i.i * INTERVAL 1 DAY AS DATE) AS target_date,
         |    f.l + i.i * f.b AS yhat, 'holt_linear' AS method
         |  FROM fin f
         |  JOIN per p ON p.source_id = f.source_id AND p.metric = f.metric
         |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS i) AS i
         |)
         |SELECT source_id, metric, target_date,
         |  ${OracleCte.qround6Sql("yhat")} AS yhat, method
         |FROM fc ORDER BY 1,2,3""".stripMargin
    },
    "q83_holt_winters" -> {
      // seed state carries (running sum, raw values); converted exactly once
      // on the first post-seed row (h.rn = 7) — mirrors Smoothing's fold
      val lPrev = "CASE WHEN h.rn = 7 THEN h.l / 7 ELSE h.l END"
      val seasPrev = "CASE WHEN h.rn = 7 THEN list_transform(h.seas, v -> v - h.l / 7) ELSE h.seas END"
      val sOld = s"($seasPrev)[1]"
      val newL = s"0.5 * (i.value - $sOld) + 0.5 * (($lPrev) + h.b)"
      s"""WITH RECURSIVE ${OracleCte.series},
         |$idxCte,
         |hw AS (
         |  SELECT source_id, metric, rn, value AS l, CAST(0.0 AS DOUBLE) AS b,
         |         [value] AS seas
         |  FROM idx WHERE rn = 1
         |  UNION ALL
         |  SELECT i.source_id, i.metric, i.rn,
         |    CASE WHEN i.rn <= 7 THEN h.l + i.value ELSE $newL END AS l,
         |    CASE WHEN i.rn <= 7 THEN 0.0
         |         ELSE 0.25 * (($newL) - ($lPrev)) + 0.75 * h.b END AS b,
         |    CASE WHEN i.rn <= 7 THEN list_append(h.seas, i.value)
         |         ELSE list_append(($seasPrev)[2:],
         |                0.25 * (i.value - ($newL)) + 0.75 * $sOld) END AS seas
         |  FROM hw h JOIN idx i
         |    ON i.source_id = h.source_id AND i.metric = h.metric AND i.rn = h.rn + 1
         |),
         |fin AS (
         |  SELECT source_id, metric, rn AS n, l, b, seas FROM hw
         |  QUALIFY rn = max(rn) OVER (PARTITION BY source_id, metric)
         |),
         |per AS (SELECT source_id, metric, max(metric_date) AS last_date FROM series GROUP BY 1,2),
         |fc AS (
         |  SELECT f.source_id, f.metric,
         |    CAST(p.last_date + i.i * INTERVAL 1 DAY AS DATE) AS target_date,
         |    CASE WHEN f.n <= 7 THEN f.seas[CAST(f.n AS INT)]
         |         ELSE f.l + i.i * f.b + f.seas[((i.i - 1) % 7) + 1] END AS yhat,
         |    CASE WHEN f.n <= 7 THEN 'naive_hold_last' ELSE 'holt_winters' END AS method
         |  FROM fin f
         |  JOIN per p ON p.source_id = f.source_id AND p.metric = f.metric
         |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS i) AS i
         |)
         |SELECT source_id, metric, target_date,
         |  ${OracleCte.qround6Sql("yhat")} AS yhat, method
         |FROM fc ORDER BY 1,2,3""".stripMargin
    }
  )
}
