package graft.queries

import graft.core.Tables
import graft.forecast.Forecast
import graft.operators.DailyKpi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forecast-chain queries (SURVEY.md §2.5 M2, M5-M9). */
object ForecastQueries {
  type Q = (SparkSession, String) => DataFrame

  private def md(s: SparkSession, d: String): DataFrame =
    DailyKpi.aggregate(Tables.cleanEvents(s, d))

  /** Oracle fragment: per-series hold-last forecast base (forecast.py:109-129
    * with SARIMAX unavailable), horizon rows per series.
    */
  private def holdLastSql(horizon: Int): String =
    s"""per AS (
       |  SELECT source_id, metric, count(*) AS n, sum(value) AS total,
       |         arg_max(value, metric_date) AS last_val, max(metric_date) AS last_date
       |  FROM series GROUP BY 1,2
       |),
       |fc AS (
       |  SELECT source_id, metric,
       |    CAST(last_date + i.i * INTERVAL 1 DAY AS DATE) AS target_date,
       |    CASE WHEN total = 0.0 THEN 0.0 ELSE last_val END AS yhat,
       |    CASE WHEN total = 0.0 THEN 0.0 WHEN n < 14 THEN last_val ELSE 0.0 END AS yhat_lower,
       |    CASE WHEN total = 0.0 THEN 0.0 WHEN n < 14 THEN last_val ELSE 0.0 END AS yhat_upper,
       |    'sarimax-0.1' AS model_version
       |  FROM per CROSS JOIN (SELECT unnest(generate_series(1, $horizon)) AS i) AS i
       |)""".stripMargin

  val defs: Map[String, Q] = Map(
    // M2: deterministic forecast chain, horizon 7, strictly-future dates.
    "q19_forecast_holdlast" -> ((s, d) => {
      Forecast.holdLastForecast(Forecast.fetchSeries(OracleCte.roundMd(md(s, d))), horizon = 7)
        .select(col("source_id"), col("metric"), col("target_date"),
          round(col("yhat"), 6).as("yhat"),
          round(col("yhat_lower"), 6).as("yhat_lower"),
          round(col("yhat_upper"), 6).as("yhat_upper"),
          col("model_version"))
        .orderBy("source_id", "metric", "target_date")
    }),
    // M5: one-pass error metrics of lag-1 persistence over each full series.
    "q20_error_metrics" -> ((s, d) => {
      val series = Forecast.fetchSeries(OracleCte.roundMd(md(s, d)))
      val lagged = graft.operators.Windows.lagPersistence(series, Seq("source_id", "metric"))
        .filter(col("pred").isNotNull)
      lagged.groupBy(col("source_id"), col("metric")).agg(
        round(Forecast.mae(col("value"), col("pred")), 6).as("mae"),
        round(Forecast.rmse(col("value"), col("pred")), 6).as("rmse"),
        OracleCte.qround6(Forecast.mape(col("value"), col("pred"))).as("mape"),
        round(Forecast.smape(col("value"), col("pred")), 6).as("smape"),
        round(Forecast.bias(col("value"), col("pred")), 6).as("bias"),
        count(lit(1)).as("n_pairs"))
        .orderBy("source_id", "metric")
    }),
    // M7: persisted reliability scorer with instability penalty.
    "q21_reliability" -> ((s, d) => {
      Forecast.reliability(OracleCte.roundMd(md(s, d)), days = 90, folds = 5, horizon = 7)
        .select(col("source_id"), col("metric"), col("folds"),
          OracleCte.qround6(col("mape_agg")).as("mape_agg"),
          round(col("rmse_agg"), 6).as("rmse_agg"),
          round(col("smape_agg"), 6).as("smape_agg"),
          OracleCte.qround6(col("instability")).as("instability"),
          col("score"))
        .orderBy("source_id", "metric")
    }),
    // M6: rolling-origin backtest score (naive predictor path).
    "q22_backtest_score" -> ((s, d) => {
      Forecast.backtest(OracleCte.roundMd(md(s, d)), folds = 5, horizon = 7, windowN = 90)
        .select(col("source_id"), col("metric"), col("folds"),
          round(col("avg_mae"), 6).as("avg_mae"),
          round(col("avg_rmse"), 6).as("avg_rmse"),
          OracleCte.qround6(col("avg_mape")).as("avg_mape"),
          round(col("avg_smape"), 6).as("avg_smape"),
          round(col("score"), 6).as("score"))
        .orderBy("source_id", "metric")
    }),
    // M3: moving-average fallback with residual-sd bands (ci=90, z=1.645).
    "q41_ma_forecast" -> ((s, d) => {
      val series = md(s, d).select(col("source_id"), col("metric"), col("metric_date"),
        col("value_sum").as("value"))
      Forecast.maForecast(series, horizon = 5, ci = 90)
        .select(col("source_id"), col("metric"), col("target_date"),
          round(col("yhat"), 6).as("yhat"),
          round(col("yhat_lower"), 6).as("yhat_lower"),
          round(col("yhat_upper"), 6).as("yhat_upper"),
          col("method"))
        .orderBy("source_id", "metric", "target_date")
    }),
    // Seasonal-naive forecast: weekly phase repeat with lag-7 residual bands;
    // horizon 10 crosses the season boundary so the phase wraparound is
    // oracle-checked too.
    "q74_seasonal_naive" -> ((s, d) => {
      Forecast.seasonalNaiveForecast(Forecast.fetchSeries(OracleCte.roundMd(md(s, d))),
          horizon = 10, period = 7, ci = 90)
        .select(col("source_id"), col("metric"), col("target_date"),
          round(col("yhat"), 6).as("yhat"),
          round(col("yhat_lower"), 6).as("yhat_lower"),
          round(col("yhat_upper"), 6).as("yhat_upper"),
          col("method"))
        .orderBy("source_id", "metric", "target_date")
    }),
    // M8+M9: contract normalizer — horizon-5 forecast padded to exactly 7
    // rows, UTC-midnight Z strings, bounds ordered and widened.
    "q23_forecast_contract" -> ((s, d) => {
      val fc = Forecast.holdLastForecast(Forecast.fetchSeries(OracleCte.roundMd(md(s, d))), horizon = 5)
      Forecast.normalizeContract(fc)
        .select(col("source_id"), col("metric"), col("metric_date"),
          round(col("yhat"), 6).as("yhat"),
          round(col("yhat_lower"), 6).as("yhat_lower"),
          round(col("yhat_upper"), 6).as("yhat_upper"),
          col("date"))
        .orderBy("source_id", "metric", "metric_date")
    })
  )

  val oracles: Map[String, String] = Map(
    "q19_forecast_holdlast" ->
      s"""WITH ${OracleCte.series},
         |${holdLastSql(7)}
         |SELECT source_id, metric, target_date,
         |  round(yhat,6) AS yhat, round(yhat_lower,6) AS yhat_lower,
         |  round(yhat_upper,6) AS yhat_upper, model_version
         |FROM fc ORDER BY 1,2,3""".stripMargin,
    "q20_error_metrics" ->
      s"""WITH ${OracleCte.series},
         |lagged AS (
         |  SELECT *, lag(value) OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS pred
         |  FROM series QUALIFY pred IS NOT NULL
         |)
         |SELECT source_id, metric,
         |  round(avg(abs(value - pred)), 6) AS mae,
         |  round(sqrt(avg((value - pred)*(value - pred))), 6) AS rmse,
         |  ${OracleCte.qround6Sql(OracleCte.stableAvgSql("abs(value - pred) / greatest(abs(value), 1e-6)") + " * 100.0")} AS mape,
         |  round(avg(abs(value - pred) / CASE WHEN abs(value)+abs(pred) = 0.0 THEN 1.0 ELSE abs(value)+abs(pred) END) * 100.0, 6) AS smape,
         |  round(avg(pred - value), 6) AS bias,
         |  count(*) AS n_pairs
         |FROM lagged GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q21_reliability" ->
      s"""WITH ${OracleCte.md},
         |srt AS (
         |  SELECT source_id, metric, metric_date, floor(value_sum*100.0 + 0.5)/100.0 AS y,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date DESC) AS rd
         |  FROM md QUALIFY rd <= 90
         |),
         |idx AS (
         |  SELECT source_id, metric, y,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS rn,
         |    count(*) OVER (PARTITION BY source_id, metric) AS n
         |  FROM srt
         |),
         |folds AS (
         |  SELECT source_id, metric, n,
         |    least(5, greatest(n - 8, 0)) AS eff_folds,
         |    unnest(generate_series(0, 4)) AS kf
         |  FROM (SELECT DISTINCT source_id, metric, n FROM idx)
         |),
         |valid AS (
         |  SELECT *, n - (eff_folds - kf) * 7 AS train_end
         |  FROM folds WHERE kf < eff_folds AND n - (eff_folds - kf) * 7 >= 1
         |),
         |lastv AS (
         |  SELECT v.source_id, v.metric, v.kf, v.train_end, i.y AS yhat
         |  FROM valid v JOIN idx i
         |    ON i.source_id = v.source_id AND i.metric = v.metric AND i.rn = v.train_end
         |),
         |test AS (
         |  SELECT l.source_id, l.metric, l.kf, l.yhat, i.y AS a
         |  FROM lastv l JOIN idx i
         |    ON i.source_id = l.source_id AND i.metric = l.metric
         |   AND i.rn > l.train_end AND i.rn <= l.train_end + 7
         |),
         |fold_stats AS (
         |  SELECT source_id, metric, kf,
         |    sqrt(avg((a - yhat)*(a - yhat))) AS rmse,
         |    CAST(sum(CAST(floor(abs(a - yhat) / (abs(a) + 1e-9) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*) * 100.0 AS mape,
         |    avg(2.0 * abs(a - yhat) / (abs(a) + abs(yhat) + 1e-9)) * 100.0 AS smape
         |  FROM test GROUP BY 1,2,3
         |)
         |SELECT source_id, metric, count(*) AS folds,
         |  floor((CAST(sum(CAST(floor(mape * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*))*1e6 + 0.5)/1e6 AS mape_agg,
         |  round(avg(rmse), 6) AS rmse_agg,
         |  round(avg(smape), 6) AS smape_agg,
         |  floor((CASE WHEN count(*) >= 2 THEN (max(mape) - min(mape)) / 10.0 ELSE 0.0 END)*1e6 + 0.5)/1e6 AS instability,
         |  CAST(floor(greatest(0.0, least(100.0,
         |    100.0 - (CAST(sum(CAST(floor(mape * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*))/2.0
         |      - CASE WHEN count(*) >= 2 THEN (max(mape) - min(mape)) / 10.0 ELSE 0.0 END))) AS INT) AS score
         |FROM fold_stats GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q22_backtest_score" ->
      s"""WITH ${OracleCte.series},
         |tailed AS (
         |  SELECT source_id, metric, metric_date, value,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date DESC) AS rd
         |  FROM series QUALIFY rd <= 125
         |),
         |idx AS (
         |  SELECT source_id, metric, value,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS rn,
         |    count(*) OVER (PARTITION BY source_id, metric) AS m
         |  FROM tailed
         |),
         |folds AS (
         |  SELECT source_id, metric, m,
         |    unnest(generate_series(0, 4)) AS t
         |  FROM (SELECT DISTINCT source_id, metric, m FROM idx)
         |),
         |valid AS (
         |  SELECT *, m - (t + 1) * 7 AS train_len
         |  FROM folds WHERE m - (t + 1) * 7 >= 8
         |),
         |lastv AS (
         |  SELECT v.source_id, v.metric, v.t, v.train_len, i.value AS yhat
         |  FROM valid v JOIN idx i
         |    ON i.source_id = v.source_id AND i.metric = v.metric AND i.rn = v.train_len
         |),
         |test AS (
         |  SELECT l.source_id, l.metric, l.t, l.yhat, i.value AS a
         |  FROM lastv l JOIN idx i
         |    ON i.source_id = l.source_id AND i.metric = l.metric
         |   AND i.rn > l.train_len AND i.rn <= l.train_len + 7
         |),
         |fold_stats AS (
         |  SELECT source_id, metric, t,
         |    avg(abs(a - yhat)) AS mae,
         |    sqrt(avg((a - yhat)*(a - yhat))) AS rmse,
         |    ${OracleCte.stableAvgSql("abs(a - yhat) / greatest(abs(a), 1e-6)")} * 100.0 AS mape,
         |    avg(abs(a - yhat) / CASE WHEN abs(a)+abs(yhat) = 0.0 THEN 1.0 ELSE abs(a)+abs(yhat) END) * 100.0 AS smape
         |  FROM test GROUP BY 1,2,3
         |)
         |SELECT source_id, metric, count(*) AS folds,
         |  round(avg(mae), 6) AS avg_mae,
         |  round(avg(rmse), 6) AS avg_rmse,
         |  ${OracleCte.qround6Sql(OracleCte.stableAvgSql("mape"))} AS avg_mape,
         |  round(avg(smape), 6) AS avg_smape,
         |  round(greatest(0.0, least(100.0, 100.0 - (${OracleCte.stableAvgSql("mape")} + avg(smape)) / 2.0)), 6) AS score
         |FROM fold_stats GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q41_ma_forecast" ->
      s"""WITH ${OracleCte.md},
         |srt AS (
         |  SELECT source_id, metric, metric_date, value_sum AS value,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date DESC) AS rd
         |  FROM md QUALIFY rd <= 14
         |),
         |stats AS (
         |  SELECT source_id, metric, count(*) AS w, avg(value) AS ma,
         |    max(metric_date) AS last_date, arg_max(value, metric_date) AS last_val
         |  FROM srt GROUP BY 1,2
         |),
         |resid AS (
         |  SELECT t.source_id, t.metric,
         |    CASE WHEN first(st.w) > 1
         |         THEN sqrt(greatest(sum((t.value - st.ma)*(t.value - st.ma)) / greatest(first(st.w) - 1, 1), 1e-12))
         |         ELSE 0.0 END AS sd
         |  FROM srt t JOIN stats st ON st.source_id = t.source_id AND st.metric = t.metric
         |  GROUP BY 1,2
         |),
         |nall AS (SELECT source_id, metric, count(*) AS n FROM md GROUP BY 1,2),
         |fc AS (
         |  SELECT s.source_id, s.metric,
         |    CAST(s.last_date + i.i * INTERVAL 1 DAY AS DATE) AS target_date,
         |    CASE WHEN na.n < 7 THEN s.last_val ELSE s.ma END AS yhat,
         |    CASE WHEN na.n < 7 THEN s.last_val ELSE s.ma - 1.645 * r.sd END AS yhat_lower,
         |    CASE WHEN na.n < 7 THEN s.last_val ELSE s.ma + 1.645 * r.sd END AS yhat_upper,
         |    CASE WHEN na.n < 7 THEN 'naive_hold_last' ELSE 'moving_average' END AS method
         |  FROM stats s
         |  JOIN resid r ON r.source_id = s.source_id AND r.metric = s.metric
         |  JOIN nall na ON na.source_id = s.source_id AND na.metric = s.metric
         |  CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS i) AS i
         |)
         |SELECT source_id, metric, target_date,
         |  round(yhat, 6) AS yhat, round(yhat_lower, 6) AS yhat_lower,
         |  round(yhat_upper, 6) AS yhat_upper, method
         |FROM fc ORDER BY 1,2,3""".stripMargin,
    "q74_seasonal_naive" ->
      s"""WITH ${OracleCte.series},
         |per AS (
         |  SELECT source_id, metric, count(*) AS n, max(metric_date) AS last_date,
         |         arg_max(value, metric_date) AS last_val
         |  FROM series GROUP BY 1,2
         |),
         |resid AS (
         |  SELECT source_id, metric, count(*) AS nr,
         |    CAST(sum(CAST(floor(r*r*1e6) AS BIGINT)) AS DOUBLE) / 1e6 / greatest(count(*) - 1, 1) AS var
         |  FROM (
         |    SELECT source_id, metric,
         |      value - lag(value, 7) OVER (PARTITION BY source_id, metric ORDER BY metric_date ASC) AS r
         |    FROM series
         |  ) WHERE r IS NOT NULL GROUP BY 1,2
         |),
         |sdt AS (
         |  SELECT source_id, metric,
         |    CASE WHEN nr > 1 THEN sqrt(greatest(var, 1e-12)) ELSE 0.0 END AS sd
         |  FROM resid
         |),
         |tl AS (
         |  SELECT source_id, metric, value AS season_val,
         |    row_number() OVER (PARTITION BY source_id, metric ORDER BY metric_date DESC) AS rd_src
         |  FROM series QUALIFY rd_src <= 7
         |),
         |stepped AS (
         |  SELECT p.source_id, p.metric, p.n, p.last_date, p.last_val,
         |    coalesce(s.sd, 0.0) AS sd, i.i AS step, 7 - (i.i - 1) % 7 AS rd_src
         |  FROM per p
         |  LEFT JOIN sdt s ON s.source_id = p.source_id AND s.metric = p.metric
         |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS i) AS i
         |),
         |fc AS (
         |  SELECT st.source_id, st.metric,
         |    CAST(st.last_date + st.step * INTERVAL 1 DAY AS DATE) AS target_date,
         |    CASE WHEN st.n < 7 THEN st.last_val ELSE t.season_val END AS yhat,
         |    CASE WHEN st.n < 7 THEN st.last_val ELSE t.season_val - 1.645 * st.sd END AS yhat_lower,
         |    CASE WHEN st.n < 7 THEN st.last_val ELSE t.season_val + 1.645 * st.sd END AS yhat_upper,
         |    CASE WHEN st.n < 7 THEN 'naive_hold_last' ELSE 'seasonal_naive' END AS method
         |  FROM stepped st
         |  LEFT JOIN tl t ON t.source_id = st.source_id AND t.metric = st.metric
         |    AND t.rd_src = st.rd_src
         |)
         |SELECT source_id, metric, target_date,
         |  round(yhat, 6) AS yhat, round(yhat_lower, 6) AS yhat_lower,
         |  round(yhat_upper, 6) AS yhat_upper, method
         |FROM fc ORDER BY 1,2,3""".stripMargin,
    "q23_forecast_contract" ->
      s"""WITH ${OracleCte.series},
         |${holdLastSql(5)},
         |norm AS (
         |  SELECT source_id, metric, target_date,
         |    yhat,
         |    least(least(yhat_lower, yhat_upper), yhat) AS lo,
         |    greatest(greatest(yhat_lower, yhat_upper), yhat) AS hi,
         |    strftime(target_date, '%Y-%m-%d') AS date
         |  FROM fc
         |),
         |pads AS (
         |  SELECT p.source_id, p.metric,
         |    CAST(p.last_date + (5 + i.i) * INTERVAL 1 DAY AS DATE) AS target_date,
         |    0.0 AS yhat, 0.0 AS lo, 0.0 AS hi, CAST(NULL AS VARCHAR) AS date
         |  FROM per p CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS i) AS i
         |)
         |SELECT source_id, metric,
         |  strftime(target_date, '%Y-%m-%d') || 'T00:00:00Z' AS metric_date,
         |  round(yhat,6) AS yhat, round(lo,6) AS yhat_lower, round(hi,6) AS yhat_upper, date
         |FROM (SELECT * FROM norm UNION ALL SELECT * FROM pads)
         |ORDER BY 1,2,3""".stripMargin
  )
}
