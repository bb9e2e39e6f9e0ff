package graft.forecast

import graft.operators.{DailyKpi, Windows}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecasting chain (SURVEY.md §2.5) — the deterministic parts of the
  * reference's forecaster, re-expressed as whole-DataFrame transforms so ALL
  * series are produced in one distributed plan instead of the reference's
  * per-series Python loop.
  *
  * The SARIMAX fit itself (`backend/app/services/forecast.py:68-92`) is not
  * numerically reproducible on the JVM; the reference degrades to a
  * deterministic fallback chain whenever statsmodels is unavailable, the
  * series is short, or the fit throws (`forecast.py:46-66,113-125,175-197`) —
  * that chain is implemented exactly here and is the correctness-testable
  * surface. An ARIMA(1,1,1) CSS fit lives in [[ArimaLite]] for trend quality.
  */
object Forecast {

  /** Series builder (`forecast.py:22-37`): metric_daily -> per-series daily
    * values with the falsy-0.0 fallback chain, gap-filled to calendar days.
    */
  def fetchSeries(metricDaily: DataFrame, keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val withValue = metricDaily.withColumn("value",
      DailyKpi.valueFallback(Seq(col("value_sum"), col("value_avg"), col("value_count").cast("double"))))
    Windows.gapFillDaily(withValue.select((keys.map(col) :+ col("metric_date") :+ col("value")): _*), keys)
  }

  /** M2 — deterministic forecast chain for horizon `h`, per series:
    *   - all-zero series        => zeros, bounds zero         (forecast.py:46-52)
    *   - n < minPoints (14)     => hold-last, bounds = yhat   (forecast.py:113-125)
    *   - else (SARIMAX absent)  => hold-last, bounds zero     (forecast.py:56-66)
    * Target dates are strictly future: last observed day + 1..h
    * (forecast.py:54,79).
    */
  def holdLastForecast(series: DataFrame, horizon: Int, minPoints: Int = 14,
                       keys: Seq[String] = Seq("source_id", "metric"),
                       modelVersion: String = "sarimax-0.1"): DataFrame = {
    val k = keys.map(col)
    val per = series.groupBy(k: _*).agg(
      count(lit(1)).as("n"),
      sum(col("value")).as("total"),
      max_by(col("value"), col("metric_date")).as("last_val"),
      max(col("metric_date")).as("last_date"))
    val stepped = per.select(k ++ Seq(col("n"), col("total"), col("last_val"), col("last_date"),
      explode(sequence(lit(1), lit(horizon))).as("step")): _*)
    stepped.select(k ++ Seq(
      date_add(col("last_date"), col("step")).as("target_date"),
      when(col("total") === 0.0, 0.0).otherwise(col("last_val")).as("yhat"),
      when(col("total") === 0.0, 0.0)
        .when(col("n") < minPoints, col("last_val")).otherwise(0.0).as("yhat_lower"),
      when(col("total") === 0.0, 0.0)
        .when(col("n") < minPoints, col("last_val")).otherwise(0.0).as("yhat_upper"),
      lit(modelVersion).as("model_version")): _*)
  }

  /** M3 — moving-average fallback forecaster with residual-sd bands
    * (the unmounted seasonal router, `backend/app/schemas/forecast.py:122-143`):
    * window = min(14, n); yhat = mean of the last window values; CI = z * sd
    * of residuals vs the MA (sample variance, floor 1e-12), z from the fixed
    * table; series with n < 7 flatline at the last value
    * (`schemas/forecast.py:81-97`, method "naive_hold_last").
    */
  val zTable: Map[Int, Double] = Map(50 -> 0.0, 68 -> 1.0, 80 -> 1.282, 85 -> 1.440,
    90 -> 1.645, 95 -> 1.960, 97 -> 2.170, 98 -> 2.326, 99 -> 2.576)

  def maForecast(series: DataFrame, horizon: Int, ci: Int = 90,
                 keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val z = zTable.getOrElse(ci, 1.645)
    val k = keys.map(col)
    val wDesc = Window.partitionBy(k: _*).orderBy(col("metric_date").desc)
    val tail14 = series.withColumn("__rd", row_number().over(wDesc)).filter(col("__rd") <= 14)
    val stats = tail14.groupBy(k: _*).agg(
      count(lit(1)).as("w"),
      avg(col("value")).as("ma"),
      max(col("metric_date")).as("last_date"),
      max_by(col("value"), col("metric_date")).as("last_val"))
    val resid = tail14.join(stats, keys)
      .groupBy(k: _*).agg(
        (sum(pow(col("value") - col("ma"), 2)) /
          greatest(first(col("w")) - 1, lit(1L))).as("var"),
        first(col("w")).as("w2"))
      .withColumn("sd", when(col("w2") > 1, sqrt(greatest(col("var"), lit(1e-12)))).otherwise(0.0))
      .select((k :+ col("sd")): _*)
    val nAll = series.groupBy(k: _*).agg(count(lit(1)).as("n"))
    val per = stats.join(resid, keys).join(nAll, keys)
    per.select(k ++ Seq(col("n"), col("ma"), col("sd"), col("last_date"), col("last_val"),
        explode(sequence(lit(1), lit(horizon))).as("step")): _*)
      .select(k ++ Seq(
        date_add(col("last_date"), col("step")).as("target_date"),
        when(col("n") < 7, col("last_val")).otherwise(col("ma")).as("yhat"),
        when(col("n") < 7, col("last_val")).otherwise(col("ma") - lit(z) * col("sd")).as("yhat_lower"),
        when(col("n") < 7, col("last_val")).otherwise(col("ma") + lit(z) * col("sd")).as("yhat_upper"),
        when(col("n") < 7, lit("naive_hold_last")).otherwise(lit("moving_average")).as("method")): _*)
  }

  /** Weekly seasonal-naive forecaster — the deterministic counterpart of the
    * reference's unmounted seasonal router (`backend/app/schemas/forecast.py:36-60`,
    * SARIMAX (1,1,1)(0,1,1,7)): a weekday-shaped series forecasts weekday-shaped.
    *
    * yhat(T + h) = value(T + h - period*ceil(h/period)) — the most recent
    * observation with the same phase; over a gap-filled daily series this is
    * the tail row at rd = period - (h-1) % period (rd = 1 is the last day).
    * CI = z * sd of the one-season-lag residuals value(t) - value(t-period)
    * (sample variance, floor 1e-12 — the [[maForecast]] convention); the
    * residual squares are summed as decimals so shuffle order cannot perturb
    * the band. Series with n < period flatline at the last value
    * ("naive_hold_last", same fallback contract as [[maForecast]]).
    *
    * One aggregation + one window rank + two thin joins; every series is
    * forecast in a single distributed plan, no per-series loop.
    */
  def seasonalNaiveForecast(series0: DataFrame, horizon: Int, period: Int = 7, ci: Int = 90,
                            keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val z = zTable.getOrElse(ci, 1.645)
    val k = keys.map(col)
    // the series feeds THREE branches (per-series aggregates, lag residuals,
    // tail rows); materialize once so each branch doesn't re-run the whole
    // upstream (events scan -> daily agg -> gap-fill) — same measured
    // pattern as [[backtest]]/[[reliability]]
    val series = series0.localCheckpoint(true)
    val wDesc = Window.partitionBy(k: _*).orderBy(col("metric_date").desc)
    val wAsc = Window.partitionBy(k: _*).orderBy(col("metric_date").asc)
    val per = series.groupBy(k: _*).agg(
      count(lit(1)).as("n"),
      max(col("metric_date")).as("last_date"),
      max_by(col("value"), col("metric_date")).as("last_val"))
    val resid = series.withColumn("__lag", lag(col("value"), period).over(wAsc))
      .filter(col("__lag").isNotNull)
      .withColumn("__r", col("value") - col("__lag"))
      .groupBy(k: _*).agg(
        count(lit(1)).as("nr"),
        (sum(floor(col("__r") * col("__r") * 1e6).cast("decimal(38,0)")).cast("double") / 1e6 /
          greatest(count(lit(1)) - 1, lit(1L))).as("__var"))
      .withColumn("sd", when(col("nr") > 1, sqrt(greatest(col("__var"), lit(1e-12)))).otherwise(0.0))
      .select((k :+ col("sd")): _*)
    val tail = series.withColumn("rd_src", row_number().over(wDesc))
      .filter(col("rd_src") <= period)
      .select(k ++ Seq(col("rd_src"), col("value").as("season_val")): _*)
    val stepped = per.join(resid, keys, "left")
      .withColumn("sd", coalesce(col("sd"), lit(0.0)))
      .select(k ++ Seq(col("n"), col("last_date"), col("last_val"), col("sd"),
        explode(sequence(lit(1), lit(horizon))).as("step")): _*)
      .withColumn("rd_src", lit(period) - (col("step") - 1) % period)
    stepped.join(tail, keys :+ "rd_src", "left")
      .select(k ++ Seq(
        date_add(col("last_date"), col("step")).as("target_date"),
        when(col("n") < period, col("last_val")).otherwise(col("season_val")).as("yhat"),
        when(col("n") < period, col("last_val"))
          .otherwise(col("season_val") - lit(z) * col("sd")).as("yhat_lower"),
        when(col("n") < period, col("last_val"))
          .otherwise(col("season_val") + lit(z) * col("sd")).as("yhat_upper"),
        when(col("n") < period, lit("naive_hold_last")).otherwise(lit("seasonal_naive")).as("method")): _*)
  }

  // ---- M5: error metrics (forecast.py:134-156) as aggregate columns over
  //      (actual, pred) pairs. Two epsilon conventions exist in the
  //      reference; both are kept (see reliabilityFolds for the 1e-9 one).
  /** Order-independent mean: terms summed as DECIMAL(38,18) so partial-agg /
    * shuffle order can't perturb the result. MAPE terms over gap-filled
    * series reach ~1e8 (eps denominators on filled zeros), where plain double
    * summation is order-sensitive at the 1e-6 level.
    */
  private[graft] def stableAvg(term: Column): Column =
    sum(floor(term * 1e8).cast("decimal(38,0)")).cast("double") / 1e8 / count(term)

  /** Coarser 1e-6 variant for the reliability path, whose eps=1e-9
    * denominators produce terms up to ~5e12 — 1e8 scaling would overflow the
    * per-term int64 floor there.
    */
  private[graft] def stableAvg6(term: Column): Column =
    sum(floor(term * 1e6).cast("decimal(38,0)")).cast("double") / 1e6 / count(term)

  def mae(a: Column, p: Column): Column = avg(abs(a - p))
  def rmse(a: Column, p: Column): Column = sqrt(avg(pow(a - p, 2)))
  /** MAPE with denom = max(|actual|, eps) (forecast.py:134-139). */
  def mape(a: Column, p: Column, eps: Double = 1e-6): Column =
    stableAvg(abs(a - p) / greatest(abs(a), lit(eps))) * 100.0
  /** sMAPE with 0-denominator -> 1.0 (forecast.py:152-156). */
  def smape(a: Column, p: Column): Column =
    avg(abs(a - p) / when(abs(a) + abs(p) === 0.0, 1.0).otherwise(abs(a) + abs(p))) * 100.0
  def bias(a: Column, p: Column): Column = avg(p - a)

  /** M6 — rolling-origin backtest with the naive (statsmodels-absent)
    * predictor (`forecast.py:210-254`): series = gap-filled tail of
    * window_n + folds*horizon points; fold t trains on all but the last
    * (t+1)*horizon points and predicts the next block with the last train
    * value; fold valid while train >= 8 and test is a full block;
    * score = clamp(100 - (avg_mape+avg_smape)/2, 0, 100).
    *
    * Pure relational: every series is backtested in one plan (the reference
    * loops fold-by-fold in the driver).
    */
  def backtest(metricDaily: DataFrame, folds: Int = 5, horizon: Int = 7, windowN: Int = 90,
               keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val k = keys.map(col)
    val need = windowN + folds * horizon
    val full = fetchSeries(metricDaily, keys)
    // tail(need) then re-rank chronologically
    val wDesc = Window.partitionBy(k: _*).orderBy(col("metric_date").desc)
    val wAsc = Window.partitionBy(k: _*).orderBy(col("metric_date").asc)
    // the tailed series feeds THREE plan branches (fold table + two joins);
    // without materialization each branch re-runs the whole upstream
    // (events scan -> daily aggregation -> windows). The tail is tiny
    // (series x <=need rows), so one eager local checkpoint beats three
    // upstream recomputes — measured 3.0s -> ~1.6s at sf0.1.
    val tailed = full.withColumn("rd", row_number().over(wDesc)).filter(col("rd") <= need)
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(k: _*)))
      .localCheckpoint(true)
    // fold table: one row per (series, t) with train_len = m - (t+1)*h
    val foldTbl = tailed.select(k :+ col("m"): _*).distinct()
      .select(k ++ Seq(col("m"), explode(sequence(lit(0), lit(folds - 1))).as("t")): _*)
      .withColumn("train_len", col("m") - (col("t") + 1) * horizon)
      .filter(col("train_len") >= 8) // break rule: train>=8 and full test block
    // the naive forecast for fold t = value at rn == train_len
    val lastVals = foldTbl.join(tailed.select(k ++ Seq(col("rn"), col("value").as("yhat")): _*),
      keys, "inner").filter(col("rn") === col("train_len")).drop("rn")
    // test rows: rn in (train_len, train_len + h]
    val testRows = lastVals.join(
      tailed.select(k ++ Seq(col("rn"), col("value").as("actual")): _*), keys, "inner")
      .filter(col("rn") > col("train_len") && col("rn") <= col("train_len") + horizon)
    val foldStats = testRows.groupBy(k :+ col("t"): _*).agg(
      mae(col("actual"), col("yhat")).as("mae"),
      rmse(col("actual"), col("yhat")).as("rmse"),
      mape(col("actual"), col("yhat")).as("mape"),
      smape(col("actual"), col("yhat")).as("smape"))
    foldStats.groupBy(k: _*).agg(
      count(lit(1)).as("folds"),
      avg(col("mae")).as("avg_mae"),
      avg(col("rmse")).as("avg_rmse"),
      stableAvg(col("mape")).as("avg_mape"),
      avg(col("smape")).as("avg_smape"))
      .withColumn("score",
        greatest(lit(0.0), least(lit(100.0), lit(100.0) - (col("avg_mape") + col("avg_smape")) / 2.0)))
  }

  /** M7 — persisted reliability scorer
    * (`backend/app/services/forecast_reliability.py:57-158`): last `days`
    * value_sum points (NOT gap-filled, NOT fallback-chained), folds clamped
    * to n-(horizon+1), naive last-train-value predictor, eps=1e-9 metric
    * variants (smape doubled numerator), instability=(max_mape-min_mape)/10,
    * score = int(clamp(100 - mape_agg/2 - instability, 0, 100)).
    */
  def reliability(metricDaily: DataFrame, days: Int = 90, folds: Int = 5, horizon: Int = 7,
                  keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val k = keys.map(col)
    val h = math.max(1, horizon)
    val wDesc = Window.partitionBy(k: _*).orderBy(col("metric_date").desc)
    val wAsc = Window.partitionBy(k: _*).orderBy(col("metric_date").asc)
    // same multi-branch reuse as [[backtest]] — materialize the small tail
    val series = metricDaily
      .select(k ++ Seq(col("metric_date"), col("value_sum").cast("double").as("y")): _*)
      .withColumn("rd", row_number().over(wDesc)).filter(col("rd") <= days)
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(k: _*)))
      .localCheckpoint(true)
    val foldTbl = series.select(k :+ col("n"): _*).distinct()
      .withColumn("eff_folds", least(lit(folds), greatest(col("n") - (h + 1), lit(0))))
      .select(k ++ Seq(col("n"), col("eff_folds"), explode(sequence(lit(0), lit(folds - 1))).as("kf")): _*)
      .filter(col("kf") < col("eff_folds"))
      .withColumn("train_end", col("n") - (col("eff_folds") - col("kf")) * h)
      .filter(col("train_end") >= 1) // "if not train: continue"
    val lastVals = foldTbl.join(series.select(k ++ Seq(col("rn"), col("y").as("yhat")): _*), keys)
      .filter(col("rn") === col("train_end")).drop("rn")
    val testRows = lastVals.join(series.select(k ++ Seq(col("rn"), col("y").as("a")): _*), keys)
      .filter(col("rn") > col("train_end") && col("rn") <= col("train_end") + h)
    val foldStats = testRows.groupBy(k :+ col("kf"): _*).agg(
      avg(abs(col("a") - col("yhat"))).as("mae"),
      sqrt(avg(pow(col("a") - col("yhat"), 2))).as("rmse"),
      (stableAvg6(abs(col("a") - col("yhat")) / (abs(col("a")) + 1e-9)) * 100.0).as("mape"),
      (avg(lit(2.0) * abs(col("a") - col("yhat")) / (abs(col("a")) + abs(col("yhat")) + 1e-9)) * 100.0).as("smape"),
      avg(col("yhat") - col("a")).as("bias"))
    foldStats.groupBy(k: _*).agg(
      count(lit(1)).as("folds"),
      stableAvg6(col("mape")).as("mape_agg"),
      avg(col("rmse")).as("rmse_agg"),
      avg(col("smape")).as("smape_agg"),
      max(col("mape")).as("max_mape"),
      min(col("mape")).as("min_mape"))
      .withColumn("instability",
        when(col("folds") >= 2, (col("max_mape") - col("min_mape")) / 10.0).otherwise(0.0))
      .withColumn("score",
        floor(greatest(lit(0.0), least(lit(100.0),
          lit(100.0) - col("mape_agg") / 2.0 - col("instability")))).cast("int"))
      .drop("max_mape", "min_mape")
  }

  /** M8+M9 — forecast contract normalizer
    * (`backend/app/routers/forecast.py:109-154`): order bounds (swap), widen
    * to include yhat, non-finite -> 0, sort ascending, trim to 7 rows, pad
    * with zero rows continuing the date sequence; `metric_date` as UTC
    * midnight `...T00:00:00Z`; legacy `date` only on non-padded rows.
    */
  def normalizeContract(forecast: DataFrame, keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val k = keys.map(col)
    def fin(c: Column): Column =
      when(c.isNull || c.isNaN || abs(c) === Double.PositiveInfinity, 0.0).otherwise(c)
    val y = fin(col("yhat")); val lo0 = fin(col("yhat_lower")); val hi0 = fin(col("yhat_upper"))
    val lo1 = least(lo0, hi0); val hi1 = greatest(lo0, hi0)
    val ordered = forecast
      .withColumn("__y", y)
      .withColumn("__lo", least(lo1, y))
      .withColumn("__hi", greatest(hi1, y))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(k: _*).orderBy(col("target_date").asc)))
      .filter(col("__rn") <= 7)
    val counted = ordered.withColumn("__cnt", count(lit(1)).over(Window.partitionBy(k: _*)))
    val kept = counted.select(k ++ Seq(col("target_date"), col("__y").as("yhat"),
      col("__lo").as("yhat_lower"), col("__hi").as("yhat_upper"),
      date_format(col("target_date"), "yyyy-MM-dd").as("date")): _*)
    val pads = counted.filter(col("__rn") === col("__cnt") && col("__cnt") < 7)
      .select(k ++ Seq(col("target_date").as("__last"), col("__cnt")): _*)
      .select(k ++ Seq(explode(sequence(lit(1), (lit(7) - col("__cnt")).cast("int"))).as("__i"), col("__last")): _*)
      .select(k ++ Seq(date_add(col("__last"), col("__i").cast("int")).as("target_date"),
        lit(0.0).as("yhat"), lit(0.0).as("yhat_lower"), lit(0.0).as("yhat_upper"),
        lit(null).cast("string").as("date")): _*)
    kept.unionByName(pads)
      .withColumn("metric_date",
        concat(date_format(col("target_date"), "yyyy-MM-dd"), lit("T00:00:00Z")))
  }

  /** M9 — strictly-future filter (`routers/forecast.py:193-201`): keep rows
    * with target_date after the per-series last observed date, cap at 7.
    */
  def strictlyFuture(forecast: DataFrame, metricDaily: DataFrame,
                     keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val lastObs = metricDaily.groupBy(keys.map(col): _*).agg(max(col("metric_date")).as("__last_obs"))
    forecast.join(lastObs, keys, "left")
      .filter(col("__last_obs").isNull || col("target_date") > col("__last_obs"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("target_date").asc)))
      .filter(col("__rn") <= 7)
      .drop("__rn", "__last_obs")
  }
}
