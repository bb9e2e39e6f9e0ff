package graft.forecast

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential-smoothing family — EWMA, Holt linear trend, and additive
  * Holt-Winters (the weekly-seasonal quality path the reference's unmounted
  * SARIMAX router gestures at, `backend/app/schemas/forecast.py:36-60`).
  *
  * All three are per-series left folds over the chronological value list,
  * computed with the SQL higher-order `aggregate` over a sorted
  * `collect_list` — one shuffle per series key, no driver loop, and the fold
  * stays inside whole-stage codegen. The recursions use only IEEE `*`/`+`/`-`
  * (no `pow`, no libm), so a DuckDB recursive CTE replaying the same
  * operation tree produces bit-identical doubles — which is what makes these
  * the only exactly-oracle-checkable exponential smoothers (a closed-form
  * `pow((1-a), k)` drifts by ulps across engines).
  *
  * Scale note: state per series is O(series length) inside one array column;
  * a daily series is a few thousand elements even over a decade, far under
  * any array limit. Series count is the parallelism axis — each series folds
  * independently wherever its group lands, so the operator scales with
  * executors, not with total rows in one task.
  */
object Smoothing {

  private def packSeries(series: DataFrame, keys: Seq[String]): DataFrame =
    series.groupBy(keys.map(col): _*).agg(
      array_sort(collect_list(struct(col("metric_date"), col("value")))).as("pts"),
      max(col("metric_date")).as("last_date"),
      count(lit(1)).as("n"))

  /** EWMA smoothing: s_1 = x_1; s_t = a*x_t + (1-a)*s_{t-1}. Emits every
    * input row with its smoothed value. `alpha` should be exactly
    * representable (dyadic, e.g. 0.25) so `1-alpha` is exact too; the
    * returned values are then reproducible to the bit on any engine that
    * replays the same fold.
    */
  def ewma(series: DataFrame, alpha: Double = 0.25,
           keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val k = keys.map(col)
    val oma = 1.0 - alpha
    val sm = packSeries(series, keys).withColumn("sm",
      aggregate(col("pts"), lit(Array.empty[Double]),
        (acc, x) => concat(acc, array(
          when(size(acc) === 0, x("value"))
            .otherwise(lit(alpha) * x("value") + lit(oma) * element_at(acc, -1))))))
    sm.select(k :+ explode(zip_with(col("pts"), col("sm"),
        (p, e) => struct(p("metric_date").as("metric_date"),
          p("value").as("value"), e.as("ewma")))).as("z"): _*)
      .select(k ++ Seq(col("z.metric_date").as("metric_date"),
        col("z.value").as("value"), col("z.ewma").as("ewma")): _*)
  }

  /** Holt linear-trend forecast. State (level, trend), seeded l_1 = x_1,
    * b_1 = 0; for t > 1:
    *   l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
    *   b_t = β*(l_t - l_{t-1}) + (1-β)*b_{t-1}
    * Forecast yhat(T+h) = l_T + h*b_T. A 1-point series degrades to
    * hold-last (b stays 0).
    */
  def holtForecast(series: DataFrame, horizon: Int, alpha: Double = 0.5, beta: Double = 0.25,
                   keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val k = keys.map(col)
    val oma = 1.0 - alpha; val omb = 1.0 - beta
    val init = struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0).as("n"))
    val st = packSeries(series, keys).withColumn("st",
      aggregate(col("pts"), init, (acc, x) => {
        val newL = lit(alpha) * x("value") + lit(oma) * (acc("l") + acc("b"))
        val newB = lit(beta) * (newL - acc("l")) + lit(omb) * acc("b")
        when(acc("n") === 0,
          struct(x("value").as("l"), lit(0.0).as("b"), lit(1).as("n")))
          .otherwise(struct(newL.as("l"), newB.as("b"), (acc("n") + 1).as("n")))
      }))
    st.select(k ++ Seq(col("last_date"), col("st.l").as("l"), col("st.b").as("b"),
        explode(sequence(lit(1), lit(horizon))).as("step")): _*)
      .select(k ++ Seq(
        date_add(col("last_date"), col("step")).as("target_date"),
        (col("l") + col("step") * col("b")).as("yhat"),
        lit("holt_linear").as("method")): _*)
  }

  /** Additive Holt-Winters with a first-cycle-mean seasonal seed.
    * Seed phase (first `period` points): the state accumulates the running
    * first-cycle sum in `l` and the raw values in `seas`, with b = 0. On the
    * first post-seed point the state is converted — m = sum/period,
    * l = m, s_j = x_j − m — and from then on, with sOld = s_{t-period}:
    *   l_t = a*(x_t - sOld) + (1-a)*(l_{t-1} + b_{t-1})
    *   b_t = β*(l_t - l_{t-1}) + (1-β)*b_{t-1}
    *   s_t = γ*(x_t - l_t)   + (1-γ)*sOld
    * Forecast yhat(T+h) = l_T + h*b_T + s_{phase(T+h)} (most recent seasonal
    * of the same phase). Series of at most one full cycle never leave the
    * seed phase and forecast hold-last ("naive_hold_last", the
    * [[Forecast.maForecast]] fallback contract).
    *
    * The mean seed stays exactly oracle-replayable because the first-cycle
    * sum is accumulated left-to-right inside the fold (fixed order) and the
    * mean is one IEEE division by `period` — a DuckDB recursive CTE replays
    * the identical operation tree. A zero seed (measured first) needed no
    * division but converged too slowly: a purely weekly series still carried
    * a ~2.7 absolute error after nine cycles, while the mean seed makes the
    * same series' state exactly stationary from the first post-seed point.
    */
  def holtWintersForecast(series: DataFrame, horizon: Int, period: Int = 7,
                          alpha: Double = 0.5, beta: Double = 0.25, gamma: Double = 0.25,
                          keys: Seq[String] = Seq("source_id", "metric")): DataFrame = {
    val k = keys.map(col)
    val oma = 1.0 - alpha; val omb = 1.0 - beta; val omg = 1.0 - gamma
    val init = struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0).as("n"),
      lit(Array.empty[Double]).as("seas"))
    val st = packSeries(series, keys).withColumn("st",
      aggregate(col("pts"), init, (acc, x) => {
        // convert the seed state (running sum + raw values) exactly once, on
        // the first post-seed point
        val mean = acc("l") / period
        val lPrev = when(acc("n") === period, mean).otherwise(acc("l"))
        val seasPrev = when(acc("n") === period,
          transform(acc("seas"), v => v - mean)).otherwise(acc("seas"))
        val sOld = element_at(seasPrev, 1)
        val newL = lit(alpha) * (x("value") - sOld) + lit(oma) * (lPrev + acc("b"))
        val newB = lit(beta) * (newL - lPrev) + lit(omb) * acc("b")
        val newS = lit(gamma) * (x("value") - newL) + lit(omg) * sOld
        when(acc("n") < period,
          struct((acc("l") + x("value")).as("l"), lit(0.0).as("b"), (acc("n") + 1).as("n"),
            concat(acc("seas"), array(x("value"))).as("seas")))
          .otherwise(struct(newL.as("l"), newB.as("b"), (acc("n") + 1).as("n"),
            concat(slice(seasPrev, 2, period - 1), array(newS)).as("seas")))
      }))
    st.select(k ++ Seq(col("last_date"), col("n"),
        col("st.l").as("l"), col("st.b").as("b"), col("st.seas").as("seas"),
        element_at(col("pts"), -1)("value").as("last_val"),
        explode(sequence(lit(1), lit(horizon))).as("step")): _*)
      .select(k ++ Seq(
        date_add(col("last_date"), col("step")).as("target_date"),
        // length == period also never leaves the seed phase (the fold seeds
        // while acc.n < period, i.e. through the period-th element), so its
        // state still holds (sum, raw values) — forecast hold-last instead
        when(col("n") <= period, col("last_val"))
          .otherwise(col("l") + col("step") * col("b") +
            element_at(col("seas"), ((col("step") - 1) % period + 1).cast("int")))
          .as("yhat"),
        when(col("n") <= period, lit("naive_hold_last"))
          .otherwise(lit("holt_winters")).as("method")): _*)
  }
}
