package graft.queries

import graft.anomaly.{AnomalyService, IsolationForest}
import graft.core.Tables
import graft.forecast.ArimaLite
import graft.operators.DailyKpi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-fit queries that are NOT ANSI-SQL-expressible (no oracle entries —
  * the driver records rows-only checks): per-series ARIMA(1,1,1) forecasts
  * and isolation-forest scores, both deterministic and distributed via
  * `flatMapGroups`.
  */
object ModelQueries {
  type Q = (SparkSession, String) => DataFrame

  private def md(s: SparkSession, d: String): DataFrame =
    DailyKpi.aggregate(Tables.cleanEvents(s, d))

  val defs: Map[String, Q] = Map(
    // M1: ARIMA(1,1,1) CSS fit per series, 7-day horizon with normal bands.
    "q43_arima_forecast" -> ((s, d) => {
      import s.implicits._
      val series = md(s, d)
        .select(col("source_id").cast("long"), col("metric"), col("metric_date"),
          col("value_sum").cast("double"))
        .as[(Long, String, java.sql.Date, Double)]
      series.groupByKey(r => (r._1, r._2))
        .flatMapGroups { (k: (Long, String), it: Iterator[(Long, String, java.sql.Date, Double)]) =>
          val rows = it.toArray.sortBy(_._3.getTime)
          val fc = ArimaLite.forecast(rows.map(_._4), 7)
          val last = rows.last._3.toLocalDate
          fc.iterator.zipWithIndex.map { case (p, i) =>
            (k._1, k._2, java.sql.Date.valueOf(last.plusDays(i + 1)), p.yhat, p.lo, p.hi)
          }
        }
        .toDF("source_id", "metric", "target_date", "yhat", "yhat_lower", "yhat_upper")
        .orderBy("source_id", "metric", "target_date")
    }),

    // Seasonal ARIMA-lite (1,1,1)(0,1,-,7): the reference's seasonal router
    // intent (schemas/forecast.py:36-60), deterministic JVM fit.
    "q78_sarima_forecast" -> ((s, d) => {
      import s.implicits._
      val series = md(s, d)
        .select(col("source_id").cast("long"), col("metric"), col("metric_date"),
          col("value_sum").cast("double"))
        .as[(Long, String, java.sql.Date, Double)]
      series.groupByKey(r => (r._1, r._2))
        .flatMapGroups { (k: (Long, String), it: Iterator[(Long, String, java.sql.Date, Double)]) =>
          val rows = it.toArray.sortBy(_._3.getTime)
          val fc = ArimaLite.seasonalForecast(rows.map(_._4), 7, period = 7)
          val last = rows.last._3.toLocalDate
          fc.iterator.zipWithIndex.map { case (p, i) =>
            (k._1, k._2, java.sql.Date.valueOf(last.plusDays(i + 1)), p.yhat, p.lo, p.hi)
          }
        }
        .toDF("source_id", "metric", "target_date", "yhat", "yhat_lower", "yhat_upper")
        .orderBy("source_id", "metric", "target_date")
    }),

    // M4: isolation-forest scoring over W3 features, per series, seeded.
    "q44_iforest_scores" -> ((s, d) => {
      val mdValue = md(s, d).select(col("source_id"), col("metric"), col("metric_date"),
        col("value_sum").as("value"))
      AnomalyService.iforestScores(mdValue).toDF()
        .orderBy("source_id", "metric", "metric_date")
    }),

    // Oracle-checkable invariants of the q43 ARIMA fit (the fit itself is
    // not SQL-expressible; these structural + analytic properties are).
    // Per series: the 7-step forecast must keep yhat inside its bands with
    // non-decreasing half-width (psi-weight variance only accumulates), and
    // the analytic anchor — a constant history (built from this series' own
    // mean) differences to an all-zero z, so sigma2 = 0 and the forecast is
    // EXACTLY the constant with zero-width bands — must hold bit-exactly.
    "q91_arima_invariants" -> ((s, d) => {
      import s.implicits._
      val series = md(s, d)
        .select(col("source_id").cast("long"), col("metric"), col("metric_date"),
          col("value_sum").cast("double"))
        .as[(Long, String, java.sql.Date, Double)]
      series.groupByKey(r => (r._1, r._2))
        .mapGroups { (k: (Long, String), it: Iterator[(Long, String, java.sql.Date, Double)]) =>
          val rows = it.toArray.sortBy(_._3.getTime)
          val fc = ArimaLite.forecast(rows.map(_._4), 7)
          val bandViol = fc.count(p => !(p.lo <= p.yhat && p.yhat <= p.hi)).toLong
          val halves = fc.map(p => p.hi - p.yhat)
          val monoViol =
            halves.indices.drop(1).count(i => halves(i) < halves(i - 1) - 1e-9).toLong
          val m = rows.map(_._4).sum / rows.length
          val cfc = ArimaLite.forecast(Array.fill(10)(m), 7)
          val constViol = cfc.count(p => !(p.yhat == m && p.lo == m && p.hi == m)).toLong
          (k._1, k._2, fc.length.toLong, bandViol, monoViol, constViol)
        }
        .toDF("source_id", "metric", "n_h", "band_viol", "mono_viol", "const_viol")
        .orderBy("source_id", "metric")
    }),

    // Oracle-checkable invariants of the q44 isolation forest. Per series:
    // decision scores live in [-0.5, 0.5] (0.5 - anomaly, anomaly in (0,1]),
    // the flagged count equals round(contamination * n) for n >= 5, the
    // small-sample bail (< 5 points) returns exactly (0.5, inlier), and a
    // synthetic spike anchor — a constant base at this series' mean with one
    // large spike — must flag the spike with the strictly minimal score.
    "q92_iforest_invariants" -> ((s, d) => {
      import s.implicits._
      // score directly (q44 minus its presentation sort — the groupBy here
      // re-shuffles anyway, so q44's global orderBy would only add a
      // range-sampling pass that re-runs every fit)
      val mdValue = md(s, d).select(col("source_id"), col("metric"), col("metric_date"),
        col("value_sum").as("value"))
      val perSeries = AnomalyService.iforestScores(mdValue).toDF()
        .groupBy(col("source_id"), col("metric"))
        .agg(
          count(lit(1)).as("n_points"),
          sum(when(col("score") < -0.5 || col("score") > 0.5, 1L).otherwise(0L))
            .as("range_viol"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).as("flagged"),
          sum(when(col("score") =!= 0.5, 1L).otherwise(0L)).as("off_center"))
        .withColumn("flag_viol",
          when(col("n_points") >= 5,
            when(col("flagged") =!= floor(lit(0.05) * col("n_points") + 0.5).cast("long"),
              1L).otherwise(0L))
            .otherwise(when(col("flagged") =!= 0L, 1L).otherwise(0L)))
        .withColumn("small_viol",
          when(col("n_points") < 5 && (col("off_center") > 0L || col("flagged") > 0L), 1L)
            .otherwise(0L))
        .select("source_id", "metric", "n_points", "range_viol", "flag_viol", "small_viol")
      val spike = md(s, d)
        .select(col("source_id").cast("long"), col("metric"), col("value_sum").cast("double"))
        .as[(Long, String, Double)]
        .groupByKey(r => (r._1, r._2))
        .mapGroups { (k: (Long, String), it: Iterator[(Long, String, Double)]) =>
          val vs = it.map(_._3).toArray
          val base = vs.sum / vs.length
          val x = Array.tabulate(30)(i =>
            Array(if (i == 15) base * 10.0 + 100.0 else base))
          val scored = IsolationForest.scoreMatrix(x)
          val minScore = scored.map(_._1).min
          val ok = scored(15)._2 && scored(15)._1 == minScore &&
            scored.zipWithIndex.forall { case ((sc, _), i) => i == 15 || sc > minScore }
          (k._1, k._2, if (ok) 0L else 1L)
        }
        .toDF("source_id", "metric", "spike_viol")
      perSeries.join(spike, Seq("source_id", "metric"))
        .orderBy("source_id", "metric")
    }),

    // Oracle-checkable invariants of the ROUTER-variant isolation forest
    // (routers/anomaly_iforest.py:37-167 — 1-feature X, 200 trees,
    // contamination clamp [0.001, 0.5], NaN mean-fill, < 5-finite bail,
    // rolling-z proxy). Per real series, each anchor re-scores a derived
    // synthetic series through the SAME production entry point
    // (AnomalyService.routerScoreSeries) and counts contract violations:
    //   range/flag/null — default-run scores within [-0.5, 0.5], flagged
    //     count = round(0.05 * n), no null scores past the bail;
    //   clamp — contamination 0.9 and 0.0 must score bit-identically to
    //     their clamped 0.5 / 0.001;
    //   bail — 4 finite + 3 NaN points => every point inlier, score null;
    //   fill — a NaN injected mid-series must score exactly as the series
    //     with that NaN replaced by the NaN-ignoring mean;
    //   proxy — rolling-z fallback: warm-up nulls, sd == 0 => z = 0 and
    //     outlier iff value != mean, spike z >= 3 flags.
    "q94_iforest_router" -> ((s, d) => {
      import s.implicits._
      // proxy anchors are synthetic and series-independent: evaluate the
      // production rolling-z path ONCE here (driver) and carry the verdict
      // into every row, instead of re-running it per series
      val flat = AnomalyService.routerScoreSeries(
        Array.fill(8)(100.0) :+ 150.0, method = "rolling_z")
      val spiky = AnomalyService.routerScoreSeries(
        Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 50.0), method = "rolling_z")
      val proxyOk =
        flat.take(7).forall(p => p.score.isEmpty && !p.isOutlier) &&
        flat(7) == AnomalyService.RouterScore(Some(100.0), isOutlier = false, Some(0.0)) &&
        flat(8).isOutlier && flat(8).score.contains(0.0) &&
        spiky(7).isOutlier && spiky(7).score.exists(_ >= 3.0)
      val proxyViol = if (proxyOk) 0L else 1L
      val series = md(s, d)
        .select(col("source_id").cast("long"), col("metric"), col("metric_date"),
          col("value_sum").cast("double"))
        .as[(Long, String, java.sql.Date, Double)]
      series.groupByKey(r => (r._1, r._2))
        .mapGroups { (k: (Long, String), it: Iterator[(Long, String, java.sql.Date, Double)]) =>
          val vals = it.toArray.sortBy(_._3.getTime).map(_._4)
          val n = vals.length
          // one forest fit serves the default run AND all four clamp
          // anchors: scores are contamination-independent, each level goes
          // through the production clamp + cut (routerScoreSeriesMulti is
          // element-wise equal to routerScoreSeries per AnomalySpec)
          val Seq(dflt, c09, c05, c00, c001) = AnomalyService.routerScoreSeriesMulti(
            vals, Seq(0.05, 0.9, 0.5, 0.0, 0.001))
          val rangeViol = dflt.count(_.score.exists(sc => sc < -0.5 || sc > 0.5)).toLong
          val expFlag = if (n >= 5) math.round(0.05 * n) else 0L
          val flagViol = if (dflt.count(_.isOutlier).toLong == expFlag) 0L else 1L
          val nullViol = (if (n >= 5) dflt.count(_.score.isEmpty)
                          else dflt.count(_.score.isDefined)).toLong
          val clampViol =
            if (n < 5) 0L
            else if (c09.sameElements(c05) && c00.sameElements(c001)) 0L
            else 1L
          val bail = AnomalyService.routerScoreSeries(
            vals.take(4) ++ Array.fill(3)(Double.NaN))
          val bailViol = bail.count(p => p.isOutlier || p.score.isDefined).toLong
          // n = 5 would bail after the NaN injection (4 finite) while the
          // filled twin scores — the anchor needs n - 1 >= 5 finite points
          val fillViol =
            if (n < 6) 0L
            else {
              val nanVals = vals.clone(); nanVals(2) = Double.NaN
              val m = nanVals.filter(v => !v.isNaN)
              val fill = m.sum / m.length
              val filled = nanVals.map(v => if (v.isNaN) fill else v)
              val a = AnomalyService.routerScoreSeries(nanVals)
              val b = AnomalyService.routerScoreSeries(filled)
              a.zip(b).count { case (p, q) =>
                p.score != q.score || p.isOutlier != q.isOutlier }.toLong
            }
          (k._1, k._2, n.toLong, rangeViol, flagViol, nullViol, clampViol,
            bailViol, fillViol, proxyViol)
        }
        .toDF("source_id", "metric", "n_points", "range_viol", "flag_viol", "null_viol",
          "clamp_viol", "bail_viol", "fill_viol", "proxy_viol")
        .orderBy("source_id", "metric")
    }),

    // Oracle-checkable periodicity invariant of the q78 seasonal fit: an
    // exactly weekly-periodic history (this series' per-day-of-week mean,
    // quantized to WHOLE cents so the double seasonal difference is exactly
    // zero in IEEE arithmetic, tiled 4 weeks) must forecast periodically —
    // yhat(k+7) = yhat(k) — continue the tiling (seasonal-naive equivalence)
    // and collapse its bands (sigma2 = 0). Lifts ForecastSpec's periodicity
    // proof into the DuckDB gate.
    "q93_sarima_periodic" -> ((s, d) => {
      import s.implicits._
      val series = md(s, d)
        .select(col("source_id").cast("long"), col("metric"), col("metric_date"),
          col("value_sum").cast("double"))
        .as[(Long, String, java.sql.Date, Double)]
      series.groupByKey(r => (r._1, r._2))
        .mapGroups { (k: (Long, String), it: Iterator[(Long, String, java.sql.Date, Double)]) =>
          val rows = it.toArray
          val byDow = rows.groupBy(r => r._3.toLocalDate.getDayOfWeek.getValue % 7)
          val pattern = Array.tabulate(7) { dow =>
            byDow.get(dow)
              .map(g => math.floor(g.map(_._4).sum / g.length * 100.0 + 0.5))
              .getOrElse(0.0)
          }
          val y = Array.tabulate(28)(i => pattern(i % 7))
          val fc = ArimaLite.seasonalForecast(y, 14, period = 7)
          // whole-cent signals differ by >= 1.0; 1e-6 absorbs the ~1e-10 ulp
          // residue of the (1+phi)y(t-1) - (1+phi)y(t-8) cancellation order
          val periodicViol =
            (0 until 7).count(i => math.abs(fc(i + 7).yhat - fc(i).yhat) > 1e-6).toLong
          val naiveViol =
            (0 until 14).count(i => math.abs(fc(i).yhat - pattern(i % 7)) > 1e-6).toLong
          val bandViol = fc.count(p => !(p.lo == p.yhat && p.hi == p.yhat)).toLong
          (k._1, k._2, fc.length.toLong, periodicViol, naiveViol, bandViol)
        }
        .toDF("source_id", "metric", "n_h", "periodic_viol", "naive_viol", "band_viol")
        .orderBy("source_id", "metric")
    })
  )

  /** Invariant oracles: expected row shape is data-derived (the series list
    * and per-series counts come from the events table); the invariant
    * columns are the asserted-zero violation counts — a wrong-signed phi or
    * broken contamination cut makes the Spark side emit nonzero and the
    * gate's hash compare fails.
    */
  val oracles: Map[String, String] = Map(
    "q91_arima_invariants" ->
      """WITH s AS (SELECT DISTINCT user_id AS source_id, event_type AS metric FROM events)
        |SELECT source_id, metric, 7 AS n_h,
        | 0 AS band_viol, 0 AS mono_viol, 0 AS const_viol
        |FROM s ORDER BY source_id, metric""".stripMargin,
    "q92_iforest_invariants" ->
      """WITH md AS (
        |  SELECT CAST(ts AS DATE) AS d, user_id, event_type FROM events GROUP BY 1,2,3
        |)
        |SELECT user_id AS source_id, event_type AS metric, count(*) AS n_points,
        | 0 AS range_viol, 0 AS flag_viol, 0 AS small_viol, 0 AS spike_viol
        |FROM md GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q93_sarima_periodic" ->
      """WITH s AS (SELECT DISTINCT user_id AS source_id, event_type AS metric FROM events)
        |SELECT source_id, metric, 14 AS n_h,
        | 0 AS periodic_viol, 0 AS naive_viol, 0 AS band_viol
        |FROM s ORDER BY source_id, metric""".stripMargin,
    "q94_iforest_router" ->
      """WITH md AS (
        |  SELECT CAST(ts AS DATE) AS d, user_id, event_type FROM events GROUP BY 1,2,3
        |)
        |SELECT user_id AS source_id, event_type AS metric, count(*) AS n_points,
        | 0 AS range_viol, 0 AS flag_viol, 0 AS null_viol, 0 AS clamp_viol,
        | 0 AS bail_viol, 0 AS fill_viol, 0 AS proxy_viol
        |FROM md GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
