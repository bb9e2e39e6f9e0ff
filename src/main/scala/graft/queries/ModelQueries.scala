package graft.queries

import graft.anomaly.AnomalyService
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
    })
  )
}
