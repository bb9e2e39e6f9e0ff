package graft.anomaly

import graft.operators.Windows
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-series isolation-forest scoring, distributed with
  * `groupByKey(...).flatMapGroups` — the Scala analogue of the reference's
  * per-series sklearn loop (`backend/app/services/anomaly_iforest.py:25-47`),
  * but all series score in parallel across executors.
  */
object AnomalyService {

  case class FeatRow(source_id: Long, metric: String, metric_date: java.sql.Date,
                     value: Double, roll_mean: Double, roll_std: Double, diff1: Double)
  case class Scored(source_id: Long, metric: String, metric_date: java.sql.Date,
                    value: Double, score: Double, is_outlier: Boolean)

  /** metric_daily(value) -> per-point iforest score + outlier flag.
    * Feature matrix per series = [value, roll_mean(7), roll_std(7), diff1]
    * (W3); contamination and tree count follow the reference service
    * defaults (0.05, 100 trees, seed 42).
    */
  def iforestScores(mdValue: DataFrame, contamination: Double = 0.05,
                    numTrees: Int = 100, seed: Long = 42L): Dataset[Scored] = {
    val spark = mdValue.sparkSession
    import spark.implicits._
    val feats = Windows.iforestFeatures(mdValue, Seq("source_id", "metric"))
      .select(col("source_id").cast("long"), col("metric"), col("metric_date"),
        col("value").cast("double"), col("roll_mean"), col("roll_std"), col("diff1"))
      .as[FeatRow]
    feats.groupByKey(r => (r.source_id, r.metric))
      .flatMapGroups { (_: (Long, String), it: Iterator[FeatRow]) =>
        val rows = it.toArray.sortBy(_.metric_date.getTime)
        val x = rows.map(r => Array(r.value, r.roll_mean, r.roll_std, r.diff1))
        val scored = IsolationForest.scoreMatrix(x, contamination, numTrees, seed)
        rows.iterator.zip(scored.iterator).map { case (r, (s, o)) =>
          Scored(r.source_id, r.metric, r.metric_date, r.value, s, o)
        }
      }
  }
}
