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
  /** One scored point of the ROUTER-variant contract: `value` is None where
    * the input was missing/NaN, `score` is None when the series bailed (< 5
    * finite points) or, under the rolling-z proxy, before the warm-up window
    * fills.
    */
  case class RouterScore(value: Option[Double], isOutlier: Boolean, score: Option[Double])

  case class RouterPoint(source_id: Long, metric: String, metric_date: java.sql.Date,
                         value: Option[Double], is_outlier: Boolean, score: Option[Double])

  /** Pure per-series scorer for the MOUNTED router variant
    * (`backend/app/routers/anomaly_iforest.py:37-167`), distinct from the
    * service-matrix variant above in every default:
    *
    *   - X is the 1-feature [[value]] matrix (not the 4-feature W3 matrix);
    *   - n_estimators = 200 (router line 111), seed 42;
    *   - contamination is CLAMPED to [0.001, 0.5] (the router's Query
    *     bounds, lines 43);
    *   - NaN values are filled with the series' NaN-ignoring mean before the
    *     fit (lines 103-107) but reported back as None;
    *   - fewer than 5 finite points bails gracefully: every point inlier,
    *     score None (lines 80-93);
    *   - `method = "rolling_z"` runs the router's proxy fallback (lines
    *     128-154): window 7, population stdev, |z| >= 3 flags, sd == 0 =>
    *     outlier iff value != mean with z = 0, history accumulates only
    *     non-missing values, score None until the window fills.
    *
    * `vals` uses NaN for missing points (time order = array order).
    */
  def routerScoreSeries(vals: Array[Double], contamination: Double = 0.05,
                        method: String = "iforest", numTrees: Int = 200,
                        seed: Long = 42L): Array[RouterScore] = {
    val cont = math.min(0.5, math.max(0.001, contamination))
    def opt(v: Double): Option[Double] = if (v.isNaN) None else Some(v)
    // the router's bail check is `x == x` — NaN-only, mirroring numpy
    val finite = vals.filter(v => !v.isNaN)
    if (finite.length < 5) {
      vals.map(v => RouterScore(opt(v), isOutlier = false, score = None))
    } else if (method == "rolling_z") {
      val window = 7
      val zThresh = 3.0
      val history = scala.collection.mutable.ArrayBuffer.empty[Double]
      vals.map { v =>
        val vo = opt(v)
        var z: Option[Double] = None
        var out = false
        if (history.length >= window && vo.isDefined) {
          val last = history.takeRight(window)
          val mu = last.sum / window
          val sd = math.sqrt(last.map(a => (a - mu) * (a - mu)).sum / window)
          if (sd == 0.0) { out = vo.get != mu; z = Some(0.0) }
          else {
            val zz = (vo.get - mu) / sd
            z = Some(zz)
            out = math.abs(zz) >= zThresh
          }
        }
        vo.foreach(history += _)
        RouterScore(vo, out, z)
      }
    } else {
      // numpy-faithful fill: mean ignores NaN only; the isfinite mask
      // replaces both NaN and infinities
      val fill = finite.sum / finite.length
      val x = vals.map(v => Array(if (v.isNaN || v.isInfinite) fill else v))
      val scored = IsolationForest.scoreMatrix(x, cont, numTrees, seed)
      vals.zip(scored).map { case (v, (s, o)) => RouterScore(opt(v), o, Some(s)) }
    }
  }

  /** [[routerScoreSeries]] at several contamination levels from ONE forest
    * fit (iforest method only): decision scores are contamination-independent
    * — only the flag cut moves — so each requested level goes through the
    * same clamp + round(c*n) cut as the single-level entry point without a
    * refit. Returns one scored array per requested contamination, in order;
    * each is element-wise equal to `routerScoreSeries(vals, c)` (proven by
    * AnomalySpec's equivalence case).
    */
  def routerScoreSeriesMulti(vals: Array[Double], contaminations: Seq[Double],
                             numTrees: Int = 200, seed: Long = 42L)
      : Seq[Array[RouterScore]] = {
    def opt(v: Double): Option[Double] = if (v.isNaN) None else Some(v)
    val finite = vals.filter(v => !v.isNaN)
    if (finite.length < 5) {
      val bail = vals.map(v => RouterScore(opt(v), isOutlier = false, score = None))
      contaminations.map(_ => bail)
    } else {
      val fill = finite.sum / finite.length
      val x = vals.map(v => Array(if (v.isNaN || v.isInfinite) fill else v))
      val clamped = contaminations.map(c => math.min(0.5, math.max(0.001, c)))
      val (scores, flagSets) = IsolationForest.scoreMatrixMulti(x, clamped, numTrees, seed)
      flagSets.map { flags =>
        vals.indices.toArray.map(i => RouterScore(opt(vals(i)), flags(i), Some(scores(i))))
      }
    }
  }

  /** Dataset wrapper over [[routerScoreSeries]]: every (source, metric)
    * series scores independently inside `flatMapGroups` — same distribution
    * shape as [[iforestScores]], nullable value/score in the output.
    */
  def iforestRouterScores(mdValue: DataFrame, contamination: Double = 0.05,
                          method: String = "iforest"): Dataset[RouterPoint] = {
    val spark = mdValue.sparkSession
    import spark.implicits._
    val rows = mdValue.select(col("source_id").cast("long"), col("metric"),
        col("metric_date"), col("value").cast("double"))
      .as[(Long, String, java.sql.Date, Option[Double])]
    rows.groupByKey(r => (r._1, r._2)).flatMapGroups {
      (_: (Long, String), it: Iterator[(Long, String, java.sql.Date, Option[Double])]) =>
        val sorted = it.toArray.sortBy(_._3.getTime)
        val vals = sorted.map(_._4.getOrElse(Double.NaN))
        val scored = routerScoreSeries(vals, contamination, method)
        sorted.iterator.zip(scored.iterator).map { case (r, sc) =>
          RouterPoint(r._1, r._2, r._3, sc.value, sc.isOutlier, sc.score)
        }
    }
  }

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
