package graft

import graft.anomaly.{AnomalyService, IsolationForest}
import graft.operators.Windows
import org.apache.spark.sql.functions._

/** Spike-detection golden case (`backend/tests/test_anomaly_api.py:47-100`,
  * FIXTURES.md §4): series {10,11,9,10,10,100,10}, window=3, z=3.0 must flag
  * 2025-09-06 — and only it.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def spikeSeries = Seq(
    ("2025-09-01", 10.0), ("2025-09-02", 11.0), ("2025-09-03", 9.0),
    ("2025-09-04", 10.0), ("2025-09-05", 10.0), ("2025-09-06", 100.0),
    ("2025-09-07", 10.0))
    .map { case (d, v) => (401L, "events_total", java.sql.Date.valueOf(d), v) }
    .toDF("source_id", "metric", "metric_date", "value")

  test("W2 partial z-score flags exactly the 2025-09-06 spike at window=3, z=3") {
    val out = Windows.zScorePartial(spikeSeries, window = 3, zThresh = 3.0,
      Seq("source_id", "metric")).collect()
    val outliers = out.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[java.sql.Date]("metric_date").toString)
    assert(outliers.toSeq == Seq("2025-09-06"))
  }

  test("W2 flat prior window: sigma=0 => outlier iff v != mu with sentinel z=1e9") {
    val flat = Seq(("2025-01-01", 5.0), ("2025-01-02", 5.0), ("2025-01-03", 5.0), ("2025-01-04", 9.0))
      .map { case (d, v) => (1L, "m", java.sql.Date.valueOf(d), v) }
      .toDF("source_id", "metric", "metric_date", "value")
    val out = Windows.zScorePartial(flat, 7, 3.0, Seq("source_id", "metric"))
      .orderBy("metric_date").collect()
    assert(!out(2).getAs[Boolean]("is_outlier") && out(2).getAs[Double]("z") == 0.0)
    assert(out(3).getAs[Boolean]("is_outlier") && out(3).getAs[Double]("z") == 1e9)
  }

  test("W1 strict z-score needs a full finite window and uses pstdev") {
    val out = Windows.zScoreStrict(spikeSeries, window = 3, Seq("source_id", "metric"))
      .orderBy("metric_date").collect()
    assert(out.take(3).forall(r => r.isNullAt(r.fieldIndex("z")))) // no full prior window yet
    val zSpike = out(5).getAs[Double]("z")
    // priors {9,10,10}: mu=29/3, pstdev=sqrt(2/9)
    val mu = 29.0 / 3.0; val sd = math.sqrt(2.0 / 9.0)
    assert(math.abs(zSpike - (100.0 - mu) / sd) < 1e-9)
  }

  test("isolation forest flags the spike, is deterministic, honors contamination") {
    val rng = new scala.util.Random(7)
    val x = Array.tabulate(100) { i =>
      if (i == 42) Array(100.0, 100.0) else Array(rng.nextDouble(), rng.nextDouble())
    }
    val s1 = IsolationForest.scoreMatrix(x, contamination = 0.05)
    val s2 = IsolationForest.scoreMatrix(x, contamination = 0.05)
    assert(s1.map(_._1).toSeq == s2.map(_._1).toSeq) // deterministic
    assert(s1(42)._2, "spike must be flagged")
    assert(s1.count(_._2) == 5) // 5% of 100
    assert(s1(42)._1 == s1.map(_._1).min) // spike is least normal
  }

  test("iforest service scores per series via flatMapGroups") {
    val md = spikeSeries.select(col("source_id"), col("metric"), col("metric_date"), col("value"))
    val scored = AnomalyService.iforestScores(md).collect()
    assert(scored.length == 7)
    val spike = scored.find(_.metric_date.toString == "2025-09-06").get
    assert(spike.score == scored.map(_.score).min, "spike least normal")
  }

  test("fewer than 5 points => all inliers (small-sample bail)") {
    val s = IsolationForest.scoreMatrix(Array(Array(1.0), Array(2.0), Array(99.0)))
    assert(s.forall(!_._2))
  }
}
