package graft

import graft.forecast.Smoothing

/** Exponential-smoothing invariants. The distributed folds use only IEEE
  * `*`/`+`/`-` in a fixed order, so a plain-Scala replay of the recursion
  * must match EXACTLY (==, no tolerance) — the same property the DuckDB
  * oracle relies on.
  */
class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  private def series(n: Int, f: Int => Double) =
    (0 until n).map(i => (1L, "m", java.sql.Date.valueOf(java.time.LocalDate.of(2025, 1, 1).plusDays(i)), f(i)))
      .toDF("source_id", "metric", "metric_date", "value")

  test("ewma: constant series smooths to itself; hand fold matches exactly") {
    val const = Smoothing.ewma(series(10, _ => 42.0)).collect()
    assert(const.length == 10 && const.forall(_.getAs[Double]("ewma") == 42.0))

    val xs = (0 until 20).map(i => math.sin(i) * 10 + i)
    val got = Smoothing.ewma(series(20, xs(_)), alpha = 0.25)
      .orderBy("metric_date").collect().map(_.getAs[Double]("ewma")).toSeq
    val want = xs.tail.scanLeft(xs.head)((s, x) => 0.25 * x + 0.75 * s)
    assert(got == want)
  }

  test("holt: linear series is extrapolated with learned trend; hand fold exact") {
    val xs = (0 until 60).map(i => 5.0 + 2.0 * i)
    val fc = Smoothing.holtForecast(series(60, xs(_)), horizon = 7)
      .orderBy("target_date").collect()
    assert(fc.length == 7 && fc.forall(_.getAs[String]("method") == "holt_linear"))
    // replay the fold in Scala: must match Spark bit-for-bit
    var l = xs.head; var b = 0.0
    for (x <- xs.tail) {
      val nl = 0.5 * x + 0.5 * (l + b)
      b = 0.25 * (nl - l) + 0.75 * b
      l = nl
    }
    val want = (1 to 7).map(h => l + h * b)
    assert(fc.map(_.getAs[Double]("yhat")).toSeq == want)
    // and the learned trend has converged near the true slope 2
    assert(math.abs(b - 2.0) < 0.05)
    // forecast keeps climbing, not flatlining at the last value
    assert(fc.last.getAs[Double]("yhat") > xs.last)
  }

  test("holt-winters: periodic series forecasts periodically with phase wrap") {
    // 10 full weekly cycles of a pure seasonal pattern — the mean seed makes
    // the state exactly stationary, so the forecast is exact
    val xs = (0 until 70).map(i => 100.0 + 5.0 * (i % 7))
    val fc = Smoothing.holtWintersForecast(series(70, xs(_)), horizon = 10, period = 7)
      .orderBy("target_date").collect()
    assert(fc.length == 10 && fc.forall(_.getAs[String]("method") == "holt_winters"))
    val got = fc.map(_.getAs[Double]("yhat")).toSeq
    val expect = (70 until 80).map(i => 100.0 + 5.0 * (i % 7))
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"$g vs $e") }
    // and wrap the phase: steps 1..7 and step 8 share the week shape
    assert(got(7) == got(0) && got(8) == got(1))
  }

  test("holt-winters: hand fold matches exactly, incl. seasonal slot rotation") {
    val xs = (0 until 40).map(i => 50.0 + 3.0 * (i % 7) + 0.5 * i)
    val fc = Smoothing.holtWintersForecast(series(40, xs(_)), horizon = 9, period = 7)
      .orderBy("target_date").collect()
    var l = 0.0; var b = 0.0; var n = 0
    var seas = Vector.empty[Double]
    for (x <- xs) {
      if (n < 7) { l += x; b = 0.0; seas = seas :+ x }
      else {
        val lp = if (n == 7) l / 7 else l
        val sp = if (n == 7) seas.map(_ - l / 7) else seas
        val sOld = sp.head
        val nl = 0.5 * (x - sOld) + 0.5 * (lp + b)
        val nb = 0.25 * (nl - lp) + 0.75 * b
        val ns = 0.25 * (x - nl) + 0.75 * sOld
        l = nl; b = nb; seas = sp.tail :+ ns
      }
      n += 1
    }
    val want = (1 to 9).map(h => l + h * b + seas((h - 1) % 7))
    assert(fc.map(_.getAs[Double]("yhat")).toSeq == want)
  }

  test("holt-winters: series no longer than one cycle degrades to hold-last") {
    for (n <- Seq(4, 7)) {
      val fc = Smoothing.holtWintersForecast(series(n, i => 10.0 + i), horizon = 5, period = 7)
        .orderBy("target_date").collect()
      assert(fc.forall(_.getAs[String]("method") == "naive_hold_last"), s"n=$n")
      assert(fc.forall(_.getAs[Double]("yhat") == (10.0 + n - 1)), s"n=$n")
    }
  }
}
