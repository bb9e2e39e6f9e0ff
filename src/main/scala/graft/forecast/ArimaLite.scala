package graft.forecast

/** ARIMA(1,1,1) by conditional sum of squares (SURVEY.md M1).
  *
  * The reference fits `SARIMAX(order=(1,1,1), seasonal=(0,0,0,0))`
  * (`backend/app/services/forecast.py:68-75`); statsmodels' state-space MLE
  * is not reproducible on the JVM, so this is a CSS fit of the same model
  * family: difference once, fit phi/theta on
  * z_t = phi*z_{t-1} + eps_t + theta*eps_{t-1} by grid + refinement,
  * forecast recursively, undifference, and build normal-approximation
  * confidence bands from psi weights. Deterministic (no RNG).
  *
  * Per-series distribution happens in the caller via
  * `groupByKey(...).flatMapGroups` — each series is tiny (<= 365 points per
  * the reference's usage), so the fit runs where the group lives.
  */
object ArimaLite {

  final case class Fit(phi: Double, theta: Double, sigma2: Double)
  final case class Point(yhat: Double, lo: Double, hi: Double)

  /** CSS objective: residual sum of squares of the ARMA(1,1) recursion. */
  private def css(z: Array[Double], phi: Double, theta: Double): Double = {
    var eps = 0.0
    var sse = 0.0
    var t = 1
    while (t < z.length) {
      val e = z(t) - phi * z(t - 1) - theta * eps
      sse += e * e
      eps = e
      t += 1
    }
    sse
  }

  /** Grid search then two refinement passes — deterministic and robust for
    * the short series this engine fits.
    */
  def fit(y: Array[Double]): Fit =
    fitZ(y.indices.drop(1).map(i => y(i) - y(i - 1)).toArray)

  /** Same CSS fit over an already-differenced series (shared by the regular
    * and seasonal paths).
    */
  private def fitZ(z: Array[Double]): Fit = {
    if (z.length < 3) return Fit(0.0, 0.0, 0.0)
    var best = (0.0, 0.0, Double.MaxValue)
    def search(p0: Double, p1: Double, t0: Double, t1: Double, steps: Int): Unit = {
      var i = 0
      while (i <= steps) {
        val phi = p0 + (p1 - p0) * i / steps
        var j = 0
        while (j <= steps) {
          val theta = t0 + (t1 - t0) * j / steps
          val s = css(z, phi, theta)
          if (s < best._3) best = (phi, theta, s)
          j += 1
        }
        i += 1
      }
    }
    search(-0.95, 0.95, -0.95, 0.95, 19)
    val (p, t, _) = best
    search(math.max(-0.99, p - 0.1), math.min(0.99, p + 0.1),
      math.max(-0.99, t - 0.1), math.min(0.99, t + 0.1), 20)
    val (phi, theta, sse) = best
    Fit(phi, theta, sse / math.max(z.length - 1, 1))
  }

  /** h-step forecast with ~95% normal bands. */
  def forecast(y: Array[Double], h: Int): Array[Point] = {
    if (y.isEmpty) return Array.fill(h)(Point(0.0, 0.0, 0.0))
    val f = fit(y)
    val z = y.indices.drop(1).map(i => y(i) - y(i - 1)).toArray
    // last in-sample residual
    var eps = 0.0
    var t = 1
    while (t < z.length) { eps = z(t) - f.phi * z(t - 1) - f.theta * eps; t += 1 }
    val zLast = if (z.nonEmpty) z.last else 0.0
    // recursive mean forecasts of the differenced series
    val zf = new Array[Double](h)
    var prev = zLast
    var e = eps
    var k = 0
    while (k < h) {
      zf(k) = f.phi * prev + f.theta * e
      prev = zf(k)
      e = 0.0 // future shocks have zero mean
      k += 1
    }
    // undifference + psi-weight variance accumulation:
    // ARIMA(1,1,1) psi_j on the original scale accumulate.
    val out = new Array[Point](h)
    var level = y.last
    var varAcc = 0.0
    var psiSum = 1.0 // psi_0
    var psiJ = 1.0
    k = 0
    while (k < h) {
      level += zf(k)
      varAcc += psiSum * psiSum * f.sigma2
      val half = 1.959963984540054 * math.sqrt(varAcc)
      out(k) = Point(level, level - half, level + half)
      // next psi on the differenced scale: psi_{j+1} = phi*psi_j (+ theta at j=0)
      psiJ = if (k == 0) f.phi + f.theta else f.phi * psiJ
      psiSum += psiJ
      k += 1
    }
    out
  }

  /** Seasonal ARIMA-lite: the deterministic JVM stand-in for the reference's
    * seasonal intent SARIMAX (1,1,1)(0,1,1,7)
    * (`backend/app/schemas/forecast.py:36-60`). Difference once regularly and
    * once at the seasonal lag — w_t = (1-B)(1-B^s) y_t — fit ARMA(1,1) on w
    * with the same CSS grid, then forecast by recursing the EXPANDED
    * nonstationary AR polynomial phi(B)(1-B)(1-B^s) directly on levels:
    *   y_t = (1+phi) y_{t-1} - phi y_{t-2} + y_{t-s} - (1+phi) y_{t-s-1}
    *         + phi y_{t-s-2} + eps_t + theta eps_{t-1}.
    * An exactly periodic history forecasts exactly periodic (the seasonal
    * difference zeroes w, and the recursion reduces to y_t = y_{t-s}); a
    * linear trend extrapolates linearly. Bands come from the psi-weight
    * recursion of the same expanded polynomial. Series too short for the
    * double difference fall back to the non-seasonal [[forecast]].
    */
  def seasonalForecast(y: Array[Double], h: Int, period: Int = 7): Array[Point] = {
    val n = y.length
    if (period < 2 || n < period + 4) return forecast(y, h)
    val w = Array.tabulate(n - period - 1) { i =>
      val t = i + period + 1
      y(t) - y(t - 1) - y(t - period) + y(t - period - 1)
    }
    if (w.length < 3) return forecast(y, h)
    val f = fitZ(w)
    // last in-sample shock of the ARMA recursion on w
    var eps = 0.0
    var t = 1
    while (t < w.length) { eps = w(t) - f.phi * w(t - 1) - f.theta * eps; t += 1 }
    // expanded AR coefficients (index = lag; overlaps for small periods add)
    val a = new Array[Double](period + 3)
    a(1) += 1 + f.phi
    a(2) += -f.phi
    a(period) += 1.0
    a(period + 1) += -(1 + f.phi)
    a(period + 2) += f.phi
    val hist = scala.collection.mutable.ArrayBuffer.empty[Double]
    hist ++= y
    val psi = new Array[Double](math.max(h, 1))
    val out = new Array[Point](h)
    var varAcc = 0.0
    var k = 0
    while (k < h) {
      var m = if (k == 0) f.theta * eps else 0.0
      var i = 1
      while (i <= period + 2) { m += a(i) * hist(hist.length - i); i += 1 }
      hist += m
      val pk =
        if (k == 0) 1.0
        else {
          var s = if (k == 1) f.theta else 0.0
          var j = 1
          while (j <= math.min(k, period + 2)) { s += a(j) * psi(k - j); j += 1 }
          s
        }
      psi(k) = pk
      varAcc += pk * pk * f.sigma2
      val half = 1.959963984540054 * math.sqrt(varAcc)
      out(k) = Point(m, m - half, m + half)
      k += 1
    }
    out
  }
}
