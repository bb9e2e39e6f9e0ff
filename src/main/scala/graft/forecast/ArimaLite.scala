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
  def fit(y: Array[Double]): Fit = {
    val z = y.indices.drop(1).map(i => y(i) - y(i - 1)).toArray
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
}
