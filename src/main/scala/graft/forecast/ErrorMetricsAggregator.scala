package graft.forecast

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass typed Aggregator computing MAE/RMSE/MAPE/sMAPE/bias over
  * (actual, predicted) pairs (SURVEY.md §2.7 optional item; formulas from
  * `backend/app/services/forecast.py:134-156`). A single shuffle of six
  * partial sums replaces five separate aggregate expressions — useful when
  * the metric set is computed per series over very wide fan-outs.
  *
  * Use as `ds.groupByKey(...).agg(new ErrorMetricsAggregator().toColumn)` or
  * register via `functions.udaf` for untyped DataFrames.
  */
case class MetricsBuf(n: Long, sumAbs: Double, sumSq: Double,
                      sumMape: Double, sumSmape: Double, sumBias: Double)
case class ErrorMetrics(mae: Double, rmse: Double, mape: Double, smape: Double, bias: Double)

class ErrorMetricsAggregator(eps: Double = 1e-6)
    extends Aggregator[(Double, Double), MetricsBuf, ErrorMetrics] {

  override def zero: MetricsBuf = MetricsBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  override def reduce(b: MetricsBuf, ap: (Double, Double)): MetricsBuf = {
    val (a, p) = ap
    val absErr = math.abs(a - p)
    val smDen = math.abs(a) + math.abs(p)
    MetricsBuf(
      b.n + 1,
      b.sumAbs + absErr,
      b.sumSq + (a - p) * (a - p),
      b.sumMape + absErr / math.max(math.abs(a), eps),
      b.sumSmape + absErr / (if (smDen == 0.0) 1.0 else smDen),
      b.sumBias + (p - a))
  }

  override def merge(x: MetricsBuf, y: MetricsBuf): MetricsBuf =
    MetricsBuf(x.n + y.n, x.sumAbs + y.sumAbs, x.sumSq + y.sumSq,
      x.sumMape + y.sumMape, x.sumSmape + y.sumSmape, x.sumBias + y.sumBias)

  override def finish(b: MetricsBuf): ErrorMetrics =
    if (b.n == 0) ErrorMetrics(0.0, 0.0, 100.0, 0.0, 0.0) // empty => MAPE 100 (forecast.py:136-137)
    else ErrorMetrics(
      b.sumAbs / b.n,
      math.sqrt(b.sumSq / b.n),
      b.sumMape / b.n * 100.0,
      b.sumSmape / b.n * 100.0,
      b.sumBias / b.n)

  override def bufferEncoder: Encoder[MetricsBuf] = Encoders.product[MetricsBuf]
  override def outputEncoder: Encoder[ErrorMetrics] = Encoders.product[ErrorMetrics]
}
