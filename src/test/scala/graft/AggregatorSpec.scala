package graft

import graft.forecast.{ErrorMetricsAggregator, Forecast}
import org.apache.spark.sql.functions._

class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass aggregator matches the column-expression metrics") {
    val pairs = Seq((10.0, 9.0), (12.0, 11.5), (0.0, 1.0), (8.0, 10.0), (5.0, 5.0))
    val viaAgg = pairs.toDS().groupByKey(_ => 1)
      .agg(new ErrorMetricsAggregator().toColumn)
      .collect().head._2
    val df = pairs.toDF("a", "p")
    val viaCols = df.agg(
      Forecast.mae(col("a"), col("p")).as("mae"),
      Forecast.rmse(col("a"), col("p")).as("rmse"),
      Forecast.mape(col("a"), col("p")).as("mape"),
      Forecast.smape(col("a"), col("p")).as("smape"),
      Forecast.bias(col("a"), col("p")).as("bias")).collect().head
    assert(math.abs(viaAgg.mae - viaCols.getAs[Double]("mae")) < 1e-9)
    assert(math.abs(viaAgg.rmse - viaCols.getAs[Double]("rmse")) < 1e-9)
    // column mape quantizes terms at 1e-8 for oracle reproducibility
    assert(math.abs(viaAgg.mape - viaCols.getAs[Double]("mape")) < 1e-4)
    assert(math.abs(viaAgg.smape - viaCols.getAs[Double]("smape")) < 1e-9)
    assert(math.abs(viaAgg.bias - viaCols.getAs[Double]("bias")) < 1e-9)
  }

  test("empty input => MAPE 100 sentinel (forecast.py:136-137)") {
    val out = new ErrorMetricsAggregator().finish(new ErrorMetricsAggregator().zero)
    assert(out.mape == 100.0 && out.mae == 0.0)
  }
}
