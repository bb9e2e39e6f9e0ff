package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily KPI aggregation — the reference's analytic core.
  *
  * Reference: `backend/app/services/kpi.py:14-134` (R5 in SURVEY.md §2.3):
  * `GROUP BY (utc_day(ts), source_id, metric)` producing
  * `SUM(value), AVG(value), COUNT(*), COUNT(DISTINCT field)`.
  *
  * Scale notes: this is a single hash aggregation — Spark plans it as
  * partial (map-side) + final `HashAggregateExec`, so the shuffle carries
  * pre-combined per-day partials, not raw events. `countDistinct` is exact
  * (the reference's tests assert distinct == count:
  * `tests/kpi_metrics_engine/test_kpi_variants.py:66-85`); at 100 TB you
  * would bolt on `approx_count_distinct` as an opt-in variant, which is why
  * the distinct column is parameterized here.
  */
object DailyKpi {

  /** events(source_id, ts, metric, value) -> metric_daily. */
  def aggregate(events: DataFrame, distinctCol: Option[String] = None): DataFrame = {
    val base = events.groupBy(
      to_date(col("ts")).as("metric_date"),
      col("source_id"),
      col("metric"))
    val aggs = Seq(
      sum(col("value")).as("value_sum"),
      avg(col("value")).as("value_avg"),
      count(lit(1)).as("value_count")) ++
      distinctCol.map(c => countDistinct(col(c)).as("value_distinct")).toSeq
    base.agg(aggs.head, aggs.tail: _*)
  }

  /** 100 TB variant of [[aggregate]]: exact distinct counting shuffles every
    * distinct (key, value) pair; at extreme cardinalities swap in HLL-based
    * `approx_count_distinct` (rsd-tunable) — the aggregation stays one
    * partial+final pass with fixed-size sketches instead.
    */
  def aggregateApprox(events: DataFrame, distinctCol: String, rsd: Double = 0.05): DataFrame =
    events.groupBy(
        to_date(col("ts")).as("metric_date"),
        col("source_id"),
        col("metric"))
      .agg(
        sum(col("value")).as("value_sum"),
        avg(col("value")).as("value_avg"),
        count(lit(1)).as("value_count"),
        approx_count_distinct(col(distinctCol), rsd).as("value_distinct"))

  /** Incremental merge of already-aggregated daily states: combine an
    * existing metric_daily with a new batch's aggregates WITHOUT rescanning
    * the underlying events — sum/count add, avg re-derives from the merged
    * sum/count (algebraic state, exactly the map-side-combine identity).
    * This is the true-incremental alternative to the reference's
    * recompute-affected-dates upsert when the raw history is cold storage;
    * distinct counts are NOT mergeable exactly and so are intentionally
    * absent (merge HLL sketches via [[aggregateApprox]] at scale instead).
    */
  def mergeDaily(existing: DataFrame, delta: DataFrame): DataFrame =
    existing.select("metric_date", "source_id", "metric", "value_sum", "value_count")
      .unionByName(delta.select("metric_date", "source_id", "metric", "value_sum", "value_count"))
      .groupBy(col("metric_date"), col("source_id"), col("metric"))
      .agg(sum(col("value_sum")).as("value_sum"), sum(col("value_count")).as("value_count"))
      .withColumn("value_avg", col("value_sum") / col("value_count"))

  /** R6: avg derivation with zero-guard (`backend/app/routers/kpi.py:132,139`,
    * `safe_divide` at `backend/app/utils/numeric.py:33-47`).
    */
  def safeAvg(sumCol: Column, countCol: Column): Column =
    when(countCol =!= 0, sumCol / countCol)

  /** R8: unified-value selector (`backend/app/services/metrics_calc.py:28-54`):
    * `value := value_sum | value_avg | value_count` per the `agg` parameter.
    */
  def withUnifiedValue(metricDaily: DataFrame, agg: String): DataFrame = {
    require(Set("sum", "avg", "count", "distinct").contains(agg), s"bad agg: $agg")
    metricDaily.withColumn("value", col(s"value_$agg"))
  }

  /** Value fallback chain (`backend/app/services/anomaly.py:29-44`,
    * `forecast.py:33`). NOTE the reference uses Python `or`, so a 0.0 (or
    * NULL) value_sum falls through to value_avg etc., and the terminal
    * default is 0.0 — reproduced exactly.
    */
  def valueFallback(cols: Seq[Column]): Column = {
    val nonZero = cols.map(c => when(c.isNotNull && c =!= 0.0, c))
    coalesce(nonZero :+ lit(0.0): _*)
  }

  /** R7: global and per-group ts bounds (`backend/app/services/kpi.py:26,241-250`). */
  def tsBounds(events: DataFrame, keys: Seq[String]): DataFrame =
    events.groupBy(keys.map(col): _*).agg(
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      count(lit(1)).as("n"))

  /** R11 last-N pattern: most recent n rows per series, returned in
    * chronological order (`backend/app/services/forecast_reliability.py:26-37`:
    * `ORDER BY metric_date DESC LIMIT days` then reverse).
    */
  def lastN(metricDaily: DataFrame, n: Int, partitionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col("metric_date").desc)
    metricDaily
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }
}
