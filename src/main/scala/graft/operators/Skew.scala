package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter group keys.
  *
  * AQE's skew-join splitting handles joins; for aggregations over keys whose
  * cardinality is tiny but whose row counts are huge (one metric receiving
  * most of the traffic at 100 TB), two-phase salted aggregation spreads the
  * partial work across `saltBuckets` reducers and re-combines — the classic
  * add-salt/partial/final pattern for algebraic aggregates.
  */
object Skew {

  /** Salted sum/count/min/max/avg aggregation: phase 1 groups by
    * (keys, salt) so no single reducer owns a hot key; phase 2 combines the
    * per-salt partials. Only algebraic aggregates are offered — they
    * recombine exactly.
    */
  def saltedDailyAgg(events: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val k = keys.map(col)
    val salted = events.withColumn("__salt",
      pmod(hash(col(valueCol) * 31), lit(saltBuckets)))
    val partial = salted.groupBy(k :+ col("__salt"): _*).agg(
      sum(col(valueCol)).as("__sum"),
      count(lit(1)).as("__cnt"),
      min(col(valueCol)).as("__min"),
      max(col(valueCol)).as("__max"))
    partial.groupBy(k: _*).agg(
      sum(col("__sum")).as("value_sum"),
      sum(col("__cnt")).as("value_count"),
      min(col("__min")).as("value_min"),
      max(col("__max")).as("value_max"))
      .withColumn("value_avg", col("value_sum") / col("value_count"))
  }
}
