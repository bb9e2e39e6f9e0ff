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

  /** Salted equi-join for a skewed LEFT side: left rows get a random-ish
    * (but deterministic — hash of the whole row) salt in [0, saltBuckets);
    * the right side is replicated once per salt value; the join key becomes
    * (key, salt), so a hot key's rows spread over `saltBuckets` reducers
    * instead of piling onto one. Right-side replication costs
    * |right| x saltBuckets rows — use for MEDIUM right sides that are too
    * big to broadcast but far smaller than the skewed left (the classic gap
    * AQE's skew splitting doesn't always cover, e.g. when the hot key's
    * rows arrive pre-partitioned). Result == plain inner equi-join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltBuckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
