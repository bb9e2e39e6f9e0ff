package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational-core helpers (SURVEY.md §2.3 R1-R12).
  *
  * The reference's only join shape is fact ⋈ tiny-dimension
  * (`backend/app/services/metrics_fetch.py:49`); at scale that is always a
  * broadcast-hash join, so every dimension join here goes through
  * `broadcast()` explicitly rather than trusting the size estimator.
  */
object Relational {

  /** R3: fact ⋈ broadcast dimension (reference joins `metric_daily ⋈ sources`).
    * Dimension tables are tiny relative to the fact side even at 100 TB
    * (region/nation/supplier cardinality is fixed), so force broadcast to
    * guarantee no shuffle of the fact table for the join itself.
    */
  def joinDim(fact: DataFrame, dim: DataFrame, joinExpr: org.apache.spark.sql.Column): DataFrame =
    fact.join(broadcast(dim), joinExpr)

  /** R4: name -> id scalar lookup (`backend/app/services/kpi.py:234-239`). */
  def lookupId(dim: DataFrame, nameCol: String, idCol: String, name: String): Option[Long] =
    dim.filter(col(nameCol) === name).select(col(idCol).cast("long"))
      .collect().headOption.map(_.getLong(0))

  /** R9: distinct + sort (`backend/app/services/metrics_fetch.py:118-141`). */
  def distinctSorted(df: DataFrame, colName: String): DataFrame =
    df.select(colName).distinct().orderBy(colName)

  /** Deterministic top-k: sort by (measure desc, tiebreak asc) and limit.
    * A total order is required for oracle-reproducible results; the
    * tiebreak column must be unique.
    */
  def topK(df: DataFrame, k: Int, measure: String, tiebreak: String): DataFrame =
    df.orderBy(col(measure).desc, col(tiebreak).asc).limit(k)

  /** Dedup keeping the first occurrence per key by `orderCol` — the
    * reference's `ON CONFLICT DO NOTHING` first-write-wins contract
    * (`backend/app/services/ingestion.py:221-226`, S5). Implemented as a
    * window rank, which shuffles once on the key — the same shuffle a
    * groupBy would need, and AQE handles skewed keys.
    */
  def firstWriteWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** [[firstWriteWins]] that also reports the per-key group size (the "how
    * many writes did this key see" audit the reference surfaces as skipped
    * counts). Both window functions share one partitioning, so the whole
    * thing costs a single shuffle on the keys — vs the naive
    * dedup + groupBy-count + join-back, which pays three exchanges for the
    * same answer.
    */
  def firstWriteWinsCounted(df: DataFrame, keys: Seq[String], orderCol: String,
                            countCol: String = "n_rows"): DataFrame = {
    val p = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__rn", row_number().over(p.orderBy(col(orderCol).asc)))
      .withColumn(countCol, count(lit(1)).over(p))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
