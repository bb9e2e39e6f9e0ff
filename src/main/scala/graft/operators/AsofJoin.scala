package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks up the payload of the right row
  * with the greatest timestamp <= the left row's timestamp, per join key —
  * the "latest state as of this moment" join that event pipelines need and
  * Spark has no built-in operator for (the reference has no join beyond the
  * dim equi-join either, SURVEY.md §2.3 R3; this rounds out the engine's
  * join surface alongside the advanced relational shapes).
  *
  * Implementation is the scalable merge shape, not a range cross-join: tag
  * both sides, union them, and run ONE partitioned sort window where
  * `last(payload, ignoreNulls)` carries the most recent right payload
  * forward into each left row. Cost is one shuffle on the key + one sort —
  * the same exchange a sort-merge join would pay, with no pair explosion,
  * so it holds at any key cardinality or time density.
  *
  * Semantics notes:
  *  - right rows sort before left rows at equal timestamps, so ties are
  *    inclusive (`left.ts >= right.ts`), matching DuckDB/pandas ASOF.
  *  - duplicate right rows on (key, ts) resolve deterministically to the
  *    greatest payload struct (sorted last); pre-dedup the right side if a
  *    different pick is wanted.
  *  - left column names must not collide with carried right column names —
  *    rename before joining.
  */
object AsofJoin {

  /** @param joinType  "inner" (drop unmatched left rows) or "left" (keep
    *                   them with null payload), mirroring ASOF JOIN vs
    *                   ASOF LEFT JOIN.
    * @param tolerance  max lookback in the timestamp column's own units
    *                   (pandas `merge_asof(tolerance=...)`): a right row
    *                   older than `left.ts - tolerance` no longer matches.
    *                   Implemented as a post-window filter on the matched
    *                   right timestamp — same single-exchange plan.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, joinType: String = "inner",
               tolerance: Option[Long] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val rightVals = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    require(rightVals.nonEmpty, "right side carries no payload columns")
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), struct(rightVals.map(col): _*).as("__rv")): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__mts", last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val joined = tolerance match {
      case Some(tol) => withMatch.withColumn("__m",
        when(col("__mts") >= col("__ts") - tol, col("__m")))
      case None => withMatch
    }
    val matched = if (joinType == "inner") joined.filter(col("__m").isNotNull) else joined
    matched.select(
      left.columns.toSeq.map(col) ++ rightVals.map(v => col("__m").getField(v).as(v)): _*)
  }

  /** Forward as-of join: each left row picks up the payload of the right row
    * with the SMALLEST timestamp >= the left row's timestamp, per join key —
    * the "next scheduled event / next state change" lookup. Same merge shape
    * and cost as [[backward]] (one shuffle on the key + one sort), with the
    * window flipped to look forward.
    *
    * Semantics notes:
    *  - ties are inclusive (`left.ts <= right.ts`): right rows sort AFTER
    *    left rows at equal timestamps so the forward-looking frame sees them.
    *  - duplicate right rows on (key, ts) resolve deterministically to the
    *    LEAST payload struct (first in the frame); pre-dedup the right side
    *    if a different pick is wanted.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val rightVals = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    require(rightVals.nonEmpty, "right side carries no payload columns")
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), struct(rightVals.map(col): _*).as("__rv")): _*)
      .withColumn("__side", lit(1))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val matched = if (joinType == "inner") joined.filter(col("__m").isNotNull) else joined
    matched.select(
      left.columns.toSeq.map(col) ++ rightVals.map(v => col("__m").getField(v).as(v)): _*)
  }
}
