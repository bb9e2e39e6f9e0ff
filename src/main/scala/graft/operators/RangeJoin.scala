package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match point rows to `[lo, hi)` interval rows with
  * no equi-key — the second join shape event/analytics pipelines need that
  * Spark's planner turns into a nested-loop (BroadcastNestedLoopJoin when
  * one side is small, a cartesian product otherwise).
  *
  * The scalable shape is band bucketing: quantize the domain into
  * fixed-width bands, explode each interval into the bands it covers, and
  * hash-join on the band id before an exact residual filter. Cost is
  * O(points + intervals x coverage) through one hash shuffle — the standard
  * trick for interval joins on big-data engines — instead of
  * O(points x intervals). Intervals may overlap; a point matches every
  * interval containing it.
  */
object RangeJoin {

  /** @param bandWidth quantization width — pick ~ the typical interval
    *                  length so coverage (bands per interval) stays small.
    *                  Over-covered edge bands are removed by the exact
    *                  residual filter, so correctness never depends on it.
    */
  def pointInRange(points: DataFrame, ranges: DataFrame, valueCol: String,
                   loCol: String, hiCol: String, bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val p = points.withColumn("__band", floor(col(valueCol) / bandWidth).cast("long"))
    val r = ranges.filter(col(hiCol) > col(loCol)) // empty interval matches nothing
      .withColumn("__band", explode(sequence(
        floor(col(loCol) / bandWidth).cast("long"),
        floor(col(hiCol) / bandWidth).cast("long"))))
    p.join(r, Seq("__band"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__band")
  }
}
