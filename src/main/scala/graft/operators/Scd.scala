package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance: turn an append-only
  * change log into a versioned dimension with validity intervals, and look
  * the valid version up as-of any fact timestamp.
  *
  * The reference keeps only current-state rows (last-write-wins upserts,
  * `backend/app/services/ingest.py` forecast/metric upserts — SURVEY.md §2.1
  * S6/S7): history is overwritten. A warehouse feeding training pipelines
  * needs the opposite — "what did this dimension say when the fact
  * happened" — which is exactly SCD Type 2 (Kimball's convention: one row
  * per version, `effective_from`/`effective_to` half-open intervals,
  * `is_current` on the open tail).
  *
  * Scale shape: both halves are single-shuffle operators. [[type2]] is two
  * windows over the same (key ORDER BY ts) sort — one exchange, no join.
  * [[pointInTime]] reuses [[AsofJoin.backward]]'s merge shape (union + one
  * partitioned sort window), so fact x dimension never multiplies rows the
  * way the naive `BETWEEN from AND to` range join does; at 100 TB the cost
  * stays one shuffle of facts + versions on the key.
  */
object Scd {

  /** Build the Type-2 dimension from a change log.
    *
    * @param changes   one row per observed change: key columns + a
    *                  timestamp + attribute columns. (key, ts) must be
    *                  unique — pre-dedup with a deterministic pick if the
    *                  log can repeat a timestamp.
    * @param keyCols   the natural key of the dimension entity.
    * @param tsCol     change timestamp column (any orderable type).
    * @param attrCols  tracked attribute columns.
    * @param collapseUnchanged drop change rows whose tracked attributes
    *                  equal the previous version's (no-op writes, the
    *                  common case in change-data-capture feeds) BEFORE
    *                  assigning validity — so versions describe genuine
    *                  transitions and `version` counts real changes.
    *
    * Output: keyCols ++ attrCols ++ (effective_from, effective_to,
    * is_current, version). Intervals are half-open:
    * [effective_from, effective_to), effective_to null on the current row.
    */
  def type2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
            attrCols: Seq[String], collapseUnchanged: Boolean = true): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val keyW = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    val kept =
      if (!collapseUnchanged) changes
      else changes
        .withColumn("__prev", lag(attrs, 1).over(keyW))
        // first version has a null __prev: null-safe inequality keeps it
        .filter(not(attrs <=> col("__prev")))
        .drop("__prev")
    // second window over the SAME sort: Catalyst reuses the single exchange
    kept
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(keyW))
      .withColumn("is_current", col("effective_to").isNull)
      .withColumn("version", row_number().over(keyW))
      .select((keyCols ++ attrCols).map(col) ++ Seq(col("effective_from"),
        col("effective_to"), col("is_current"), col("version").cast("int").as("version")): _*)
  }

  /** Point-in-time lookup: each fact row picks up the dimension version
    * valid at its timestamp. Because Type-2 intervals tile the key's
    * timeline (each version valid until the next begins), "the version
    * containing fact.ts" IS "the latest version starting at-or-before
    * fact.ts" — a backward as-of join on `effective_from`, so the interval
    * predicate costs nothing beyond [[AsofJoin.backward]]'s single shuffle.
    * Facts before the key's first version (or with no key at all) survive
    * with null dimension columns, mirroring a LEFT range join.
    *
    * @param dim output of [[type2]] (only keyCols, attrCols and
    *            effective_from are read; validity ends are implied).
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
                  factTs: String, attrCols: Seq[String]): DataFrame = {
    val versions = dim.select((keyCols ++ attrCols).map(col) :+ col("effective_from"): _*)
    AsofJoin.backward(facts, versions, keyCols, factTs, "effective_from",
      joinType = "left")
  }
}
