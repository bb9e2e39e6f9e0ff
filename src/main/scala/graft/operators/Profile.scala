package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column profiler: per-column completeness/cardinality/bounds statistics
  * in ONE pass over the table — the data-quality summary a pipeline runs
  * before trusting a new drop of data.
  *
  * The reference reports ingest-level quality only (rows_ok/rows_failed +
  * per-row warnings, `backend/app/services/ingest.py:82` — SURVEY.md §2.1
  * C6); column-level profiling is the natural next layer and a first-class
  * need at training-data scale, where a silently null-heavy or
  * constant-valued column poisons everything downstream.
  *
  * Scale shape: a single wide aggregation. The exact distinct counts
  * compile to one Expand (m streams for m profiled columns) feeding one
  * partial+final hash aggregate — the standard multi-distinct plan, one
  * shuffle total, no per-column table scans. min/max/null-count piggyback
  * on the same pass. The wide 1-row result is then unpivoted driver-free
  * (stack is a projection); output stays m rows however large the input.
  * Numeric bounds land in (min_num, max_num), string bounds in
  * (min_str, max_str) — no lossy cast-to-string formatting that would
  * differ across engines.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType.isInstanceOf[NumericType]
    def isStr(c: String) = schema(c).dataType == StringType

    // positional internal aliases: raw column names would need quoting in
    // the stack() expression (spaces/hyphens/quotes break the parser), so
    // the user-facing name travels only as an escaped string LITERAL
    val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__nn_$i"),
        count_distinct(col(c)).as(s"__nd_$i"),
        (if (isNum(c)) min(col(c)).cast("double") else lit(null).cast("double")).as(s"__mn_$i"),
        (if (isNum(c)) max(col(c)).cast("double") else lit(null).cast("double")).as(s"__mx_$i"),
        (if (isStr(c)) min(col(c)) else lit(null).cast("string")).as(s"__ms_$i"),
        (if (isStr(c)) max(col(c)) else lit(null).cast("string")).as(s"__xs_$i"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // stack(m, 'name', stats...) -> m rows; a pure projection of the 1-row agg
    val branches = cols.zipWithIndex.map { case (c, i) =>
      val esc = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$esc', __nn_$i, __nd_$i, __mn_$i, __mx_$i, __ms_$i, __xs_$i"
    }.mkString(", ")
    wide.select(col("__n").as("n_rows"), expr(
        s"stack(${cols.size}, $branches) AS (column_name, n_non_null, n_distinct, min_num, max_num, min_str, max_str)"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }
}
