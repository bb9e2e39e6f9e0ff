package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline extension), with a DuckDB oracle in [[oracleSql]]
  * where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ WindowQueries.defs ++ ForecastQueries.defs ++ DataQueries.defs ++ IngestQueries.defs ++ ModelQueries.defs ++ AnalyticsQueries.defs ++ AdvancedRelQueries.defs ++ SmoothingQueries.defs ++ OlapQueries.defs ++ SketchQueries.defs ++ CorpusQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ WindowQueries.oracles ++ ForecastQueries.oracles ++ DataOracles.oracles ++ IngestQueries.oracles ++ ModelQueries.oracles ++ AnalyticsQueries.oracles ++ AdvancedRelQueries.oracles ++ SmoothingQueries.oracles ++ OlapQueries.oracles ++ SketchQueries.oracles ++ CorpusQueries.oracles
}
