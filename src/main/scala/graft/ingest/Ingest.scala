package graft.ingest

import graft.operators.Relational
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tolerant file ingestion + row cleaning (SURVEY.md §2.1 S1-S5, §2.2 C1-C9)
  * — the reference's `backend/app/services/ingestion.py` pipeline as
  * whole-DataFrame transforms.
  */
object Ingest {

  /** C1 — fuzzy column resolution (`ingestion.py:106-115`): first column
    * whose lowercase name is in the synonym pool, per logical field.
    */
  val tsSynonyms: Seq[String] = Seq("timestamp", "time", "date", "datetime")
  val valueSynonyms: Seq[String] = Seq("value", "amount", "count", "qty", "quantity")
  val metricSynonyms: Seq[String] = Seq("metric", "name", "metric_name")

  def resolveColumns(df: DataFrame): Map[String, Option[String]] = {
    def find(pool: Seq[String]) =
      pool.flatMap(p => df.columns.find(_.toLowerCase == p)).headOption
    Map("ts" -> find(tsSynonyms), "value" -> find(valueSynonyms), "metric" -> find(metricSynonyms))
  }

  /** S1 — tolerant CSV source (`ingestion.py:53-62`): permissive parse,
    * fully-blank rows dropped.
    */
  def readCsvTolerant(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("encoding", "UTF-8")
      .csv(path)
    val allBlank = df.columns.map(c => col(c).isNull || trim(col(c)) === "").reduce(_ && _)
    df.filter(!allBlank)
  }

  /** S2 — tolerant JSON source (`ingestion.py:65-99`): whole-body array or
    * NDJSON; bad lines surface in `_corrupt_record` (the reference's
    * `__parse_error__` stream).
    */
  def readJsonTolerant(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read
      .option("multiLine", multiLine.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** C2 — timestamp coercion to UTC (`ingestion.py:118-126,165-166`):
    * try several formats, null on failure (the `errors="coerce"` contract);
    * session timezone is UTC so naive inputs are treated as UTC.
    */
  def coerceTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** C3 — numeric coercion (`ingestion.py:128-134`): cast, null on failure
    * (try_cast: ANSI mode would otherwise throw on malformed input).
    */
  def coerceNumeric(c: Column): Column = c.try_cast("double")

  /** C4+C5 — row validation with warning stream and default-metric fill
    * (`ingestion.py:138-168`): null ts / null value skip the row with a
    * warning; missing metric falls back to `defaultMetric`.
    * Input columns: ts_raw, value_raw, metric_raw (strings).
    * Output: parsed columns + `warn` (null = clean row).
    */
  def cleanRows(df: DataFrame, defaultMetric: String = "events_total"): DataFrame =
    df.withColumn("ts", coerceTimestamp(col("ts_raw")))
      .withColumn("value", coerceNumeric(col("value_raw")))
      .withColumn("metric", coalesce(col("metric_raw"), lit(defaultMetric)))
      .withColumn("warn",
        when(col("ts").isNull, lit("invalid_timestamp"))
          .when(col("value").isNull, lit("invalid_value")))

  /** C6 — ingest stats in one aggregation (`ingestion.py:194-201,250-259`):
    * counts, ts bounds, sorted distinct metric list.
    */
  def ingestStats(cleaned: DataFrame): DataFrame =
    cleaned.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("warn").isNull, 1)).as("n_valid"),
      count(col("warn")).as("n_skipped"),
      unix_micros(min(col("ts"))).as("min_ts_us"),
      unix_micros(max(col("ts"))).as("max_ts_us"),
      countDistinct(col("metric")).as("n_metrics"),
      array_join(array_sort(collect_set(col("metric"))), ",").as("metrics_list"))

  /** S5 — first-write-wins dedup insert (`ingestion.py:214-227`,
    * `ON CONFLICT DO NOTHING`): within-batch keep the first row per key by
    * arrival order, then anti-join against the existing store.
    * Returns (deduped batch, duplicate count is before - after).
    */
  def dedupInsert(batch: DataFrame, existing: Option[DataFrame], keys: Seq[String],
                  orderCol: String): DataFrame = {
    val inBatch = Relational.firstWriteWins(batch, keys, orderCol)
    existing match {
      case Some(ex) => inBatch.join(ex.select(keys.map(col): _*).distinct(), keys, "left_anti")
      case None => inBatch
    }
  }

  /** C4 detail — warning summary capped at `cap` distinct reasons
    * (`ingestion.py:243-247` caps the warning list at 50).
    */
  def warningsSummary(cleaned: DataFrame, cap: Int = 50): DataFrame =
    cleaned.filter(col("warn").isNotNull)
      .groupBy(col("warn")).agg(count(lit(1)).as("n"))
      .orderBy(col("warn")).limit(cap)

  /** S3 — strict multipart gate (`routers/ingest.py:80-86,161-168`): ANY
    * invalid row rejects the whole file. Returns the count of invalid rows;
    * callers commit only when it is zero. One aggregation, no collect.
    */
  def strictGateViolations(cleaned: DataFrame): Long =
    cleaned.filter(col("warn").isNotNull).count()

  /** Header preflight for strict CSV (`routers/ingest.py:55-77`): must
    * resolve both a timestamp and a value column.
    */
  def strictHeaderOk(df: DataFrame): Boolean = {
    val r = resolveColumns(df)
    r("ts").isDefined && r("value").isDefined
  }

  /** S6 — metric_daily upsert as recompute-and-overwrite: aggregation is a
    * pure function of clean_events, so overwriting the affected partitions
    * with a fresh aggregate reproduces `ON CONFLICT DO UPDATE` exactly
    * (`services/kpi.py:159-232`). With a date-partitioned store this is
    * `write.mode("overwrite")` + dynamic partition overwrite on the touched
    * (metric_date) range only.
    */
  def recomputeOverwrite(cleanEvents: DataFrame, touchedDates: DataFrame): DataFrame = {
    val affected = cleanEvents.join(broadcast(touchedDates),
      to_date(col("ts")) === touchedDates("metric_date"), "left_semi")
    graft.operators.DailyKpi.aggregate(affected)
  }
}
