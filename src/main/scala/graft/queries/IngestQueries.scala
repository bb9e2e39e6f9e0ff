package graft.queries

import graft.core.Tables
import graft.ingest.Ingest
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion-pipeline queries (SURVEY.md §2.1-§2.2): tolerant cleaning,
  * ingest stats, first-write-wins dedup, plus event-stream batch shapes
  * (sessionization, tumbling windows) that the streaming module reuses.
  *
  * The "raw" input is simulated deterministically from the events table
  * (stringified fields with planted bad rows keyed off event_id), so the
  * oracle can rebuild the identical input.
  */
object IngestQueries {
  type Q = (SparkSession, String) => DataFrame

  private def rawish(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      when(col("event_id") % 89 === 0, lit(null).cast("string"))
        .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("ts_raw"),
      when(col("event_id") % 97 === 0, lit("bad")).otherwise(col("value").cast("string")).as("value_raw"),
      when(col("event_id") % 83 === 0, lit(null).cast("string")).otherwise(col("event_type")).as("metric_raw"))

  private val rawishSql: String =
    """raw AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 89 = 0 THEN NULL
      |         ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') END AS ts_raw,
      |    CASE WHEN event_id % 97 = 0 THEN 'bad' ELSE CAST(value AS VARCHAR) END AS value_raw,
      |    CASE WHEN event_id % 83 = 0 THEN NULL ELSE event_type END AS metric_raw
      |  FROM events
      |)""".stripMargin

  private val cleanedSql: String = rawishSql +
    """,
      |cleaned AS (
      |  SELECT event_id,
      |    try_strptime(ts_raw, '%Y-%m-%d %H:%M:%S') AS ts,
      |    TRY_CAST(value_raw AS DOUBLE) AS value,
      |    coalesce(metric_raw, 'events_total') AS metric,
      |    CASE WHEN try_strptime(ts_raw, '%Y-%m-%d %H:%M:%S') IS NULL THEN 'invalid_timestamp'
      |         WHEN TRY_CAST(value_raw AS DOUBLE) IS NULL THEN 'invalid_value' END AS warn
      |  FROM raw
      |)""".stripMargin

  val defs: Map[String, Q] = Map(
    // C1-C5: coercion + validation + default-metric fill over messy input.
    "q36_ingest_clean" -> ((s, d) =>
      Ingest.cleanRows(rawish(s, d))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"), col("metric"), col("warn"))
        .orderBy("event_id")),

    // C6: one-pass ingest stats.
    "q37_ingest_stats" -> ((s, d) =>
      Ingest.ingestStats(Ingest.cleanRows(rawish(s, d)))),

    // S5: first-write-wins dedup on a daily key (arrival order = event_id).
    // One window pass computes both the kept row and the group size — the
    // exact shape of the DuckDB oracle below (rn + count over the same
    // partition) — so the plan pays ONE exchange, not the old
    // dedup + groupBy-count + join-back trio.
    "q38_dedup_first_wins" -> ((s, d) => {
      val ev = Tables.cleanEvents(s, d)
        .select(col("source_id"), col("metric"), to_date(col("ts")).as("metric_date"),
          unix_micros(col("ts")).as("ts_us"))
      Relational.firstWriteWinsCounted(ev, Seq("source_id", "metric", "metric_date"), "ts_us")
        .select(col("source_id"), col("metric"), col("metric_date"),
          col("ts_us").as("kept_ts_us"), col("n_rows"))
        .orderBy("source_id", "metric", "metric_date")
    }),

    // Sessionization: 30-minute-gap sessions per user (batch twin of the
    // streaming stateful shape).
    "q39_sessionize" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val gapped = ev.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0))
        .withColumn("session_idx",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      gapped.groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
        .orderBy("user_id", "session_idx")
    }),

    // Tumbling-window aggregation (batch twin of the streaming windowed KPI).
    "q40_window_tumble" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type").as("metric"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
        .select(unix_micros(col("window.start")).as("hour_start_us"), col("metric"),
          col("n"), col("value_sum"))
        .orderBy("hour_start_us", "metric"))
  ,

    // Native session_window sessionization (vs q39's manual lag-island
    // build): the builtin merges events whose 30-min windows overlap — a
    // gap of EXACTLY 30 min starts a new session (q39's `>` keeps it), so
    // the oracle uses >=. The builtin also runs unchanged under Structured
    // Streaming, which the island construction cannot.
    "q70_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
        .select(col("user_id"), unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"), col("value_sum"))
        .orderBy("user_id", "start_us"))
  )

  val oracles: Map[String, String] = Map(
    "q36_ingest_clean" ->
      s"""WITH $cleanedSql
         |SELECT event_id, epoch_us(ts) AS ts_us, value, metric, warn
         |FROM cleaned ORDER BY event_id""".stripMargin,
    "q37_ingest_stats" ->
      s"""WITH $cleanedSql
         |SELECT count(*) AS n_rows,
         |  count(CASE WHEN warn IS NULL THEN 1 END) AS n_valid,
         |  count(warn) AS n_skipped,
         |  epoch_us(min(ts)) AS min_ts_us,
         |  epoch_us(max(ts)) AS max_ts_us,
         |  count(DISTINCT metric) AS n_metrics,
         |  array_to_string(list_sort(list(DISTINCT metric)), ',') AS metrics_list
         |FROM cleaned""".stripMargin,
    "q38_dedup_first_wins" ->
      """WITH ev AS (
        |  SELECT user_id AS source_id, event_type AS metric,
        |    CAST(ts AS DATE) AS metric_date, epoch_ns(ts)//1000 AS ts_us
        |  FROM events
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source_id, metric, metric_date ORDER BY ts_us ASC) AS rn,
        |         count(*) OVER (PARTITION BY source_id, metric, metric_date) AS n_rows
        |  FROM ev
        |)
        |SELECT source_id, metric, metric_date, ts_us AS kept_ts_us, n_rows
        |FROM ranked WHERE rn = 1
        |ORDER BY source_id, metric, metric_date""".stripMargin,
    "q39_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us, value FROM events
        |),
        |gapped AS (
        |  SELECT *, lag(ts_us) OVER w AS prev_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM gapped
        |)
        |SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM sess GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q40_window_tumble" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_start_us,
        |  event_type AS metric, count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q70_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us, value FROM events
        |),
        |gapped AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w >= 30*60*1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM gapped
        |)
        |SELECT user_id, min(ts_us) AS start_us,
        |  max(ts_us) + 30*60*1000000 AS end_us,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM sess GROUP BY user_id, session_idx ORDER BY user_id, start_us""".stripMargin
  )
}
