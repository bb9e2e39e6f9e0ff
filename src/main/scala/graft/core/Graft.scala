package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session factory for the graft engine.
  *
  * Everything is UTC end-to-end (reference normalizes all timestamps to UTC:
  * `backend/app/services/ingestion.py:165-166`, daily bucketing UTC at
  * `backend/app/services/kpi.py:50`).
  */
object Graft {

  /** Local session tuned for the test container: `local[n]`, shuffle
    * partitions sized to cores (not the 200 default — at 100 TB you would
    * instead size to ~2-3x total executor cores / rely on AQE coalescing,
    * which is enabled here for exactly that reason).
    */
  def localSession(appName: String = "graft", cores: Int = 32): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Canonical table loaders over the driver-provided parquet layout
  * (`/root/repo/TESTDATA.md`): one parquet per table under a scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 refuses to read natively; read nanos as LONG and truncate to
    * microseconds (matching DuckDB's `CAST(ts_ns AS TIMESTAMP)`).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The reference's canonical fact table `clean_events(source_id, ts, metric,
    * value)` (`backend/app/models/clean_event.py:8-23`), mapped from the
    * driver's `events` table: user_id -> source_id, event_type -> metric.
    */
  def cleanEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("user_id").as("source_id"),
      col("ts"),
      col("event_type").as("metric"),
      col("value"))
}
