package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table layout for the persistent stores (SURVEY.md §4: the reference's
  * secondary indexes map to partition layout + parquet min/max skipping).
  *
  * clean_events partitions by event date: date-range queries prune whole
  * partitions before any I/O (the `PartitionFilters` line in the plan), and
  * the daily KPI recompute overwrites exactly the touched date partitions
  * (dynamic partition overwrite) — the Spark-native equivalent of the
  * reference's keyed upserts. At 100 TB add a second level (e.g. bucket by
  * source_id) so per-source scans prune further; the API stays the same.
  */
object Store {

  /** Append clean events, partitioned by UTC event date. */
  def writeCleanEvents(events: DataFrame, path: String): Unit =
    events.withColumn("event_date", to_date(col("ts")))
      .write.mode("append").partitionBy("event_date").parquet(path)

  def readCleanEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Overwrite only the partitions present in `metricDaily` (dynamic mode). */
  def overwriteMetricDaily(metricDaily: DataFrame, path: String): Unit = {
    val spark = metricDaily.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try metricDaily.write.mode("overwrite").partitionBy("metric_date").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** True when a date-filtered scan of `df` prunes partitions (plan audit). */
  def prunesPartitions(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []"))
}
