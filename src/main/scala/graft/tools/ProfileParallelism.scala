package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment: decompose q44's cost — AQE byte-based coalescing of the
  * tiny-but-CPU-heavy groupByKey shuffle, and the global sort re-running the
  * fit stage for range-partitioner sampling. Single session, runtime conf
  * toggles, interleaved runs so JIT warmth doesn't bias one config.
  */
object ProfileParallelism {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.localSession("graft-par")
    graft.core.Tables(spark, dir, "events").count()
    val md = graft.operators.DailyKpi.aggregate(graft.core.Tables.cleanEvents(spark, dir))
    val mdValue = md.select(col("source_id"), col("metric"), col("metric_date"),
      col("value_sum").as("value"))
    def fits: DataFrame = graft.anomaly.AnomalyService.iforestScores(mdValue).toDF()
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JIT warmup
    fits.queryExecution.toRdd.count()
    for (round <- 1 to 2; coalesce <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      time(s"r$round coalesce=$coalesce nosort")(fits)
      time(s"r$round coalesce=$coalesce sorted")(
        fits.orderBy("source_id", "metric", "metric_date"))
      time(s"r$round coalesce=$coalesce persist+sorted") {
        val f = fits.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.orderBy("source_id", "metric", "metric_date")
      }
    }
    for (minSize <- Seq("64k", "1m")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", minSize)
      time(s"minPartitionSize=$minSize nosort")(fits)
    }
    spark.stop()
  }
}
