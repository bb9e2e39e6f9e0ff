package graft

import graft.store.Store
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def events(days: Int) = (0 until days).flatMap { d =>
    (0 until 3).map(h =>
      (1L, java.sql.Timestamp.valueOf(s"2025-09-${"%02d".format(d + 1)} 0$h:00:00"), "m", 1.0 + d))
  }.toDF("source_id", "ts", "metric", "value")

  test("date-partitioned clean store prunes partitions on date filters") {
    val path = Files.createTempDirectory("graft_store").toString + "/clean"
    Store.writeCleanEvents(events(5), path)
    val filtered = Store.readCleanEvents(spark, path)
      .filter(col("event_date") === "2025-09-03")
    assert(Store.prunesPartitions(filtered), "date filter must reach PartitionFilters")
    assert(filtered.count() == 3)
  }

  test("dynamic partition overwrite touches only recomputed dates") {
    val base = Files.createTempDirectory("graft_store2").toString + "/md"
    val v1 = Seq(
      (java.sql.Date.valueOf("2025-09-01"), 1L, "m", 10.0),
      (java.sql.Date.valueOf("2025-09-02"), 1L, "m", 20.0))
      .toDF("metric_date", "source_id", "metric", "value_sum")
    Store.overwriteMetricDaily(v1, base)
    // recompute only 09-02 with a new value; 09-01 must survive
    val v2 = Seq((java.sql.Date.valueOf("2025-09-02"), 1L, "m", 99.0))
      .toDF("metric_date", "source_id", "metric", "value_sum")
    Store.overwriteMetricDaily(v2, base)
    val out = spark.read.parquet(base).orderBy("metric_date").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("value_sum") == 10.0)
    assert(out(1).getAs[Double]("value_sum") == 99.0)
  }
}
