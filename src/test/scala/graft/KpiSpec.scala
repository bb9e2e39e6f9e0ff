package graft

import graft.operators.DailyKpi
import org.apache.spark.sql.functions._

/** Golden cases from the reference test suite (FIXTURES.md §2, §3):
  * `backend/tests/uat/test_metrics_daily_aggregations_ua.py:26-71` and
  * `backend/tests/kpi_metrics_engine/test_kpi_variants.py:48-85`.
  */
class KpiSpec extends SparkSpec {
  import spark.implicits._

  test("minimum slice: same-day pair {4,5} => sum=9, avg=4.5, count=2") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-09-20 00:00:00"), "events_total", 4.0),
      (1L, java.sql.Timestamp.valueOf("2025-09-20 10:00:00"), "events_total", 5.0))
      .toDF("source_id", "ts", "metric", "value")
    val md = DailyKpi.aggregate(events).collect()
    assert(md.length == 1)
    val r = md.head
    assert(r.getAs[Double]("value_sum") == 9.0)
    assert(r.getAs[Double]("value_avg") == 4.5)
    assert(r.getAs[Long]("value_count") == 2L)
  }

  test("incremental merge of daily aggregates == aggregating the union of events") {
    def ev(day: String, vals: Double*) = vals.zipWithIndex.map { case (v, i) =>
      (1L, java.sql.Timestamp.valueOf(s"$day 0$i:00:00"), "m", v)
    }
    val batch1 = (ev("2025-09-20", 1.0, 2.0) ++ ev("2025-09-21", 3.0))
      .toDF("source_id", "ts", "metric", "value")
    val batch2 = (ev("2025-09-21", 5.0) ++ ev("2025-09-22", 7.0))
      .toDF("source_id", "ts", "metric", "value")
    val merged = DailyKpi.mergeDaily(DailyKpi.aggregate(batch1), DailyKpi.aggregate(batch2))
      .orderBy("metric_date").collect()
    val direct = DailyKpi.aggregate(batch1.unionByName(batch2))
      .orderBy("metric_date").collect()
    assert(merged.length == direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getAs[java.sql.Date]("metric_date") == d.getAs[java.sql.Date]("metric_date"))
      assert(m.getAs[Double]("value_sum") == d.getAs[Double]("value_sum"))
      assert(m.getAs[Long]("value_count") == d.getAs[Long]("value_count"))
      assert(m.getAs[Double]("value_avg") == d.getAs[Double]("value_avg"))
    }
  }

  test("per-day counts [3,2]; distinct ts == count for unique timestamps") {
    val rows = (0 until 3).map(i => (7L, java.sql.Timestamp.valueOf(s"2025-01-01 00:0$i:00"), "m", 1.0)) ++
      (0 until 2).map(i => (7L, java.sql.Timestamp.valueOf(s"2025-01-02 00:0$i:00"), "m", 1.0))
    val md = DailyKpi.aggregate(rows.toDF("source_id", "ts", "metric", "value"), Some("ts"))
      .orderBy("metric_date").collect()
    assert(md.map(_.getAs[Long]("value_count")).toSeq == Seq(3L, 2L))
    assert(md.forall(r => r.getAs[Long]("value_distinct") == r.getAs[Long]("value_count")))
  }

  test("value fallback chain honors falsy 0.0 (python `or` semantics)") {
    val md = Seq((1L, "m", java.sql.Date.valueOf("2025-01-01"), 0.0, 2.5, 3L))
      .toDF("source_id", "metric", "metric_date", "value_sum", "value_avg", "value_count")
    val v = md.withColumn("value", DailyKpi.valueFallback(
      Seq(col("value_sum"), col("value_avg"), col("value_count").cast("double"))))
      .select("value").as[Double].head()
    assert(v == 2.5) // 0.0 sum falls through to avg
  }
}
