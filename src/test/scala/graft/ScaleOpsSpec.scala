package graft

import graft.operators.{DailyKpi, Skew}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation on algebraic measures") {
    val events = graft.core.Tables.cleanEvents(spark, "/root/testdata/sf0.001")
    val plain = events.groupBy("metric").agg(
      sum("value").as("p_sum"), count(lit(1)).as("p_cnt"),
      min("value").as("p_min"), max("value").as("p_max"))
    val salted = Skew.saltedDailyAgg(events, Seq("metric"), "value", saltBuckets = 16)
    val j = plain.join(salted, "metric").collect()
    assert(j.length == 5)
    j.foreach { r =>
      assert(math.abs(r.getAs[Double]("p_sum") - r.getAs[Double]("value_sum")) < 1e-6)
      assert(r.getAs[Long]("p_cnt") == r.getAs[Long]("value_count"))
      assert(r.getAs[Double]("p_min") == r.getAs[Double]("value_min"))
      assert(r.getAs[Double]("p_max") == r.getAs[Double]("value_max"))
    }
  }

  test("salted join equals plain inner join, including duplicate key rows") {
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (1L, "a"))
      .toDF("k", "lv") // dup key rows AND a fully duplicate row
    val right = Seq((1L, 10.0), (2L, 20.0), (4L, 40.0)).toDF("k", "rv")
    val plain = left.join(right, "k")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", saltBuckets = 4)
      .select("k", "lv", "rv") // align column order with the plain join
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("approx percentile tracks exact percentile within its accuracy bound") {
    val events = graft.core.Tables.cleanEvents(spark, "/root/testdata/sf0.001")
    val r = events.agg(
      expr("percentile(value, 0.5)").as("exact"),
      expr("approx_percentile(value, 0.5, 1000)").as("approx")).collect().head
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / math.max(math.abs(exact), 1e-9) < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx distinct tracks exact distinct within rsd bounds") {
    val events = graft.core.Tables.cleanEvents(spark, "/root/testdata/sf0.001")
    val exact = DailyKpi.aggregate(events, Some("ts"))
      .agg(sum("value_distinct")).as[Long].head()
    val approx = DailyKpi.aggregateApprox(events, "ts", rsd = 0.05)
      .agg(sum("value_distinct")).as[Long].head()
    val rel = math.abs(approx.toDouble - exact) / exact
    assert(rel < 0.10, s"approx $approx vs exact $exact (rel $rel)")
  }
}
