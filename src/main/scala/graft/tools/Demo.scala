package graft.tools

import graft.api.GraftApi
import graft.operators.DailyKpi
import org.apache.spark.sql.functions._

/** End-to-end walkthrough of the engine over the bundled testdata — the
  * "switching from the reference" story in one runnable main:
  * ingest -> partitioned store -> KPI cube -> anomalies -> forecast ->
  * reliability -> dedup/similarity summaries.
  *
  * Run: `sbt "runMain graft.tools.Demo [sfDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Graft.localSession("graft-demo")
    val base = java.nio.file.Files.createTempDirectory("graft_demo").toString

    // 1. ingest events into the date-partitioned clean store
    val events = graft.core.Tables.cleanEvents(spark, sfDir)
    graft.store.Store.writeCleanEvents(events, s"$base/clean")
    println(s"[demo] ingested ${events.count()} events into $base/clean")

    // 2. KPI cube, persisted with dynamic partition overwrite
    val md = DailyKpi.aggregate(events)
    graft.store.Store.overwriteMetricDaily(md, s"$base/metric_daily")
    println(s"[demo] metric_daily: ${md.count()} rows, " +
      s"${md.select("metric").distinct().count()} metrics")

    // 3. the API facade over the stores
    val sources = md.select(col("source_id").as("id")).distinct()
      .withColumn("name", concat(lit("src-"), col("id")))
    val api = new GraftApi(sources, spark.read.parquet(s"$base/metric_daily"))
    val firstSource = sources.orderBy("id").select("name").collect().head.getString(0)
    val firstMetric = api.metricNames().collect().head.getString(0)
    println(s"[demo] querying $firstSource / $firstMetric")
    api.metricsDaily(firstSource, firstMetric, limit = Some(3)).show(3, false)
    val anomalies = api.anomalyRolling(firstSource, firstMetric).filter(col("is_outlier"))
    println(s"[demo] rolling-z anomalies: ${anomalies.count()}")
    api.forecastDaily(firstSource, firstMetric).show(7, false)
    api.reliability(firstSource, firstMetric).show(false)

    // 4. corpus curation over documents/embeddings
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val nearDups = graft.dedup.Dedup.ngramJaccardPairs(
      graft.dedup.Dedup.wordShingles(docs, 3), threshold = 0.6, maxDf = 5)
    println(s"[demo] near-duplicate pairs (jaccard>=0.6): ${nearDups.count()}")
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    graft.similarity.Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 3), k = 3)
      .show(9, false)

    // 5. event enrichment + curation extras
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("value").as("last_err_value"))
    val enriched = graft.operators.AsofJoin.backward(
      clicks, errors, Seq("user_id"), "ts_us", "ts_us")
    println(s"[demo] clicks enriched with latest preceding error: ${enriched.count()}")
    val nextClick = graft.operators.AsofJoin.forward(
      errors.select(col("user_id"), col("ts_us"), col("last_err_value")),
      clicks.select(col("user_id"), col("ts_us"), col("event_id").as("next_click_id")),
      Seq("user_id"), "ts_us", "ts_us")
    println(s"[demo] errors matched to their next click: ${nextClick.count()}")
    val clusters = graft.queries.AnalyticsQueries.connectedComponentsAlternating(nearDups)
    println(s"[demo] near-dup clusters (alternating-star CC): " +
      s"${clusters.select(col("cluster_id")).distinct().count()}")
    println("[demo] top TF-IDF terms of doc 0:")
    graft.text.TextOps.tfidf(docs).filter(col("doc_id") === 0)
      .orderBy(col("tfidf").desc, col("term")).show(3, false)
    val bucket = graft.dedup.Dedup.hex60(concat_ws(":", col("event_id"), col("user_id"))) % 100
    ev.withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("split").count().orderBy("split").show(false)

    println("[demo] done")
    spark.stop()
  }
}
