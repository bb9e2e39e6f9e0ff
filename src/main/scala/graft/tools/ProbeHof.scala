package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe for the interpreted-lambda recompute pathology: times k-gram
  * construction over LONG documents (where O(doc_len^2) is unmissable)
  * with the computed token array (a) inlined by CollapseProject into the
  * transform lambda, vs (b) materialized behind an explode(array(..))
  * Generate barrier. `runMain graft.tools.ProbeHof [nDocs] [docLen]`.
  */
object ProbeHof {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50)
    val docLen = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val spark = graft.core.Graft.localSession("graft-probe-hof")
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val docs = (0 until nDocs).map { i =>
      (i.toLong, (0 until docLen).map(_ => "w" + rng.nextInt(500)).mkString(" "))
    }.toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/probe_hof_docs")
    val pq = spark.read.parquet("/tmp/probe_hof_docs")

    def gramExpr(k: Int) = {
      val parts = (0 until k).map(j => s"__w[i+$j]").mkString(", ")
      when(size(col("__w")) >= k,
        expr(s"transform(sequence(0, size(__w) - $k), i -> concat_ws(' ', $parts))"))
        .otherwise(array().cast("array<string>"))
    }
    def time(label: String)(df: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        println(f"== $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    val k = 5
    time("inlined") {
      pq.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
        .select(col("doc_id"), explode(gramExpr(k)).as("g"))
    }
    // the exact pre-fix q128 shape: intermediate __g projection, then posexplode
    time("old-q128-shape") {
      pq.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
        .select(col("doc_id"), gramExpr(k).as("__g"))
        .select(col("doc_id"), posexplode(col("__g")).as(Seq("start", "gram")))
    }
    time("barrier") {
      pq.select(col("doc_id"), explode(array(split(trim(col("text")), "\\s+"))).as("__w"))
        .select(col("doc_id"), explode(gramExpr(k)).as("g"))
    }
    println("-- inlined plan:")
    pq.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
      .select(col("doc_id"), explode(gramExpr(k)).as("g"))
      .explain("formatted")
    println("-- old-q128-shape plan:")
    pq.select(col("doc_id"), split(trim(col("text")), "\\s+").as("__w"))
      .select(col("doc_id"), gramExpr(k).as("__g"))
      .select(col("doc_id"), posexplode(col("__g")).as(Seq("start", "gram")))
      .explain("formatted")
    spark.stop()
  }
}
