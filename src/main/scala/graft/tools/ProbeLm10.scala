package graft.tools

import org.apache.spark.sql.functions._

/** Quick check of the bench's lm10 probe-vs-refit measurement in isolation:
  * `runMain graft.tools.ProbeLm10 [sfDir]`.
  */
object ProbeLm10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.localSession("graft-probe-lm10")
    val lmDir = java.nio.file.Files.createTempDirectory("graft_probe_lm10").toString
    graft.core.Tables(spark, sfDir, "documents")
      .crossJoin(spark.range(10).select(col("id").as("__r")))
      .select((col("doc_id") * 10 + col("__r")).as("doc_id"),
        concat_ws(" ", col("text"), concat_ws("", lit("rep"), col("__r"))).as("text"))
      .write.mode("overwrite").parquet(s"$lmDir/docs")
    val docs10 = spark.read.parquet(s"$lmDir/docs")
    def clock(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"== $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    clock("lm10_build")(graft.text.TextOps.saveLm(docs10, s"$lmDir/lm"))
    val batch = docs10.filter(col("doc_id") % 10 === 0)
    for (i <- 1 to 2) {
      clock(s"lm10_probe run$i")(graft.text.TextOps.scoreWithLm(batch, s"$lmDir/lm")
        .queryExecution.toRdd.count())
      clock(s"lm10_probe_refit run$i")(graft.text.TextOps.trigramBackoffNllAgainst(batch, docs10)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
