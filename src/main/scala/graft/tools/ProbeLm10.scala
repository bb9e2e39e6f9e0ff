package graft.tools

import org.apache.spark.sql.functions._

/** Quick check of the bench's lm10 probe-vs-refit measurement in isolation:
  * `runMain graft.tools.ProbeLm10 [sfDir]`.
  */
object ProbeLm10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.localSession("graft-probe-lm10")
    // the same corpus construction the bench times — shared builder so
    // this isolation check can never measure a different corpus
    val (docs10, lmDir) = graft.Bench.lm10Corpus(spark, sfDir)
    def clock(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"== $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    try {
      clock("lm10_build")(graft.text.TextOps.saveLm(docs10, s"$lmDir/lm"))
      val batch = docs10.filter(col("doc_id") % 10 === 0)
      for (i <- 1 to 2) {
        clock(s"lm10_probe run$i")(graft.text.TextOps.scoreWithLm(batch, s"$lmDir/lm")
          .queryExecution.toRdd.count())
        clock(s"lm10_probe_refit run$i")(graft.text.TextOps.trigramBackoffNllAgainst(batch, docs10)
          .queryExecution.toRdd.count())
      }
    } finally {
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lmDir))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
