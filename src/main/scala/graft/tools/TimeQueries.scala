package graft.tools
/** Ad-hoc per-query timing harness: `runMain graft.tools.TimeQueries <sfDir> <query...>`
  * — warms the table scans, then runs each named query twice (cold/warm). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q25_dedup_ngram")
    val spark = graft.core.Graft.localSession("graft-time")
    graft.core.Tables.all.foreach(t => try graft.core.Tables(spark, dir, t).count() catch { case _: Throwable => () })
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      val t1 = System.nanoTime()
      // full-materialization timing: toRdd fixes the optimized plan BEFORE
      // the count, so no aggregate-value/projection pruning
      graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"== $n run$i count ${(t1-t0)/1e9}%.2f s, full ${(t2-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
