package graft.tools

/** Dev tool: plan-shape audit for the round-9 span-removal rework —
  * counts Window operators (the span leads must share ONE window spec)
  * and prints the operator skeleton.
  */
object ExplainSpan {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("graft-explain-span", cores = 4)
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (q <- Seq("q128_span_removal", "q129_span_removal_wide")) {
      val p = graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val nWin = "\\bWindow\\b".r.findAllIn(p).length
      val nEx = "Exchange".r.findAllIn(p).length
      println(s"== $q: windows=$nWin exchanges=$nEx")
      p.split("\n").filter(l => l.contains("Window") || l.contains("Exchange") ||
        l.contains("Generate") || l.contains("HashAggregate") || l.contains("Sort"))
        .foreach(l => println("   " + l.trim.take(140)))
    }
    spark.stop()
  }
}
