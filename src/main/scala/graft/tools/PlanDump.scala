package graft.tools

/** Deliverable helper: write `.explain("formatted")` for named registry
  * queries to files. `runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <query...>`
  * writes `<outDir>/<query>_<tag>.txt`. Gate queries execute their store
  * maintenance while the final frame is constructed — that is the cost of
  * explaining them; the dumped plan is the final served frame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <tag> <query...>")
    val (dir, outDir, tag) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val spark = graft.core.Graft.localSession("graft-plandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
