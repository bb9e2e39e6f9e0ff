package graft.tools

/** Ad-hoc query inspector: `runMain graft.tools.ShowQuery <sfDir> <query> [n]`
  * — runs one registry query and prints the first n rows (default 20).
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = if (args.length > 1) args(1) else "q01_pricing_summary"
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = graft.core.Graft.localSession("graft-show")
    graft.SparkEntry.queries(name)(spark, dir).show(n, truncate = false)
    spark.stop()
  }
}
