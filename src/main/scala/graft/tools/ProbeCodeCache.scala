package graft.tools

/** Root-cause probe for the r9 q94 drift (BENCH_r09: triple [1.98, 4.18,
  * 41.5] with min == r8's steady 2.0 s — the code did not get slower, the
  * SESSION did as it aged). Hypothesis: 154 queries x 3 runs of generated
  * whole-stage-codegen classes fill the JVM code cache (default
  * ReservedCodeCacheSize = 240 MB on JDK 17); once full, the JIT stops
  * compiling and q94's per-series isolation-forest loops — the most
  * driver/executor CPU-bound Scala in the suite — fall back to the
  * interpreter at 2-20x cost.
  *
  * `runMain graft.tools.ProbeCodeCache <warmSfDir> <timeSfDir>`: runs every
  * registered query once at `warmSfDir` (sf0.01 — cheap rows, same
  * generated-class volume), then times q94 3x at `timeSfDir`, printing
  * code-cache pool usage along the way. Compare a default-JVM run against
  * `-XX:ReservedCodeCacheSize=512m`.
  */
object ProbeCodeCache {
  private def codeCache(): String = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map { p =>
        val u = p.getUsage
        f"${p.getName}: ${u.getUsed / 1e6}%.0f/${u.getMax / 1e6}%.0f MB"
      }.mkString("; ")
  }

  def main(args: Array[String]): Unit = {
    val warmDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val timeDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.localSession("graft-codecache")
    println(s"[probe] start: ${codeCache()}")
    graft.core.Tables.all.foreach(t =>
      try graft.core.Tables(spark, warmDir, t).count() catch { case _: Throwable => () })
    val t94 = () => {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q94_iforest_router")(spark, timeDir)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] q94 fresh-session: ${t94()}%.2f s  (${codeCache()})")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try fn(spark, warmDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"[probe] $n failed: ${e.getClass.getSimpleName}") }
    }
    println(s"[probe] after full sweep: ${codeCache()}")
    (1 to 3).foreach(i => println(f"[probe] q94 aged-session run$i: ${t94()}%.2f s  (${codeCache()})"))
    spark.stop()
  }
}
