package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Where does a composed lifecycle gate's wall-clock go?
  * `runMain graft.tools.ProfileGate <sfDir> <query...>` — runs each named
  * registry query once warm, with a listener decomposing the wall time into
  * (a) Spark job time (per-job wall, call site, task count) and (b) the
  * driver-side gaps between jobs (planning, FS metadata ops, commit). The
  * gate tier's cost is dominated by fixed overheads at bench scale, so the
  * gap share tells whether to attack FS ops / planning vs task execution.
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q196_pipeline_v4_cycle2")
    val spark = graft.core.Graft.localSession("graft-profile")
    graft.core.Tables.all.foreach(t =>
      try graft.core.Tables(spark, dir, t).count() catch { case _: Throwable => () })

    case class Job(id: Int, t0: Long, @volatile var t1: Long = 0L, site: String = "",
                   var tasks: Int = 0, var taskMs: Long = 0L) {
      @volatile var done: Boolean = false
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val j = Job(e.jobId, System.nanoTime(), site = site)
        jobs.put(e.jobId, j); order.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) { j.t1 = System.nanoTime(); j.done = true }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }

    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      // warm run (JIT + codegen cache for this plan family)
      fn(spark, dir).queryExecution.toRdd.count()
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      val w1 = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let listener drain
      val js = order.toArray(Array.empty[Job]).filter(_.done).sortBy(_.t0)
      val jobWall = js.map(j => (j.t1 - j.t0) / 1e9)
      val wall = (w1 - w0) / 1e9
      // driver gap = wall minus the union of job intervals (jobs can
      // overlap). Seeded-boolean scan, not sign sentinels: nanoTime() has
      // no sign guarantee (r17 ADVICE).
      val ivs = js.map(j => (j.t0, j.t1)).sortBy(_._1)
      var covered = 0L; var curS = 0L; var curE = 0L; var seeded = false
      for ((s, e) <- ivs) {
        if (!seeded || s > curE) {
          if (seeded) covered += curE - curS
          curS = s; curE = e; seeded = true
        }
        else if (e > curE) curE = e
      }
      if (seeded) covered += curE - curS
      println(f"== $n wall ${wall}%.2f s, jobs ${js.length}, job-covered ${covered / 1e9}%.2f s, driver-gap ${wall - covered / 1e9}%.2f s")
      val bySite = js.groupBy(_.site).map { case (s, g) =>
        (s, g.length, g.map(j => (j.t1 - j.t0) / 1e9).sum)
      }.toSeq.sortBy(-_._3)
      for ((site, cnt, tot) <- bySite.take(25))
        println(f"   $tot%7.2f s  x$cnt%-4d $site")
      val top = js.sortBy(j => -(j.t1 - j.t0)).take(12)
      for (j <- top)
        println(f"   job ${j.id}%4d ${(j.t1 - j.t0) / 1e9}%6.2f s  ${j.site}")
    }
    spark.stop()
  }
}
