package graft.core

/** Driver-side overlap of INDEPENDENT store-maintenance sections (guide
  * §2.6, "Overlap independent jobs"): Spark's scheduler happily runs jobs
  * submitted from several driver threads at once, and the composed
  * lifecycle gates here are chains of small jobs over tiny per-family
  * frames — run sequentially they leave most of the cluster idle while
  * each family's next job is planned/committed. Submitting independent
  * families from a small thread pool lets one family's tasks back-fill
  * the slack of another's scheduling/FS gaps.
  *
  * Use ONLY for sections that touch DISJOINT stores (the single-maintainer
  * lock is per store root and reentrant per thread — two sections on one
  * store would refuse, loudly). Results are unchanged by construction:
  * each section is internally sequential, sections share no mutable state,
  * and FIFO scheduling just interleaves their independent jobs.
  *
  * Error discipline: the first failing section's ORIGINAL throwable is
  * rethrown (not wrapped in ExecutionException) so the stores' loud-refusal
  * contracts (IllegalStateException messages pinned by tests) surface
  * unchanged; remaining sections still run to completion before the
  * rethrow so no store is left with a silently-skipped maintenance step
  * a later section already depends on.
  */
object Par {
  /** [[sections]] over Int-returning thunks, summing the results — the
    * "how many dirs compacted" convention of the store compactions.
    */
  def sumSections(thunks: (() => Int)*): Int = {
    val acc = new java.util.concurrent.atomic.AtomicInteger(0)
    sections(thunks.map(t => () => { acc.addAndGet(t()); () }): _*)
    acc.get()
  }

  def sections(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var first: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (first == null) first = e.getCause
          case e: Throwable => if (first == null) first = e
        }
      }
      if (first != null) throw first
    } finally pool.shutdown()
  }
}
