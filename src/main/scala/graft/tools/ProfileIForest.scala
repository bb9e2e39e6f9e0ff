package graft.tools

/** Ad-hoc micro-profiler for the router iforest path: times N synthetic
  * series through routerScoreSeries variants to locate q94's cost.
  */
object ProfileIForest {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toInt).getOrElse(2000)
    val pts = if (args.length > 1) args(1).toInt else 11
    val series = Array.tabulate(nSeries)(i => Array.tabulate(pts)(j => (i * 31 + j * 7 % 13).toDouble))
    // warmup
    series.take(200).foreach(v => graft.anomaly.AnomalyService.routerScoreSeries(v))
    var t0 = System.nanoTime()
    series.foreach(v => graft.anomaly.AnomalyService.routerScoreSeries(v))
    println(f"default fit: ${(System.nanoTime() - t0) / 1e9}%.2f s for $nSeries series of $pts pts")
    t0 = System.nanoTime()
    series.foreach { v =>
      graft.anomaly.AnomalyService.routerScoreSeries(v, 0.9)
      graft.anomaly.AnomalyService.routerScoreSeries(v, 0.5)
      graft.anomaly.AnomalyService.routerScoreSeries(v, 0.0)
      graft.anomaly.AnomalyService.routerScoreSeries(v, 0.001)
    }
    println(f"clamp x4:   ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    series.foreach { v =>
      graft.anomaly.AnomalyService.routerScoreSeries(v, method = "rolling_z")
    }
    println(f"rolling_z:  ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
