package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: scan/pruning audit of the persisted-IVF probe plan — verifies
  * the probe reads only probed cell partitions (the scaladoc's pruning
  * claim) and carries no aggregate over the stored index.
  */
object ExplainIvf {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("graft-explain-ivf", cores = 8)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_explain").toString
    val e = graft.core.Tables(spark, "/root/testdata/sf0.1", "embeddings")
    graft.similarity.Similarity.buildIvfIndex(e, numCentroids = 8, iters = 3, path)
    val probe = graft.similarity.Similarity
      .probeIvfIndex(e.filter(col("vec_id") < 5), path, k = 3, nprobe = 2)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    println("== executed plan (cells scan lines) ==")
    plan.linesIterator
      .filter(l => l.contains("cells") || l.contains("PartitionFilters") ||
        l.contains("dynamicpruning") || l.contains("PlanAdaptiveDynamicPruningFilters"))
      .foreach(l => println(l.trim.take(220)))
    println("== full scan count: " + "FileScan".r.findAllIn(plan).length)
    spark.stop()
  }
}
