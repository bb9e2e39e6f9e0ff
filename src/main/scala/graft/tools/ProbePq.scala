package graft.tools

import org.apache.spark.sql.functions._

/** PQ config sweep: recall vs brute force per (m, k) on the sf dir, in the
  * q106 gate shape (100 queries, k=3). `runMain graft.tools.ProbePq [sfDir...]`.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = graft.core.Graft.localSession("graft-probe-pq", cores = 8)
    for (sfDir <- dirs) {
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val q = e.filter(col("vec_id") < 100)
      val truth = graft.similarity.Similarity.cosineTopK(e, q, k = 3)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((m, k) <- Seq((4, 8), (8, 16))) {
        val cb = graft.similarity.Similarity.pqCodebooks(e, m, k, iters = 2)
        val got = graft.similarity.Similarity
          .pqAdcTopK(graft.similarity.Similarity.pqEncode(e, cb, m), cb, q, k = 3, m = m)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"== $sfDir m=$m k=$k recall@3(100q) ${(truth & got).size.toDouble / truth.size}%.3f")
      }
    }
    spark.stop()
  }
}
