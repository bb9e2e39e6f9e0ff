package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measure multi-table LSH mean recall@3 against brute-force
  * truth on the 100-query sample across (tables, bits) configs — the
  * evidence behind q114's tuned 16x5 config and its 0.6 floor.
  */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("graft-tune-lsh", cores = 16)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val e = graft.core.Tables(spark, d, "embeddings")
      val brute = graft.similarity.Similarity
        .cosineTopK(e, e.filter(col("vec_id") < 100), 3)
        .select(col("query_id"), col("neighbor_id"))
      val nb = brute.count()
      for ((tables, bits) <- Seq((4, 6), (8, 6), (16, 6), (8, 5), (16, 5), (16, 4))) {
        val lsh = graft.similarity.Similarity
          .lshMultiTopKSearch(e, e.filter(col("vec_id") < 100),
            k = 3, bits = bits, tables = tables, dim = 64)
          .select(col("query_id"), col("neighbor_id"))
        val hits = lsh.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
        println(f"== $d tables=$tables bits=$bits recall@3=${hits.toDouble / nb}%.3f")
      }
    }
    spark.stop()
  }
}
