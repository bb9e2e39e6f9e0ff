package graft.tools

/** Dev tool: exchange/scan audit for the corpus-curation + sketch queries. */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("graft-explain", cores = 4)
    val d = "/root/testdata/sf0.001"
    val dflt = Seq("q95_unigram_nll", "q96_dup_ngrams", "q97_domain_rebalance",
      "q98_length_trim", "q100_doc_chunks", "q101_bigram_nll", "q102_quality_sample",
      "q103_hist_quantiles", "q105_subword_invariants", "q106_ann_recall",
      "q107_ann_ivf_nprobe", "q108_ann_recall_nprobe", "q109_trigram_backoff",
      "q110_ann_recall_lsh", "q111_ann_recall_lshmulti", "q112_ann_ivf_store",
      "q113_subword_store", "q114_ann_recall_lshtuned", "q115_pipeline_e2e",
      "q116_bpe_invariants", "q117_ann_lsh_store", "q118_bloom_decontam")
    for (q <- if (args.nonEmpty) args.toSeq else dflt) {
      val p = graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(p).length
      val nScan = "FileScan".r.findAllIn(p).length
      val schemas = p.split("\n").filter(_.contains("ReadSchema")).map(_.trim.take(160))
      println(s"== $q: exchanges=$nEx scans=$nScan")
      schemas.foreach(s => println(s"   $s"))
    }
    spark.stop()
  }
}
