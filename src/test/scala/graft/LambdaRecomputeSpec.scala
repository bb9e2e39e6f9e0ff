package graft

import org.apache.spark.sql.DataFrame

/** Regression guard for the interpreted-lambda recompute pathology (the
  * round-8 q128 defect; see [[graft.core.Eval]] for the two Catalyst
  * mechanisms). LONG documents make O(doc_len²) expression re-evaluation
  * unmissable: at 4,000 words/doc the pre-fix q128 gram stage measured
  * ~58 s on 32 cores, while the linear shapes finish in ~1-5 s on the
  * 4-core test session — so a generous wall budget separates the two
  * regimes by an order of magnitude in each direction and CI noise cannot
  * flip the verdict. sf-dir data can NOT catch this class of bug: its
  * documents average ~50 words, where quadratic ≈ linear.
  *
  * Every gram/token operator that binds a computed token array ahead of a
  * lambda or explode is probed end-to-end here; an accidentally-inlined
  * tokenizer can never land silently again.
  */
class LambdaRecomputeSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 40
  private val docLen = 4000

  // through parquet, not a LocalRelation: ConvertToLocalRelation would
  // otherwise evaluate projections driver-side during optimization and
  // blur what the probe times
  private lazy val longDocs: DataFrame = {
    val path = sys.props("java.io.tmpdir") + "/graft_longdocs_p" +
      ProcessHandle.current().pid()
    val rng = new scala.util.Random(7)
    (0 until nDocs).map { i =>
      (i.toLong, (0 until docLen).map(_ => "w" + rng.nextInt(400)).mkString(" "))
    }.toDF("doc_id", "text").write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Full-materialization wall clock with a linear-regime budget. */
  private def within(budgetSec: Int, df: => DataFrame): Unit = {
    val plan = df
    val t0 = System.nanoTime()
    val rows = plan.queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(rows > 0L, "probe produced no rows")
    assert(dt < budgetSec,
      f"took $dt%.1f s — over the $budgetSec s linear-regime budget: a computed " +
        "array is being re-evaluated inside a lambda body or an inferred " +
        "Generate filter (see graft.core.Eval.materialized)")
  }

  test("removeDuplicatedSpans stays linear on long documents") {
    within(30, graft.text.TextOps.removeDuplicatedSpans(longDocs, span = 5))
  }

  test("wordShingles stays linear on long documents") {
    within(30, graft.dedup.Dedup.wordShingles(longDocs, n = 5))
  }

  test("bigramNll stays linear on long documents") {
    within(30, graft.text.TextOps.bigramNll(longDocs))
  }

  test("trigramBackoffNll stays linear on long documents") {
    within(45, graft.text.TextOps.trigramBackoffNll(longDocs))
  }

  test("dupNgramStats stays linear on long documents") {
    within(30, graft.text.TextOps.dupNgramStats(longDocs, n = 3))
  }

  test("chunkDocuments stays linear on long documents") {
    within(30, graft.text.TextOps.chunkDocuments(longDocs, chunkSize = 32, overlap = 4))
  }

  test("languageId stays linear on long documents") {
    within(30, graft.text.TextOps.languageId(longDocs))
  }
}
