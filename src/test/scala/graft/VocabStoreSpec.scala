package graft

import graft.text.{Bpe, Subword, Unigram, VocabStore}
import org.apache.spark.sql.DataFrame

/** Lifecycle drill for the refresh-managed tokenizer vocabularies: the
  * fingerprint no-op gate, retrain-on-move, retrain-on-param-change,
  * legacy (unstamped) store handling, and the torn-swap heal — the
  * moving-corpus contract the registry gates at the tokenization level
  * (q206), drilled here per family and per crash window.
  */
class VocabStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpusA = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cats sat on the mats"),
    (2L, "a catalog of cats and mats"),
    (3L, "the the the cat cat mat"),
    (4L, "on and on and on a mat")
  ).toDF("doc_id", "text")

  // one doc removed, one revised, one added — the snapshot-B move shape
  private def corpusB = Seq(
    (0L, "the cat sat on the mat"),
    (2L, "a catalog of cats and mats revised"),
    (3L, "the the the cat cat mat"),
    (4L, "on and on and on a mat"),
    (5L, "dogs dig and dogs nap")
  ).toDF("doc_id", "text")

  private lazy val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
  private def tmp(tag: String): String = {
    val p = sys.props("java.io.tmpdir") + s"/graft_vocabstore_${tag}_p" +
      ProcessHandle.current().pid()
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private val families: Seq[(String, (DataFrame, String) => Boolean)] = Seq(
    ("subword", (d, p) => VocabStore.refreshSubword(d, size = 24, maxPieceLen = 4, p)),
    ("bpe", (d, p) => VocabStore.refreshBpe(d, numMerges = 12, p)),
    ("unigram", (d, p) => VocabStore.refreshUnigram(d, size = 20, maxPieceLen = 4, p)))

  for ((name, refresh) <- families)
    test(s"$name refresh: trains once, exact no-op while unmoved, retrains on move") {
      val p = tmp(name)
      assert(refresh(corpusA, p), "first refresh must train")
      val trained = fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
      assert(!refresh(corpusA, p), "unmoved corpus must be a no-op")
      val after = fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
      assert(after == trained, "a no-op must not touch a single file")
      assert(refresh(corpusB, p), "moved corpus must retrain")
      assert(!refresh(corpusB, p), "and then settle back to no-ops")
    }

  test("subword: refreshed store tokenizes like an in-memory fit on the moved corpus") {
    val p = tmp("subgate")
    VocabStore.refreshSubword(corpusA, size = 24, maxPieceLen = 4, p)
    VocabStore.refreshSubword(corpusB, size = 24, maxPieceLen = 4, p)
    val gate = Subword.storedVocabGate(corpusB, size = 24, maxPieceLen = 4, p).collect()
    for (r <- gate; c <- Seq("vocab_viol", "tok_viol", "oov_viol"))
      assert(r.getAs[Long](c) == 0L, s"doc ${r.getAs[Long]("doc_id")} $c")
  }

  test("bpe/unigram: refreshed artifacts round-trip the moved corpus's fit exactly") {
    val pb = tmp("bpegate"); val pu = tmp("unigate")
    VocabStore.refreshBpe(corpusA, numMerges = 12, pb)
    VocabStore.refreshBpe(corpusB, numMerges = 12, pb)
    assert(Bpe.loadMerges(spark, pb) == Bpe.learnMerges(corpusB, numMerges = 12))
    VocabStore.refreshUnigram(corpusA, size = 20, maxPieceLen = 4, pu)
    VocabStore.refreshUnigram(corpusB, size = 20, maxPieceLen = 4, pu)
    assert(Unigram.loadVocab(spark, pu) ==
      Unigram.fitVocab(corpusB, size = 20, maxPieceLen = 4))
  }

  test("changed train params retrain even under an unmoved corpus") {
    val p = tmp("params")
    assert(VocabStore.refreshSubword(corpusA, size = 24, maxPieceLen = 4, p))
    assert(VocabStore.refreshSubword(corpusA, size = 16, maxPieceLen = 4, p),
      "a size change must retrain")
    assert(Subword.loadPieces(spark, p).length <= 16 + 32,
      "the store must serve the NEW fit") // size + alphabet bound
  }

  test("legacy unstamped store retrains unconditionally (provenance unknown, never current)") {
    val p = tmp("legacy")
    Subword.savePieces(corpusA, size = 24, maxPieceLen = 4, p) // pre-lifecycle artifact
    assert(VocabStore.refreshSubword(corpusA, size = 24, maxPieceLen = 4, p),
      "no stamp -> retrain even though the corpus matches")
    assert(!VocabStore.refreshSubword(corpusA, size = 24, maxPieceLen = 4, p),
      "the retrain stamps it; now no-ops apply")
  }

  test("torn swap heals: .prev serves loads, the next refresh recovers and completes") {
    val p = tmp("torn")
    VocabStore.refreshSubword(corpusA, size = 24, maxPieceLen = 4, p)
    val want = Subword.loadPieces(spark, p).toSeq
    // crash between the two publish renames: main gone, .prev holds the store
    require(fs.rename(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.Path(s"$p.prev")))
    assert(Subword.loadPieces(spark, p).toSeq == want,
      "loads fall back to .prev during the swap window")
    assert(!VocabStore.refreshSubword(corpusA, size = 24, maxPieceLen = 4, p),
      "refresh recovers the dir first, then no-ops on the unmoved corpus")
    assert(fs.exists(new org.apache.hadoop.fs.Path(p)) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$p.prev")), "heal completed")
    assert(Subword.loadPieces(spark, p).toSeq == want)
  }
}
