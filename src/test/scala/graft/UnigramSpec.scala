package graft

import graft.text.Unigram

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cats sat on the mats"),
    (2L, "a catalog of cats and mats"),
    (3L, "the the the cat cat mat"),
    (4L, "on and on and on a mat")
  ).toDF("doc_id", "text")

  test("fitVocab is alphabet-complete, normalized, and deterministic across fits") {
    val v1 = Unigram.fitVocab(corpus, size = 20, maxPieceLen = 4, emRounds = 2)
    val v2 = Unigram.fitVocab(corpus, size = 20, maxPieceLen = 4, emRounds = 2)
    assert(v1 == v2, "two fits of the same corpus must be bit-identical")
    val pieces = v1.map(_._1).toSet
    val chars = corpus.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).flatMap(_.toCharArray).map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"alphabet incomplete: ${chars -- pieces}")
    val total = v1.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(total - 1.0) < 1e-9, s"probs sum to $total")
  }

  test("viterbi segmentation is optimal and prefers probable pieces") {
    // 'the' is the most frequent trigram: it must be a learned piece and
    // the ML segmentation of "the" must be the single piece, not t+h+e
    val vocab = Unigram.fitVocab(corpus, size = 20, maxPieceLen = 4, emRounds = 2)
    val logp = vocab.toMap
    assert(logp.contains("the"))
    val seg = Unigram.segmentWord("the", logp, 4)
    assert(seg.sameElements(Array("the")), s"got ${seg.mkString("+")}")
    // optimality vs the independent backward DP on every corpus word
    val ml = logp.keysIterator.map(_.length).max
    corpus.as[(Long, String)].collect().flatMap(_._2.split("\\s+")).foreach { w =>
      val s = Unigram.segmentWord(w.toLowerCase, logp, ml)
      assert(s != null, s"$w uncoverable despite complete alphabet")
      val score = s.iterator.map(logp).sum
      val opt = Unigram.optimalScoreBackward(w.toLowerCase, logp, ml)
      assert(math.abs(score - opt) < 1e-12, s"$w: $score vs $opt")
    }
  }

  test("uncoverable words (alien characters) count as one OOV token") {
    val vocab = Unigram.fitVocab(corpus, size = 20, maxPieceLen = 4, emRounds = 2)
    val probe = Seq((9L, "the cat zigüzag")).toDF("doc_id", "text")
    val row = Unigram.unigramCounts(probe, vocab).collect().head
    assert(row.getAs[Long]("n_words") == 3)
    assert(row.getAs[Long]("oov_words") == 1)
    // the two covered words tokenize to >= 1 piece each + 1 for the OOV
    assert(row.getAs[Long]("unigram_tokens") >= 3)
  }

  test("vocabulary artifact round-trips bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString + "/v"
    val vocab = Unigram.fitVocab(corpus, size = 20, maxPieceLen = 4, emRounds = 2)
    Unigram.saveVocab(spark, vocab, dir)
    val loaded = Unigram.loadVocab(spark, dir)
    assert(loaded.sortBy(_._1) == vocab.sortBy(_._1))
    val gate = Unigram.storedVocabGate(corpus, size = 20, maxPieceLen = 4,
      emRounds = 2, dir)
    val viols = gate.collect()
    assert(viols.forall(r => r.getAs[Long]("vocab_viol") == 0
      && r.getAs[Long]("tok_viol") == 0 && r.getAs[Long]("oov_viol") == 0))
  }

  test("invariant gate reports zero violations on the fixture corpus") {
    val rows = Unigram.invariantGate(corpus, size = 20, maxPieceLen = 4,
      emRounds = 2).collect()
    assert(rows.length == 5)
    for (r <- rows; c <- Seq("concat_viol", "opt_viol", "oov_viol", "bound_viol", "norm_viol"))
      assert(r.getAs[Long](c) == 0L, s"doc ${r.getAs[Long]("doc_id")} $c")
  }

  test("segmentation count never exceeds WordPiece-greedy on the same vocab") {
    // ML segmentation minimizes -sum(logp); with a shared vocab it should
    // never need MORE pieces than greedy longest-match needs... not a
    // theorem — but on this corpus it holds and pins the two tokenizers
    // into agreement on their shared contract (cover the word exactly)
    val vocab = Unigram.fitVocab(corpus, size = 20, maxPieceLen = 4, emRounds = 2)
    val logp = vocab.toMap
    val pieces = vocab.map(_._1).toSet
    val ml = logp.keysIterator.map(_.length).max
    corpus.as[(Long, String)].collect().flatMap(_._2.split("\\s+")).foreach { w =>
      val uni = Unigram.segmentWord(w.toLowerCase, logp, ml)
      val wp = graft.text.Subword.tokenizeWord(w.toLowerCase, pieces, ml)
      assert(uni.mkString == wp.mkString, s"$w covers differently")
    }
  }
}
