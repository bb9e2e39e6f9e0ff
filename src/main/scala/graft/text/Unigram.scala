package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram algorithm,
  * Kudo 2018): pieces carry probabilities, a word's tokenization is the
  * MAXIMUM-LIKELIHOOD segmentation (Viterbi DP), and the vocabulary is
  * learned by EM + pruning over a seed set of frequent substrings. This
  * completes the tokenizer trio next to [[Bpe]] (merge-ranked) and
  * [[Subword]] (greedy longest-match): the three public subword families a
  * training-data pipeline actually chooses between.
  *
  * Training follows the [[Bpe.learnMerges]] scale discipline: ONE shuffle
  * proportional to DISTINCT words builds the (word, count) histogram (with
  * the same `minCount` floor bounding the driver collect BY CONSTRUCTION on
  * web-scale corpora), and EM runs on the driver over that bounded
  * histogram — corpus-sized data is never touched again. The apply side is
  * MAP-ONLY: piece log-probs broadcast, Viterbi is per-word DP with zero
  * shuffle.
  *
  * Determinism (the oracle-gate requirement): the histogram is sorted
  * before iteration, EM is hard (Viterbi counts, not forward-backward
  * marginals) with a fixed round count, pruning uses the total order
  * (count desc, piece asc), and the DP keeps the FIRST best under a fixed
  * candidate order — so two fits of the same corpus are bit-identical, and
  * the independent checker in [[invariantGate]] re-derives optimal scores
  * with a reversed-direction DP.
  */
object Unigram {

  /** OOV sentinel, [[Subword.Unk]] convention: a word containing a
    * character outside the learned alphabet collapses to exactly this.
    */
  val Unk = "[UNK]"

  /** Whitespace words of lowercased text — [[Subword.toWords]]' exact
    * convention (space-only trim + ROOT lowercase), shared so the
    * tokenizer trio can never drift on word boundaries.
    */
  private def toWords(text: String): Array[String] = Subword.toWords(text)

  /** Single code points of a word (surrogate-pair safe). */
  private def codePoints(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Viterbi maximum-likelihood segmentation of one word under piece
    * log-probs. Returns null when the word cannot be covered (some
    * character is outside the vocabulary — the OOV case). DP keeps the
    * strictly-better score only (first best wins) with candidates tried in
    * increasing piece length, so the result is deterministic.
    */
  def segmentWord(word: String, logp: collection.Map[String, Double],
                  maxPieceLen: Int): Array[String] = {
    if (word.isEmpty) return Array.empty[String]
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // piece start for the best path into j
    best(0) = 0.0
    var i = 0
    while (i < n) {
      if (best(i) != Double.NegativeInfinity) {
        var l = 1
        val lim = math.min(maxPieceLen, n - i)
        while (l <= lim) {
          val cand = word.substring(i, i + l)
          logp.get(cand) match {
            case Some(lp) =>
              val s = best(i) + lp
              if (s > best(i + l)) { best(i + l) = s; back(i + l) = i }
            case None =>
          }
          l += 1
        }
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) return null
    val pieces = List.newBuilder[String]
    var j = n
    val rev = List.newBuilder[(Int, Int)]
    while (j > 0) { val s = back(j); rev += ((s, j)); j = s }
    rev.result().reverse.foreach { case (s, e) => pieces += word.substring(s, e) }
    pieces.result().toArray
  }

  /** The optimal segmentation SCORE via a backward DP — the independent
    * checker for [[invariantGate]]: same optimum, opposite recursion
    * direction and no backpointers, so a bug in [[segmentWord]]'s
    * bookkeeping cannot hide in its own verifier.
    */
  private[graft] def optimalScoreBackward(word: String,
                                         logp: collection.Map[String, Double],
                                         maxPieceLen: Int): Double = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    best(n) = 0.0
    var i = n - 1
    while (i >= 0) {
      var l = 1
      val lim = math.min(maxPieceLen, n - i)
      while (l <= lim) {
        if (best(i + l) != Double.NegativeInfinity) {
          logp.get(word.substring(i, i + l)) match {
            case Some(lp) =>
              val s = lp + best(i + l)
              if (s > best(i)) best(i) = s
            case None =>
          }
        }
        l += 1
      }
      i -= 1
    }
    best(0)
  }

  private def wordHistogram(docs: DataFrame, textCol: String,
                            minCount: Long): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).as[String]
      .flatMap(t => toWords(t)).filter(_.nonEmpty)
      .groupByKey(identity).count()
      .filter(_._2 >= minCount)
      .collect()
      .sortBy(_._1)
  }

  /** Fit the unigram vocabulary: (piece, logp), alphabet-complete, exactly
    * `size` + alphabet entries (fewer if the corpus is tiny).
    *
    * @param size         target number of multi-character pieces kept after
    *                     pruning (the alphabet rides along unpruned so no
    *                     corpus word is ever uncoverable).
    * @param maxPieceLen  seed substrings up to this length.
    * @param emRounds     hard-EM refinement rounds before pruning.
    * @param seedFactor   seed candidate pool = seedFactor * size.
    * @param minCount     histogram floor (the [[Bpe.wordHistogram]] knob).
    */
  def fitVocab(docs: DataFrame, size: Int, maxPieceLen: Int = 6,
               emRounds: Int = 3, seedFactor: Int = 4,
               textCol: String = "text", minCount: Long = 1L): Seq[(String, Double)] = {
    val hist = wordHistogram(docs, textCol, minCount)
    // seed: every alphabet character + the seedFactor*size most frequent
    // multi-char substrings (count desc, piece asc — total order)
    val charCnt = collection.mutable.LinkedHashMap.empty[String, Long]
    val subCnt = collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      codePoints(w).foreach(ch => charCnt(ch) = charCnt.getOrElse(ch, 0L) + c)
      var i = 0
      while (i < w.length) {
        var l = 2
        val lim = math.min(maxPieceLen, w.length - i)
        while (l <= lim) {
          val p = w.substring(i, i + l)
          subCnt(p) = subCnt.getOrElse(p, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    val alphabet = charCnt.keys.toSeq.sorted
    val seeds = subCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedFactor * size)
    // initial probabilities proportional to raw counts over the seed pool
    var counts: Map[String, Double] =
      (alphabet.map(a => a -> charCnt(a).toDouble) ++
        seeds.map { case (p, c) => p -> c.toDouble }).toMap
    val alphaSet = alphabet.toSet
    def toLogp(cs: Map[String, Double]): Map[String, Double] = {
      val total = cs.values.sum
      cs.map { case (p, c) => p -> math.log(c / total) }
    }
    def estep(logp: Map[String, Double], ml: Int): Map[String, Double] = {
      val acc = collection.mutable.HashMap.empty[String, Double]
      hist.foreach { case (w, c) =>
        val seg = segmentWord(w, logp, ml)
        if (seg != null) seg.foreach(p => acc(p) = acc.getOrElse(p, 0.0) + c.toDouble)
      }
      // the alphabet never leaves the vocabulary (coverage guarantee): an
      // unused character keeps an epsilon count instead of dropping to -inf
      alphabet.foreach(a => if (!acc.contains(a)) acc(a) = 1e-6)
      acc.toMap
    }
    val ml = maxPieceLen
    for (_ <- 0 until emRounds)
      counts = estep(toLogp(counts), ml)
    // prune: keep the whole alphabet + the `size` best multi-char pieces by
    // expected count (count desc, piece asc)
    val kept = alphaSet ++ counts.toSeq
      .filter { case (p, _) => !alphaSet.contains(p) }
      .sortBy { case (p, c) => (-c, p) }
      .take(size).map(_._1)
    // one final E/M over the pruned vocabulary -> the published probabilities
    val pruned = counts.filter { case (p, _) => kept.contains(p) }
    val finalCounts = estep(toLogp(pruned), ml).filter { case (p, _) => kept.contains(p) }
    toLogp(finalCounts).toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  /** Map-only apply: per document, Viterbi-tokenize every word against the
    * broadcast vocabulary. A word with a character outside the alphabet
    * (uncoverable) counts as one `[[Unk]]` token.
    * Output: (doc_id, n_words, unigram_tokens, oov_words).
    */
  def unigramCounts(docs: DataFrame, vocab: Seq[(String, Double)],
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val maxLen = if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max
    val bc = spark.sparkContext.broadcast(vocab.toMap)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val logp = bc.value
        it.map { case (id, text) =>
          val ws = toWords(text)
          var nTok = 0L; var nOov = 0L
          ws.foreach { w =>
            if (w.nonEmpty) {
              val seg = segmentWord(w, logp, maxLen)
              if (seg == null) { nTok += 1; nOov += 1 } else nTok += seg.length
            }
          }
          (id, ws.length.toLong, nTok, nOov)
        }
      }.toDF("doc_id", "n_words", "unigram_tokens", "oov_words")
  }

  /** Persist the fitted vocabulary as a versioned artifact (piece, logp,
    * rank) — rank from the (logp desc, piece asc) total order, so two saves
    * of the same corpus are bit-identical (the [[Subword.savePieces]]
    * treatment; the ranking window is over <= size + alphabet rows).
    */
  def saveVocab(spark: SparkSession, vocab: Seq[(String, Double)], path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "logp")
      .withColumn("rank", row_number().over(
        Window.orderBy(col("logp").desc, col("piece").asc)))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Read the stored vocabulary back in rank order (bounded collect). */
  def loadVocab(spark: SparkSession, path: String): Seq[(String, Double)] =
    spark.read.parquet(Subword.activeVocabDir(spark, path)).orderBy(col("rank"))
      .select(col("piece"), col("logp")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  /** q141 invariant gate (the q105/q116 pattern — DuckDB cannot run EM or
    * Viterbi, but it derives the per-document row shape and asserts the
    * violation counters are zero):
    *
    *  - concat_viol — a covered word whose ML segmentation doesn't
    *    concatenate back to the word;
    *  - opt_viol — a segmentation whose summed log-prob differs from the
    *    optimum recomputed by the independent BACKWARD DP (> 1e-9);
    *  - oov_viol — uncoverable verdict disagreeing with the alphabet test
    *    (alphabet-complete vocab => uncoverable iff an alien character);
    *  - bound_viol — fewer tokens than non-empty words;
    *  - norm_viol — (driver, once) the vocabulary's probabilities don't sum
    *    to 1 within 1e-6.
    *
    * Output: (doc_id, n_words, concat_viol, opt_viol, oov_viol, bound_viol,
    * norm_viol); n_words is the DuckDB-derivable anchor.
    */
  def invariantGate(docs: DataFrame, size: Int = 256, maxPieceLen: Int = 6,
                    emRounds: Int = 3, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = fitVocab(docs, size, maxPieceLen, emRounds, textCol = textCol)
    val normViol =
      if (math.abs(vocab.iterator.map { case (_, lp) => math.exp(lp) }.sum - 1.0) < 1e-6) 0L
      else 1L
    val alphabet = vocab.iterator.map(_._1).filter(p =>
      p.codePointCount(0, p.length) == 1).toSet
    val bc = spark.sparkContext.broadcast(vocab.toMap)
    val bcAlpha = spark.sparkContext.broadcast(alphabet)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val logp = bc.value
        val alpha = bcAlpha.value
        val ml = logp.keysIterator.map(_.length).foldLeft(1)(math.max)
        it.map { case (id, text) =>
          val ws = toWords(text)
          var concatViol = 0L; var optViol = 0L; var oovViol = 0L
          var nTok = 0L; var nonEmpty = 0L
          ws.foreach { w =>
            if (w.nonEmpty) {
              nonEmpty += 1
              val seg = segmentWord(w, logp, ml)
              val alien = codePoints(w).exists(ch => !alpha.contains(ch))
              if ((seg == null) != alien) oovViol += 1
              if (seg == null) nTok += 1
              else {
                nTok += seg.length
                if (seg.mkString != w) concatViol += 1
                val segScore = seg.iterator.map(logp).sum
                val opt = optimalScoreBackward(w, logp, ml)
                if (math.abs(segScore - opt) > 1e-9) optViol += 1
              }
            }
          }
          val boundViol = if (nTok < nonEmpty) 1L else 0L
          (id, ws.length.toLong, concatViol, optViol, oovViol, boundViol, normViol)
        }
      }.toDF("doc_id", "n_words", "concat_viol", "opt_viol", "oov_viol",
        "bound_viol", "norm_viol")
  }

  /** q142 store gate (the q113 treatment): the artifact round-trip must be
    * invisible to tokenization. Loads the stored vocabulary, re-fits the
    * in-memory one, and compares piece-by-piece and word-by-word:
    * vocab_viol (stored (piece, logp) multiset differs — driver, once),
    * tok_viol (ML segmentations differ), oov_viol (verdicts differ).
    */
  def storedVocabGate(docs: DataFrame, size: Int, maxPieceLen: Int,
                      emRounds: Int, path: String, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stored = loadVocab(spark, path)
    val mem = fitVocab(docs, size, maxPieceLen, emRounds, textCol = textCol)
    val vocabViol = if (stored.sortBy(_._1) == mem.sortBy(_._1)) 0L else 1L
    val bcS = spark.sparkContext.broadcast(stored.toMap)
    val bcM = spark.sparkContext.broadcast(mem.toMap)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val lpS = bcS.value; val lpM = bcM.value
        val mlS = lpS.keysIterator.map(_.length).foldLeft(1)(math.max)
        val mlM = lpM.keysIterator.map(_.length).foldLeft(1)(math.max)
        it.map { case (id, text) =>
          val ws = toWords(text)
          var tokViol = 0L; var oovViol = 0L
          ws.foreach { w =>
            if (w.nonEmpty) {
              val s = segmentWord(w, lpS, mlS)
              val m = segmentWord(w, lpM, mlM)
              if ((s == null) != (m == null)) oovViol += 1
              else if (s != null && !s.sameElements(m)) tokViol += 1
            }
          }
          (id, ws.length.toLong, vocabViol, tokViol, oovViol)
        }
      }.toDF("doc_id", "n_words", "vocab_viol", "tok_viol", "oov_viol")
  }
}
