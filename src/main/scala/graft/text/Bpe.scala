package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: merges-RANKED subword learning, the
  * standard alternative to [[Subword]]'s frequency-ranked n-gram vocabulary
  * (the published BPE algorithm: start from characters, repeatedly merge
  * the corpus-most-frequent adjacent symbol pair, record the merge order;
  * apply = replay merges by rank until fixpoint).
  *
  * 100 TB design: training operates on the DISTINCT-word histogram — ONE
  * corpus shuffle proportional to distinct words builds (word, count), and
  * the merge loop then runs driver-side over that vocabulary-bounded table
  * (the [[TextOps.vocabulary]] / [[Subword.collectPieces]] bounded-collect
  * contract; this is also how in-memory tokenizer trainers work — pair
  * statistics update over the word histogram, never over raw tokens). The
  * APPLY is map-only: the ranked merge table broadcasts and tokenization is
  * embarrassingly parallel, zero shuffle. Unknown characters never produce
  * an OOV sentinel — a char outside the training alphabet simply stays an
  * unmerged single-character symbol (the defining robustness difference
  * from WordPiece's [UNK] collapse).
  */
object Bpe {

  /** Normalization shared with [[Subword]]: space-only trim (SQL `trim`
    * semantics) + Locale.ROOT lowercase + whitespace split.
    */
  private def toWords(text: String): Array[String] = {
    val t = Option(text).getOrElse("")
    var i = 0; var j = t.length
    while (i < j && t.charAt(i) == ' ') i += 1
    while (j > i && t.charAt(j - 1) == ' ') j -= 1
    t.substring(i, j).toLowerCase(java.util.Locale.ROOT).split("\\s+")
  }

  /** A word as its base symbol sequence: one symbol per CODE POINT (a
    * supplementary-plane character is one symbol, not two surrogate
    * halves — the [[Subword.hasAlienChar]] lesson).
    */
  private def baseSymbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One full BPE apply: repeatedly merge every occurrence of the
    * LOWEST-RANK adjacent pair present in the word until no ranked pair
    * remains (the published inference algorithm). Deterministic: rank
    * total-orders the merges; left-to-right occurrence scan.
    */
  def tokenizeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = baseSymbols(word)
    if (syms.isEmpty) return Array.empty
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.result()
      }
    }
    syms.toArray
  }

  /** The corpus distinct-word histogram: ONE shuffle proportional to
    * DISTINCT words; everything after operates on this bounded table.
    *
    * `minCount` makes the driver collect's bound hold BY CONSTRUCTION on
    * web-scale corpora, where "distinct words" is dominated by a hapax tail
    * of URLs/typos/hashes that would OOM the driver: words seen fewer than
    * `minCount` times are dropped BEFORE the collect (a distributed filter
    * on the aggregated counts — the raw shuffle is unchanged). The default
    * 1 keeps the exact histogram for oracle-gated paths; production
    * trainers run a floor >= 2, the standard tokenizer-trainer knob. The
    * truncation can in principle perturb learned merges (dropped singletons
    * subtract their weight from pair counts), but merge decisions are
    * dominated by frequent words — the spec pins minCount=2 ≡ exact on the
    * test corpus — and a pair carried ONLY by hapax words is exactly the
    * junk the floor exists to ignore.
    */
  private def wordHistogram(docs: DataFrame, textCol: String, idCol: String,
                            minCount: Long = 1L): Array[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).as[String]
      .flatMap(t => toWords(t)).filter(_.nonEmpty)
      .groupByKey(identity).count()
      .filter(_._2 >= minCount)
      .collect()
      .sortBy(_._1) // deterministic driver-side iteration order
  }

  /** Learn `numMerges` merges from the corpus: each round counts adjacent
    * symbol pairs over the (re-symbolized) word histogram weighted by word
    * count and records the winner (count desc, then pair asc — a total
    * order, so the merge list is bit-reproducible). Stops early when no
    * pair repeats. Returns merges in rank order.
    */
  def learnMerges(docs: DataFrame, numMerges: Int,
                  textCol: String = "text", idCol: String = "doc_id",
                  minCount: Long = 1L): Seq[(String, String)] = {
    var words: Array[(Vector[String], Long)] =
      wordHistogram(docs, textCol, idCol, minCount).map { case (w, c) => (baseSymbols(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (bestPair, bestCnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (bestCnt < 2) exhausted = true // a pair seen once earns no merge
        else {
          merges += bestPair
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == bestPair._1 && syms(j + 1) == bestPair._2) {
                  out += syms(j) + syms(j + 1)
                  j += 2
                } else {
                  out += syms(j)
                  j += 1
                }
              }
              (out.result(), c)
            }
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Persist the ranked merge table (left, right, rank) — the BPE
    * artifact a production pipeline trains once and applies for months
    * (same versioned-artifact treatment as [[Subword.savePieces]]).
    */
  def saveMerges(spark: SparkSession, merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (l, r, i) }
      .toDF("left", "right", "rank")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the stored merges back in rank order (bounded collect: exactly
    * numMerges rows by construction).
    */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(Subword.activeVocabDir(spark, path)).orderBy(col("rank"))
      .select(col("left"), col("right")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Map-only BPE apply over the corpus: per document, tokenize every word
    * against the broadcast ranked merges. Output: (doc_id, n_words,
    * bpe_tokens, merged_words — words shorter than their char count).
    */
  def bpeCounts(docs: DataFrame, merges: Seq[(String, String)],
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        it.map { case (id, text) =>
          val ws = toWords(text)
          var nTok = 0L
          var nMerged = 0L
          ws.foreach { w =>
            val ts = tokenizeWord(w, ranks)
            nTok += ts.length
            if (ts.length < baseSymbols(w).length) nMerged += 1
          }
          (id, ws.length.toLong, nTok, nMerged)
        }
      }.toDF("doc_id", "n_words", "bpe_tokens", "merged_words")
  }

  /** q116 invariant gate (the q105 pattern: DuckDB can't replay the merge
    * loop, but it CAN anchor the per-document row shape and assert the
    * violation counters are zero). Learns the merges, round-trips them
    * through the parquet store, and re-tokenizes every word checking the
    * BPE contracts with an independent per-word verifier:
    *
    *  - concat_viol — pieces don't concatenate back to the word (BPE has
    *    no OOV collapse, so round-trip must hold for EVERY word);
    *  - fixpoint_viol — the output still contains an adjacent pair with a
    *    merge rank (apply stopped early);
    *  - bound_viol — fewer pieces than 1, or more than the word's code
    *    points;
    *  - store_viol — tokenizing with the LOADED merges differs from the
    *    learned ones (per word, sequence compare);
    *  - dup_viol — (driver, once) the merge list contains a duplicate
    *    pair, or save/load changed its order.
    *
    * Output: (doc_id, n_words, concat_viol, fixpoint_viol, bound_viol,
    * store_viol, dup_viol); n_words is the DuckDB-derivable anchor.
    */
  def invariantGate(docs: DataFrame, numMerges: Int, storePath: String,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val learned = learnMerges(docs, numMerges, textCol, idCol)
    saveMerges(spark, learned, storePath)
    val loaded = loadMerges(spark, storePath)
    val dupViol =
      if (learned.distinct.size != learned.size || loaded != learned) 1L else 0L
    val bcL = spark.sparkContext.broadcast(
      learned.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val bcS = spark.sparkContext.broadcast(
      loaded.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bcL.value
        val ranksS = bcS.value
        it.map { case (id, text) =>
          val ws = toWords(text)
          var concatViol = 0L; var fixViol = 0L; var boundViol = 0L; var storeViol = 0L
          ws.foreach { w =>
            if (w.nonEmpty) {
              val ts = tokenizeWord(w, ranks)
              if (ts.mkString != w) concatViol += 1
              var i = 0
              while (i < ts.length - 1) {
                if (ranks.contains((ts(i), ts(i + 1)))) fixViol += 1
                i += 1
              }
              val nCp = baseSymbols(w).length
              if (ts.length < 1 || ts.length > nCp) boundViol += 1
              if (!ts.sameElements(tokenizeWord(w, ranksS))) storeViol += 1
            }
          }
          (id, ws.length.toLong, concatViol, fixViol, boundViol, storeViol, dupViol)
        }
      }.toDF("doc_id", "n_words", "concat_viol", "fixpoint_viol", "bound_viol",
        "store_viol", "dup_viol")
  }
}
