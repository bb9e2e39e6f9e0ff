package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Corpus-curation operators: unigram-LM scoring, duplicated-ngram fraction,
  * domain rebalancing, rank-based length trim — hand-computed goldens on
  * tiny corpora plus the determinism/totality contracts.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: overlap, short tail, empty-doc accounting") {
    val docs = Seq((1L, (1 to 10).map("w" + _).mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.chunkDocs(docs, size = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok")))
    // 10 tokens at size 4 / stride 3: starts 0,3,6,9; the last chunk runs
    // short; overlap means token w4 appears in chunks 0 AND 1
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 1L),
      (2L, 0L, 0L, 1L))) // the empty doc keeps one (empty-token) chunk
    // every token is covered: distinct positions across chunks == doc length
    val covered = (0 until 4).flatMap(i => (i * 3) until math.min(i * 3 + 4, 10)).distinct
    assert(covered.size == 10)
  }

  test("unigramNll matches the hand-computed add-one unigram model") {
    // corpus: a:2 b:2 c:1 -> N=5, V=3
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramNll(docs).orderBy("doc_id").collect()
    def nll6(cf: Long): Long = math.floor(-math.log((cf + 1.0) / (5 + 3)) * 1e6 + 0.5).toLong
    val d1 = (2 * nll6(2) + 1 * nll6(2)).toDouble / 3 / 1e6
    val d2 = (1 * nll6(2) + 1 * nll6(1)).toDouble / 2 / 1e6
    assert(out(0).getAs[Long]("doc_tokens") == 3L)
    assert(out(0).getAs[Double]("nll") == BigDecimal(d1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1).getAs[Long]("doc_tokens") == 2L)
    assert(out(1).getAs[Double]("nll") == BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // rare-token doc scores higher (c is rarer than a/b)
    assert(out(1).getAs[Double]("nll") > out(0).getAs[Double]("nll"))
  }

  test("bigramNll matches the hand-computed add-one Markov model") {
    // bigrams: d1 = (a b), (b a); d2 = (b a). c(a,b)=1, c(b,a)=2;
    // contexts c(a,.)=1, c(b,.)=2; V=2 types.
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextOps.bigramNll(docs).orderBy("doc_id").collect()
    def nll6(num: Double, den: Double): Long =
      math.floor(-math.log(num / den) * 1e6 + 0.5).toLong
    val pAB = nll6(1 + 1.0, 1 + 3.0) // V=3 types: a, b, solo
    val pBA = nll6(2 + 1.0, 2 + 3.0)
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Long]("n_bigrams") == 2L)
    assert(out(0).getAs[Double]("nll") == r6((pAB + pBA).toDouble / 2 / 1e6))
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Double]("nll") == r6(pBA.toDouble / 1e6))
    assert(out(2).getAs[Long]("n_bigrams") == 0L && out(2).getAs[Double]("nll") == 0.0,
      "single-token doc reports zero bigrams")
  }

  test("LM store lifecycle: batched appends score like the monolithic fit; ledger and compaction hold") {
    val docs = (0L until 30L).map(i =>
      (i, s"the cat ${if (i % 2 == 0) "sat on" else "ran past"} the mat row$i end"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_lm_lc").toString + "/lm"
    TextOps.saveLm(docs.filter(col("doc_id") % 3 === 0), path)
    assert(TextOps.appendLm(docs.filter(col("doc_id") % 3 === 1), path, appendId = 1))
    assert(TextOps.appendLm(docs.filter(col("doc_id") % 3 === 2), path, appendId = 2))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    val mono = canon(TextOps.trigramBackoffNll(docs))
    assert(canon(TextOps.scoreWithLm(docs, path)) == mono,
      "pre-compaction store diverged from the monolithic fit")
    // uni/bi/tri/meta all had 3 batches to merge
    assert(TextOps.compactLm(spark, path) == 4)
    assert(canon(TextOps.scoreWithLm(docs, path)) == mono,
      "compacted store diverged from the monolithic fit")
    // compaction merged to one row per gram: a second pass finds nothing
    assert(TextOps.compactLm(spark, path) == 0)
    // ledger survives compaction: replays of merged batches stay refused
    assert(!TextOps.appendLm(docs.filter(col("doc_id") % 3 === 1), path, appendId = 1),
      "replayed append id must stay refused after compaction")
    // post-compaction appends keep counting (several docs so some land in
    // the 80% train split and actually shift the counts)
    val extra = (100L until 110L).map(i => (i, s"the cat sat on the mat again x$i end"))
      .toDF("doc_id", "text")
    assert(TextOps.appendLm(extra, path, appendId = 3))
    assert(canon(TextOps.scoreWithLm(docs, path)) ==
      canon(TextOps.trigramBackoffNll(docs.unionByName(extra))
        .filter(col("doc_id") < 100)),
      "post-compaction append diverged from the monolithic fit over the union")
    // the probe-vs-refit pair the bench's lm10_probe fields time: scoring a
    // fresh batch FROM THE STORE must equal the in-memory refit-per-batch
    // path over the same corpus (exact long counts -> identical backoff)
    val batch = docs.filter(col("doc_id") < 5)
    assert(canon(TextOps.scoreWithLm(batch, path)) ==
      canon(TextOps.trigramBackoffNllAgainst(batch, docs.unionByName(extra))),
      "store probe diverged from the refit-per-batch scorer")
    // VACUUM: since r17 compactLm SELF-VACUUMS — the swap lands one
    // `_vacuumed_below` marker instead of tombstone dirs, so the merged
    // ids are already collapsed and an explicit vacuum finds nothing.
    // Scoring is invariant, vacuumed replays stay refused, and the NEXT
    // compaction must carry the watermark through its swap.
    import graft.store.Ledger
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    assert(Ledger.watermark(fs, s"$path/uni") == 3L,
      "compactLm must have stamped max-merged-id+1 itself (self-vacuum)")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/uni"))
      .map(_.getPath.getName).count(_.startsWith("batch=")) == 2,
      "only the base and the id-3 delta may remain — zero tombstone dirs")
    val scorePre = canon(TextOps.scoreWithLm(docs, path))
    assert(Ledger.vacuumStore(spark, path, 4L,
      Seq("uni", "bi", "tri", "meta")) == 0,
      "nothing left to collapse — compaction already vacuumed")
    assert(canon(TextOps.scoreWithLm(docs, path)) == scorePre,
      "vacuum changed LM scores")
    assert(!TextOps.appendLm(docs.filter(col("doc_id") % 3 === 1), path, appendId = 1),
      "a vacuumed append id must stay refused by the watermark rule")
    assert(TextOps.compactLm(spark, path) == 4) // batch 0 + the id-3 delta
    assert(Ledger.watermark(fs, s"$path/uni") == 4L,
      "compactLm must carry the vacuum watermark through its swap")
    assert(!TextOps.appendLm(docs.filter(col("doc_id") % 3 === 2), path, appendId = 2),
      "watermark lost in LM compaction: vacuumed replay resurrected")
    assert(canon(TextOps.scoreWithLm(docs, path)) == scorePre)
  }

  test("LM retirement: retire+append converges to the snapshot rebuild; zeroed grams invisible") {
    val a = (0L until 30L).map(i => (i, s"the cat sat on the mat row$i end"))
      .toDF("doc_id", "text")
    // the next crawl: %5==1 removed, %4==2 revised, three docs added
    val b = a.filter(col("doc_id") % 5 =!= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName((100L until 103L).map(i => (i, s"a new dog ran fast x$i"))
        .toDF("doc_id", "text"))
    val path = java.nio.file.Files.createTempDirectory("graft_lm_ret").toString + "/lm"
    TextOps.saveLm(a, path)
    val delta = graft.dedup.Dedup.corpusDelta(a, b)
    val oldSlice = a.join(delta.filter(col("status").isin("removed", "changed"))
      .select("doc_id"), "doc_id")
    val newSlice = b.join(delta.filter(col("status").isin("added", "changed"))
      .select("doc_id"), "doc_id")
    assert(TextOps.retireLm(oldSlice, path, appendId = 1))
    assert(TextOps.appendLm(newSlice, path, appendId = 2))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    val rebuild = canon(TextOps.trigramBackoffNll(b))
    // PRE-compaction: fully-retired grams are still rows (summing to 0) —
    // the scorer's c > 0 filter must make them indistinguishable from absent
    assert(canon(TextOps.scoreWithLm(b, path)) == rebuild,
      "pre-compaction retired store diverged from the snapshot-B rebuild")
    assert(TextOps.compactLm(spark, path) == 4)
    assert(canon(TextOps.scoreWithLm(b, path)) == rebuild,
      "compacted retired store diverged from the snapshot-B rebuild")
    // retire ledger is the append ledger: a replay stays refused
    assert(!TextOps.retireLm(oldSlice, path, appendId = 1))
    // compaction dropped fully-retired grams: the store's unigram table is
    // ROW-identical to a fresh build over b (no c <= 0 residue)
    val fresh = java.nio.file.Files.createTempDirectory("graft_lm_ref").toString + "/lm"
    TextOps.saveLm(b, fresh)
    def uniRows(p: String): Seq[String] =
      spark.read.parquet(s"$p/uni").collect().map(_.toString).sorted.toSeq
    assert(uniRows(path) == uniRows(fresh),
      "compacted unigram table is not row-identical to the fresh rebuild")
  }

  test("trigramBackoffNll: train docs never back off; alien held-out docs are all-unseen") {
    import graft.dedup.Dedup
    // discover every candidate id's split bucket with ONE job
    val buckets = (0L until 60L).map(Tuple1(_)).toDF("doc_id")
      .select(col("doc_id"),
        (Dedup.hex60(col("doc_id").cast("string")) % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = (0L until 60L).filter(buckets(_) < 80).take(3)
    val heldOut = (0L until 60L).filter(buckets(_) >= 80).take(2)
    assert(trainIds.length == 3 && heldOut.length == 2, "need both splits in 0..59")
    val docs = (
      trainIds.map(id => (id, "the cat sat on the mat")) ++
      Seq((heldOut(0), "zz qq xx ww"),              // no shared vocab: all unseen
          (heldOut(1), "cat sat on on the cat"))    // shared words: backoff fires
    ).toDF("doc_id", "text")
    val out = TextOps.trigramBackoffNll(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    trainIds.foreach { id =>
      val r = out(id)
      assert(r.getAs[Long]("n_trigrams") == 4L)
      assert(r.getAs[Long]("n_backoff") == 0L, "a train doc's trigrams are all in the fit")
      assert(r.getAs[Long]("n_unseen") == 0L)
      assert(r.getAs[Double]("nll") >= 0.0)
    }
    val alien = out(heldOut(0))
    assert(alien.getAs[Long]("n_trigrams") == 2L)
    assert(alien.getAs[Long]("n_unseen") == 2L && alien.getAs[Double]("nll") == 0.0)
    val shared = out(heldOut(1))
    assert(shared.getAs[Long]("n_unseen") == 0L, "every word is in the train vocab")
    assert(shared.getAs[Long]("n_backoff") > 0L, "unseen trigrams over seen words back off")
    assert(shared.getAs[Double]("nll") > 0.0)
  }

  test("dupNgramStats counts shared trigram instances and keeps short docs total") {
    val docs = Seq(
      (1L, "x y z w"), // shingles: "x y z", "y z w"
      (2L, "x y z q"), // shingles: "x y z", "y z q"
      (3L, "a b")      // too short: zero shingles
    ).toDF("doc_id", "text")
    val out = TextOps.dupNgramStats(docs, n = 3).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_shingles") == 2L && out(0).getAs[Long]("n_dup") == 1L)
    assert(out(0).getAs[Double]("dup_frac") == 0.5)
    assert(out(1).getAs[Long]("n_dup") == 1L)
    assert(out(2).getAs[Long]("n_shingles") == 0L && out(2).getAs[Double]("dup_frac") == 0.0)
  }

  test("removeDuplicatedSpans cuts exactly the corpus-duplicated span cover") {
    val docs = Seq(
      (1L, "p q r s t u v"), // shares the 5-gram "p q r s t" with doc 2
      (2L, "p q r s t x y"),
      (3L, "m n o"), // shorter than the span: no grams, passes through
      (4L, "k k k k k k k k k k") // within-doc repetition: every start dup
    ).toDF("doc_id", "text")
    val out = TextOps.removeDuplicatedSpans(docs, span = 5)
      .orderBy("doc_id").collect()
    // docs 1/2: positions 0-4 covered, tail survives
    assert(out(0).getAs[Long]("n_removed") == 5L)
    assert(out(0).getAs[String]("clean_text") == "u v")
    assert(out(1).getAs[String]("clean_text") == "x y")
    // short doc unchanged
    assert(out(2).getAs[Long]("n_removed") == 0L)
    assert(out(2).getAs[String]("clean_text") == "m n o")
    // all-repetition doc empties out (the Lee et al. pathological case)
    assert(out(3).getAs[Long]("n_removed") == 10L)
    assert(out(3).getAs[String]("clean_text") == "")
    // conservation: n_words always = surviving words + n_removed
    out.foreach { r =>
      val kept = r.getAs[String]("clean_text") match {
        case "" => 0L
        case t  => t.split(" ").length.toLong
      }
      assert(r.getAs[Long]("n_words") == kept + r.getAs[Long]("n_removed"))
    }
  }

  test("domainRebalance keeps the smallest domain whole with exact ppm rates") {
    val docs = (1L to 40L).map(i => (i, if (i <= 30) "big" else "small")).toDF("doc_id", "source")
    val out = TextOps.domainRebalance(docs).orderBy("domain").collect()
    val big = out(0); val small = out(1)
    assert(big.getAs[String]("domain") == "big" && big.getAs[Long]("n_docs") == 30L)
    assert(big.getAs[Long]("rate_ppm") == 10L * 1000000 / 30) // 333333
    assert(small.getAs[Long]("rate_ppm") == 1000000L)
    assert(small.getAs[Long]("n_kept") == 10L, "gate < 1e6 keeps every doc of the min domain")
    assert(big.getAs[Long]("n_kept") <= 30L)
    // deterministic: a second run is identical
    val again = TextOps.domainRebalance(docs).orderBy("domain").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("semanticDedup keeps the smallest id of a same-cell near-dup pair") {
    // two tight groups around orthogonal directions; ids 0/1 seed the cells.
    // 7 duplicates 3 exactly (cos=1) and 9 duplicates 8 exactly.
    val vecs = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.8f, 0.2f), 7L -> Seq(0.8f, 0.2f),
      8L -> Seq(0.1f, 0.9f), 9L -> Seq(0.1f, 0.9f),
      5L -> Seq(0.2f, 0.8f)
    ).toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity
      .semanticDedup(vecs, numCentroids = 2, iters = 1, threshold = 0.999)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("kept"), r.getAs[Long]("n_dups"))).toMap
    assert(out(3) == (true, 1L) && out(7) == (false, 1L), "min id of the dup pair survives")
    assert(out(8) == (true, 1L) && out(9) == (false, 1L))
    assert(out(0)._1 && out(5)._1, "singletons survive")
    assert(out.values.count(!_._1) == 2)
  }

  test("quality-sample rates decay with the quality gap and the best doc is always kept") {
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ") // no stopwords
    val docs = Seq((1L, mk(10)), (2L, mk(50)), (3L, mk(100))).toDF("doc_id", "text")
    // same plan as the q102 registry entry, applied to local data
    val q = graft.text.TextOps.qualityFeatures(docs).select(col("doc_id"), col("quality_score"))
    val qmax = q.agg(max(col("quality_score")).as("q_max"))
    val rated = q.crossJoin(broadcast(qmax))
      .withColumn("rate_ppm",
        floor(exp((col("quality_score") - col("q_max")) / 0.25) * 1e6 + 0.5).cast("long"))
      .withColumn("kept",
        graft.dedup.Dedup.hex60(col("doc_id").cast("string")) % 1000000 < col("rate_ppm"))
      .orderBy("doc_id").collect()
    val rates = rated.map(_.getAs[Long]("rate_ppm")).toSeq
    assert(rates == rates.sorted, "rate is monotone in quality")
    assert(rates.last == 1000000L, "corpus-best doc rate is exactly 1e6")
    assert(rated.last.getAs[Boolean]("kept"), "corpus-best doc always kept")
    assert(rates.head > 0L, "softmax rate never hits zero")
  }

  test("chunkDocuments covers every token with overlapping fixed windows") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")                                     // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    // stride 3: starts 0,3,6 — full 4-token windows, last token covered
    assert(d1.map(_.getAs[Long]("start_tok")).toSeq == Seq(0L, 3L, 6L))
    assert(d1.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(4L, 4L, 4L))
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length == 1 && d2(0).getAs[Long]("chunk_tokens") == 2L)
    // consecutive chunks share exactly `overlap` tokens: chunk0 ends t4, chunk1 starts t4
    val md5OfChunk0 = d1(0).getAs[String]("chunk_md5")
    val expect0 = java.security.MessageDigest.getInstance("MD5")
      .digest("t1 t2 t3 t4".getBytes).map("%02x".format(_)).mkString
    assert(md5OfChunk0 == expect0)
  }

  test("chunk-level dedup flags a span shared across docs with the earliest keeper") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_docs").toString
    val shared = (1 to 40).map(i => s"s$i").mkString(" ") // > one 32-token chunk
    Seq(
      (1L, s"$shared unique tail one"),
      (2L, s"$shared other ending here"),
      (3L, "a completely different document body with its own words only")
    ).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = graft.queries.CorpusQueries.defs("q104_chunk_dedup")(spark, tmp).collect()
    assert(out.nonEmpty, "the shared 32-token prefix chunk must be flagged")
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("keep_doc") == 1L, "smallest doc id is the keeper")
      assert(r.getAs[Long]("keep_start") == 0L)
    }
  }

  test("chunk-level dedup fails loudly on a doc_id outside the packing bound") {
    val shared = (1 to 40).map(i => s"s$i").mkString(" ")
    def run(badId: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_docs_bad").toString
      Seq((badId, s"$shared tail a"), (2L, s"$shared tail b"))
        .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
      graft.queries.CorpusQueries.defs("q104_chunk_dedup")(spark, tmp).collect()
    }
    // 2^43 would wrap the int64 packing; a negative id breaks the ordering —
    // both must abort loudly instead of silently corrupting the keeper
    for (bad <- Seq(8796093022208L, -1L)) {
      val e = intercept[Exception](run(bad))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("doc_id")), s"expected the packing-bound assert for $bad")
    }
  }

  test("tokenizeWord: greedy longest match against a hand-built vocab") {
    import graft.text.Subword
    val vocab = Set("a", "b", "c", "d", "ab", "abc", "bcd", "cd")
    def tok(w: String) = Subword.tokenizeWord(w, vocab, 3).toSeq
    assert(tok("abcd") == Seq("abc", "d"), "longest match at pos 0 wins, not ab+cd")
    assert(tok("abab") == Seq("ab", "ab"))
    assert(tok("dcba") == Seq("d", "c", "b", "a"), "falls back to single chars")
    assert(tok("cdbcd") == Seq("cd", "bcd"))
    assert(tok("axb") == Seq(Subword.Unk), "alien char collapses the whole word")
    assert(tok("") == Seq.empty, "empty word yields zero pieces")
  }

  test("pieceVocab learns the alphabet plus the most frequent substrings") {
    import graft.text.Subword
    val docs = Seq((1L, "ab ab b"), (2L, "ab cc")).toDF("doc_id", "text")
    val v = Subword.pieceVocab(docs, size = 2, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("a") == 3L && v("b") == 4L && v("c") == 2L, "alphabet weighted by occurrences")
    // substrings: "ab" appears in 3 word instances, "cc" in 1 — top-2
    assert(v("ab") == 3L && v("cc") == 1L)
    assert(v.size == 5)
  }

  test("subwordCounts tokenizes per word with OOV fallback") {
    import graft.text.Subword
    val docs = Seq((1L, "abcd abab"), (2L, "axb d")).toDF("doc_id", "text")
    val vocab = Seq("a", "b", "c", "d", "ab", "abc", "bcd", "cd")
    val out = Subword.subwordCounts(docs, vocab).orderBy("doc_id").collect()
    // doc 1: abcd -> abc+d (2), abab -> ab+ab (2)
    assert(out(0).getAs[Long]("n_words") == 2L)
    assert(out(0).getAs[Long]("subword_tokens") == 4L)
    assert(out(0).getAs[Long]("oov_words") == 0L)
    // doc 2: axb -> [UNK] (1 token, 1 oov), d -> d (1)
    assert(out(1).getAs[Long]("subword_tokens") == 2L)
    assert(out(1).getAs[Long]("oov_words") == 1L)
  }

  test("packing and trimming compose with subword token counts") {
    import graft.text.Subword
    val docs = Seq((0L, "en", "abcd abab"), (1L, "en", "abcd"), (2L, "en", "d d d"))
      .toDF("doc_id", "lang", "text")
    val vocab = Seq("a", "b", "c", "d", "ab", "abc")
    val withCounts = docs.join(
      Subword.subwordCounts(docs, vocab).select(col("doc_id"), col("subword_tokens")),
      Seq("doc_id"))
    // subword counts: doc0 = abc+d + ab+ab = 4, doc1 = 2, doc2 = 3
    val packed = TextOps.packSequences(withCounts, budget = 4, shards = 1,
        tokenCount = Some(col("subword_tokens")))
      .orderBy("doc_id").collect()
    assert(packed.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 2L, 3L),
      "packing consumed the subword counts, not the whitespace counts")
    assert(packed.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 1L),
      "bins cut at the subword-token budget")
    val trimmed = TextOps.lengthTrim(withCounts, loPct = 0.0, hiPct = 1.0,
      tokenCount = Some(col("subword_tokens"))).collect()(0)
    assert(trimmed.getAs[Long]("kept_tokens") == 9L,
      "trim ranked and summed the subword counts")
  }

  test("subword invariant gate: zero violations on a mixed corpus") {
    import graft.text.Subword
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "THE QUICK the quick 12345 a-b-c x!y?z"),
      (4L, "   "),
      // supplementary-plane char (surrogate pair): the alphabet keeps it as
      // ONE piece and the OOV cross-check must compare code points, not
      // UTF-16 halves
      (5L, "héllo 😀x café"),
      // leading tab survives the SQL-style (space-only) trim: both engines
      // see a leading empty word
      (6L, "\tx y")
    ).toDF("doc_id", "text")
    val out = Subword.invariantGate(docs, size = 64, maxPieceLen = 4)
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    out.foreach { r =>
      for (c <- Seq("concat_viol", "greedy_viol", "oov_viol", "bound_viol", "unk_viol"))
        assert(r.getAs[Long](c) == 0L, s"$c nonzero for doc ${r.getAs[Long]("doc_id")}")
    }
    assert(out(0).getAs[Long]("n_words") == 9L)
    assert(out(3).getAs[Long]("n_words") == 1L, "whitespace-only text splits to ['']")
    assert(out(4).getAs[Long]("n_words") == 3L)
    assert(out(5).getAs[Long]("n_words") == 3L, "tab is not trimmed, so ['', x, y]")
  }

  test("persisted subword vocab: load reproduces the learned pieces and tokenization") {
    import graft.text.Subword
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "THE QUICK the quick 12345 a-b-c x!y?z"),
      (4L, "héllo 😀x café")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_vocab").toString
    Subword.savePieces(docs, size = 64, maxPieceLen = 4, path)
    val loaded = Subword.loadPieces(spark, path)
    val mem = Subword.collectPieces(docs, size = 64, maxPieceLen = 4)
    assert(loaded.sorted.toSeq == mem.sorted.toSeq, "store round-trip changed the piece set")
    // the stored ranks carry the total order (weight desc, piece asc)
    val ranked = spark.read.parquet(path).orderBy(col("rank"))
      .select(col("piece"), col("weight")).collect()
    assert(ranked.map(_.getString(0)).toSeq == loaded.toSeq)
    val w = ranked.map(_.getLong(1)).toSeq
    assert(w == w.sorted(Ordering[Long].reverse), "rank order does not follow weight desc")
    // tokenizing with the LOADED vocab is bit-identical to the in-memory path
    def counts(ps: Seq[String]) =
      Subword.subwordCounts(docs, ps).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(counts(loaded.toSeq) == counts(mem.toSeq))
    val gate = Subword.storedVocabGate(docs, size = 64, maxPieceLen = 4, path)
      .orderBy("doc_id").collect()
    assert(gate.length == 4)
    gate.foreach { r =>
      for (c <- Seq("vocab_viol", "tok_viol", "oov_viol"))
        assert(r.getAs[Long](c) == 0L, s"$c nonzero for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("BPE: merge learning order, apply fixpoint, and store round-trip") {
    import graft.text.Bpe
    val docs = Seq((1L, "ab ab ab"), (2L, "abc xyz")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, numMerges = 10)
    // (a,b) occurs 4x (3x in 'ab', 1x in 'abc') — the clear first merge;
    // (ab,c) then occurs once only, so learning stops (singletons earn no
    // merge) and the list is exactly one merge long
    assert(merges == Seq(("a", "b")))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.tokenizeWord("abab", ranks).toSeq == Seq("ab", "ab"))
    assert(Bpe.tokenizeWord("abc", ranks).toSeq == Seq("ab", "c"))
    // unseen chars stay unmerged singles — no OOV collapse
    assert(Bpe.tokenizeWord("qqab", ranks).toSeq == Seq("q", "q", "ab"))
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.saveMerges(spark, merges, path)
    assert(Bpe.loadMerges(spark, path) == merges)
    val counts = Bpe.bpeCounts(docs, merges).orderBy("doc_id").collect()
    assert(counts(0).getAs[Long]("bpe_tokens") == 3L, "'ab ab ab' -> 3 merged tokens")
    assert(counts(0).getAs[Long]("merged_words") == 3L)
    assert(counts(1).getAs[Long]("bpe_tokens") == 5L, "'abc xyz' -> ab+c, x+y+z")
  }

  test("BPE minCount floor: bounded collect, merges stable on the test corpus") {
    import graft.text.Bpe
    // constructed: frequent-word pairs dominate; the hapax word 'zq' carries
    // a pair no frequent word has, so its pair can never out-rank (a,b) and
    // dropping it cannot change the learned merges
    val docs = Seq((1L, "ab ab ab ab"), (2L, "ab ab zq")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, 10, minCount = 2) == Bpe.learnMerges(docs, 10),
      "dropping the hapax tail changed merges on a frequent-pair corpus")
    // the property the scaladoc documents, pinned on the real test corpus:
    // merge decisions are dominated by frequent words, so the production
    // minCount=2 floor learns the exact same merge list as the full histogram
    val corpus = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = Bpe.learnMerges(corpus, numMerges = 32)
    val floored = Bpe.learnMerges(corpus, numMerges = 32, minCount = 2)
    assert(floored == exact,
      "minCount=2 changed the learned merges on the test corpus")
  }

  test("Subword minCount floor: vocab from floored histogram still tokenizes frequent words") {
    import graft.text.Subword
    val docs = Seq((1L, "abab abab abab"), (2L, "abab qqqq")).toDF("doc_id", "text")
    val floored = Subword.collectPieces(docs, size = 8, maxPieceLen = 4, minCount = 2)
    // 'abab' survives the floor and tokenizes via learned pieces; 'qqqq'
    // was hapax — its chars left the alphabet, so it collapses to [UNK]
    // (the documented opt-in trade)
    val ml = floored.map(_.length).max
    assert(!Subword.tokenizeWord("abab", floored.toSet, ml).contains(Subword.Unk))
    assert(Subword.tokenizeWord("qqqq", floored.toSet, ml).toSeq == Seq(Subword.Unk))
  }

  test("packing and trimming compose with BPE token counts") {
    import graft.text.Bpe
    val docs = Seq((0L, "en", "ab ab ab"), (1L, "en", "abc"), (2L, "en", "x y z"))
      .toDF("doc_id", "lang", "text")
    val merges = Seq(("a", "b"))
    val withCounts = docs.join(
      Bpe.bpeCounts(docs, merges).select(col("doc_id"), col("bpe_tokens")),
      Seq("doc_id"))
    // BPE counts: doc0 = ab+ab+ab = 3, doc1 = ab+c = 2, doc2 = 3
    val packed = TextOps.packSequences(withCounts, budget = 3, shards = 1,
        tokenCount = Some(col("bpe_tokens")))
      .orderBy("doc_id").collect()
    assert(packed.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 2L, 3L),
      "packing consumed the BPE counts, not the whitespace counts")
    assert(packed.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 1L),
      "bins cut at the BPE-token budget")
    val trimmed = TextOps.lengthTrim(withCounts, loPct = 0.0, hiPct = 1.0,
      tokenCount = Some(col("bpe_tokens"))).collect()(0)
    assert(trimmed.getAs[Long]("kept_tokens") == 8L,
      "trim ranked and summed the BPE counts")
  }

  test("BPE invariant gate: zero violations on a mixed corpus") {
    import graft.text.Bpe
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "THE QUICK the quick 12345 a-b-c x!y?z"),
      (4L, "   "),
      (5L, "héllo 😀x café"),
      (6L, "\tx y")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_gate").toString
    val out = Bpe.invariantGate(docs, numMerges = 64, storePath = path)
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    out.foreach { r =>
      for (c <- Seq("concat_viol", "fixpoint_viol", "bound_viol", "store_viol", "dup_viol"))
        assert(r.getAs[Long](c) == 0L, s"$c nonzero for doc ${r.getAs[Long]("doc_id")}")
    }
    assert(out(0).getAs[Long]("n_words") == 9L)
    assert(out(3).getAs[Long]("n_words") == 1L, "whitespace-only text splits to ['']")
  }

  test("imageDhash: real decode round-trip, thumbnail path, corrupt fallback") {
    import graft.multimodal.Multimodal
    // 9x8 gray PNG rendered from a vector: decode must be bit-exact (the
    // q155 oracle contract), and repeated hashing deterministic
    val vecs = Seq((1L, (0 until 64).map(i => math.sin(i * 0.37)).toArray))
      .toDF("vec_id", "v")
    val media = Multimodal.renderGrayPngs(vecs, "vec_id", "v")
    val h1 = Multimodal.imageDhash(media).collect().head
    val h2 = Multimodal.imageDhash(media).collect().head
    assert(h1.decoded && h1 == h2)
    assert((h1.dhash >>> 63) == 0L, "63-bit hash must never touch the sign bit")
    // a non-9x8 image goes through the Graphics2D thumbnail: 2x
    // pixel-doubling then downscale must still decode (value may differ
    // from the 9x8 hash — interpolation is the codec's business — but the
    // path must be deterministic and flagged decoded)
    val big = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(media.collect().head.payload))
      val t = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 18)
        t.getRaster.setSample(x, y, 0, img.getRaster.getSample(x / 2, y / 2, 0))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(t, "png", bos)
      bos.toByteArray
    }
    val bigDs = Seq(Multimodal.MediaRecord(2L, big, "image/png")).toDS()
    val hb = Multimodal.imageDhash(bigDs).collect().head
    val hb2 = Multimodal.imageDhash(bigDs).collect().head
    assert(hb.decoded && hb == hb2)
    // corrupt payload: deterministic digest fallback, decoded = false,
    // task survives (the ImageIoCodec corrupt-input discipline)
    val junk = Seq(
      Multimodal.MediaRecord(3L, Array[Byte](1, 2, 3, 4), "image/png"),
      Multimodal.MediaRecord(4L, "PNG\r\n garbage".getBytes("ISO-8859-1"), "image/png"))
      .toDS()
    val hj = Multimodal.imageDhash(junk).collect().sortBy(_.doc_id)
    assert(hj.forall(h => !h.decoded && (h.dhash >>> 63) == 0L))
    assert(hj.map(_.dhash).distinct.length == 2)
  }

  test("sampleFrameHashes: real GIF decode, everyK stride, corrupt fallback") {
    import graft.multimodal.Multimodal
    val vecs = Seq(
      (1L, (0 until 64).map(i => math.cos(i * 0.21)).toArray),
      (2L, (0 until 64).map(i => math.sin(i * 0.43) * 2).toArray))
      .toDF("vec_id", "v")
    val gifs = Multimodal.renderGrayGifs(vecs, frames = 5, "vec_id", "v")
    // everyK = 2 over 5 frames -> indices 0, 2, 4 per doc
    val fh = Multimodal.sampleFrameHashes(gifs, everyK = 2).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(fh(1L).map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(fh.values.flatten.forall(h => h.decoded && (h.dhash >>> 63) == 0L))
    // frame 0 of the GIF must hash exactly like the still PNG of the same
    // vector (both are the f = 0 pixel formula through real decodes)
    val still = Multimodal.imageDhash(
      Multimodal.renderGrayPngs(vecs, "vec_id", "v")).collect()
      .map(h => h.doc_id -> h.dhash).toMap
    assert(fh(1L).head.dhash == still(1L) && fh(2L).head.dhash == still(2L),
      "GIF frame 0 and the still PNG disagree — a codec path is lossy")
    // determinism across invocations
    val again = Multimodal.sampleFrameHashes(gifs, everyK = 2).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(again(2L).map(_.dhash).toSeq == fh(2L).map(_.dhash).toSeq)
    // corrupt payload: exactly one fallback row, flagged, sign-safe
    val junk = Seq(Multimodal.MediaRecord(9L, Array[Byte](9, 9, 9), "image/gif")).toDS()
    val jf = Multimodal.sampleFrameHashes(junk).collect()
    assert(jf.length == 1 && !jf.head.decoded && jf.head.frame_idx == -1 &&
      (jf.head.dhash >>> 63) == 0L)
  }

  test("audioWindows: real WAV round-trip, exact stats, corrupt fallback") {
    import graft.multimodal.Multimodal
    val v = (0 until 64).map(i => math.sin(i * 0.37) * 4).toArray // some clamp
    val vecs = Seq((7L, v)).toDF("vec_id", "v")
    val wavs = Multimodal.renderPcmWavs(vecs, samples = 130, "vec_id", "v")
    val w = Multimodal.audioWindows(wavs, window = 64).collect().sortBy(_.win)
    // 130 samples / 64 -> windows of 64, 64, 2
    assert(w.map(_.n_samples).toSeq == Seq(64L, 64L, 2L))
    assert(w.forall(_.decoded))
    def s(j: Int) = math.floor(math.min(1.0, math.max(-1.0, v(j % 64) / 3.0)) * 32767.0).toInt
    val exp0 = (0 until 64).map(s)
    assert(w(0).min_s == exp0.min && w(0).max_s == exp0.max &&
      w(0).sum_s == exp0.map(_.toLong).sum &&
      w(0).sum_sq == exp0.map(x => x.toLong * x).sum,
      "decoded window stats diverge from the PCM closed form")
    assert(w(2).sum_s == (128 until 130).map(s).map(_.toLong).sum)
    // corrupt payload -> one flagged fallback row
    val junk = Seq(Multimodal.MediaRecord(8L, Array[Byte](1, 2, 3), "audio/wav")).toDS()
    val jw = Multimodal.audioWindows(junk, window = 64).collect()
    assert(jw.length == 1 && !jw.head.decoded && jw.head.win == -1)

    // ADVICE r10: non-canonical-but-valid PCM CONVERTS through the JDK's
    // deterministic PCM codec instead of falling back, and formats the
    // codec cannot reach flag win = -2 — distinguishable from corrupt (-1)
    import javax.sound.sampled._
    def container(fmt: AudioFormat, raw: Array[Byte],
                  tpe: AudioFileFormat.Type): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt,
        raw.length / fmt.getFrameSize), tpe, bos)
      bos.toByteArray
    }
    // 8-bit unsigned mono WAV: the codec widens (b - 128) << 8 with
    // saturation at full scale (255 -> 32767, measured JDK behavior)
    val u8 = container(
      new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false),
      Array[Byte](0, 128.toByte, 255.toByte, 64), AudioFileFormat.Type.WAVE)
    val w8 = Multimodal.audioWindows(
      Seq(Multimodal.MediaRecord(9L, u8, "audio/wav")).toDS(), window = 4).collect()
    assert(w8.length == 1 && w8.head.decoded && w8.head.win == 0, s"u8: ${w8.toSeq}")
    assert(w8.head.n_samples == 4L && w8.head.min_s == -32768 && w8.head.max_s == 32767
      && w8.head.sum_s == -16385L, s"u8 conversion stats: ${w8.head}")
    // big-endian 16-bit mono (AIFF container): endianness converts exactly
    val be = container(new AudioFormat(8000f, 16, 1, true, true),
      Array[Byte](0x03, 0xE8.toByte, 0xF8.toByte, 0x30), AudioFileFormat.Type.AIFF)
    val wb = Multimodal.audioWindows(
      Seq(Multimodal.MediaRecord(10L, be, "audio/aiff")).toDS(), window = 4).collect()
    assert(wb.length == 1 && wb.head.decoded && wb.head.n_samples == 2L, s"be: ${wb.toSeq}")
    assert(wb.head.min_s == -2000 && wb.head.max_s == 1000 && wb.head.sum_s == -1000L,
      s"be conversion stats: ${wb.head}")
    // stereo: valid container, but the JDK codec has no down-mix -> win -2
    val st = container(new AudioFormat(8000f, 16, 2, true, false),
      Array.fill(16)(0: Byte), AudioFileFormat.Type.WAVE)
    val ws = Multimodal.audioWindows(
      Seq(Multimodal.MediaRecord(11L, st, "audio/wav")).toDS(), window = 4).collect()
    assert(ws.length == 1 && !ws.head.decoded && ws.head.win == -2,
      s"stereo must flag format-skip (-2), not corrupt: ${ws.toSeq}")
  }

  test("dhashPairs finds planted near-dup twins and nothing spurious") {
    import graft.multimodal.Multimodal
    val rng = new scala.util.Random(11)
    val base = (0 until 50).map(i => (i.toLong, Array.fill(64)(rng.nextDouble() * 4 - 2)))
    // twins of ids 0..4: one dimension nudged (small pixel move)
    val twins = (0 until 5).map { i =>
      val v = base(i)._2.clone(); v(i) += 0.125
      (1000L + i, v)
    }
    val hashes = Multimodal.imageDhash(Multimodal.renderGrayPngs(
      (base ++ twins).toDF("vec_id", "v"), "vec_id", "v")).toDF()
    val pairs = Multimodal.dhashPairs(hashes, maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    (0 until 5).foreach(i =>
      assert(pairs.contains((i.toLong, 1000L + i)), s"planted twin $i not found"))
    // random 64-dim vectors are ~32 bits apart — no spurious pairs at <= 8
    assert(pairs.size == 5, s"unexpected extra pairs: ${pairs.size}")
  }

  test("lengthTrim drops each group's 5 percent tails by rank") {
    val docs = (1 to 20).map(i => (i.toLong, "en", Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = TextOps.lengthTrim(docs).collect()
    assert(out.length == 1)
    val r = out(0)
    // n=20: keep ranks 2..19 -> lengths 2..19
    assert(r.getAs[Long]("n_docs") == 20L && r.getAs[Long]("n_kept") == 18L)
    assert(r.getAs[Long]("min_kept_tokens") == 2L && r.getAs[Long]("max_kept_tokens") == 19L)
    assert(r.getAs[Long]("kept_tokens") == (2 to 19).sum.toLong)
  }
}
