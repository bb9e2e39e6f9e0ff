package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Behavioral units for the round-12 curation operators: cluster
  * representative selection (keep-best per near-dup cluster) and
  * temperature-based language mixture sampling (τ = 0.5).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- clusterRepresentatives -------------------------------------------

  private def repsOf(scored: Seq[(Long, Double)], clusters: Seq[(Long, Long)]) =
    Dedup.clusterRepresentatives(
      scored.toDF("doc_id", "q"), clusters.toDF("doc_id", "cluster_id"))
      .select("doc_id", "cluster_id", "n_members", "keep")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

  test("cluster reps: highest quality wins, singletons keep themselves") {
    // cluster 1 = {1,2,3} with 2 the best; cluster 10 = {10,11} tied on
    // quality -> smallest id wins; 20 is unclustered
    val out = repsOf(
      scored = Seq(1L -> 0.1, 2L -> 0.9, 3L -> 0.5, 10L -> 0.7, 11L -> 0.7, 20L -> 0.2),
      clusters = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(out === Seq(
      (1L, 1L, 3L, 0L), (2L, 1L, 3L, 1L), (3L, 1L, 3L, 0L),
      (10L, 10L, 2L, 1L), (11L, 10L, 2L, 0L),
      (20L, 20L, 1L, 1L)))
  }

  test("cluster reps: exactly one keeper per cluster, any partitioning") {
    val scored = (1L to 200L).map(i => (i, (i * 37 % 101) / 101.0))
    val clusters = (1L to 150L).map(i => (i, i % 10)) // ten 15-member clusters
    val out = Dedup.clusterRepresentatives(
      scored.toDF("doc_id", "q").repartition(7),
      clusters.toDF("doc_id", "cluster_id").repartition(3))
    val perCluster = out.groupBy("cluster_id")
      .agg(sum("keep").as("k"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(perCluster.length === 10 + 50) // ten clusters + fifty singletons
    assert(perCluster.forall(_._2 == 1L), "every cluster keeps exactly one")
    // the keeper is the max-quality member (ties impossible here by construction)
    val best = scored.take(150).groupBy(_._1 % 10).map { case (c, ms) =>
      c -> ms.maxBy(m => (m._2, -m._1))._1
    }
    val kept = out.filter(col("keep") === 1 && col("n_members") > 1)
      .select("cluster_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(kept === best)
  }

  // ---- corpusDelta ------------------------------------------------------

  test("corpus delta: all four verdicts, by content not by id presence alone") {
    val a = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new text"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Dedup.corpusDelta(a.repartition(3), b.repartition(2))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out === Seq(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added"))
  }

  test("corpusDeltaOn: metadata-only edits are 'changed'; nulls and boundaries don't collide") {
    val a = Seq((1L, "same", "en"), (2L, "same", "de"), (3L, "x", "y"))
      .toDF("doc_id", "text", "lang")
    // doc 2: text unchanged, lang flips — the text-only delta's blind spot
    val b = Seq((1L, "same", "en"), (2L, "same", "fr"), (3L, "x", "y"))
      .toDF("doc_id", "text", "lang")
    val out = Dedup.corpusDeltaOn(a, b, Seq("text", "lang"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out === Seq(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged"))
    // null vs empty-string must differ (the per-column fold's `-` token
    // vs md5("") is what keeps ("a", null) and ("a", "") apart)
    val an = Seq((1L, Some("a"), None: Option[String])).toDF("doc_id", "text", "lang")
    val bn = Seq((1L, Some("a"), Some(""))).toDF("doc_id", "text", "lang")
    val outN = Dedup.corpusDeltaOn(an, bn, Seq("text", "lang"))
      .as[(Long, String)].collect()
    assert(outN === Array(1L -> "changed"))
    // column-boundary shifts must differ ("ab","c" vs "a","bc")
    val ab = Seq((1L, "ab", "c")).toDF("doc_id", "text", "lang")
    val ab2 = Seq((1L, "a", "bc")).toDF("doc_id", "text", "lang")
    val outB = Dedup.corpusDeltaOn(ab, ab2, Seq("text", "lang"))
      .as[(Long, String)].collect()
    assert(outB === Array(1L -> "changed"))
    // ADVERSARIAL bytes (r15 ADVICE 3): a value that IS a would-be null
    // sentinel must differ from an actual null — the per-column-md5
    // encoding reserves no byte, so "\u0000" is just another value
    val az = Seq((1L, "a", "\u0000")).toDF("doc_id", "text", "lang")
    val an2 = Seq((1L, Some("a"), None: Option[String])).toDF("doc_id", "text", "lang")
    assert(Dedup.corpusDeltaOn(az, an2, Seq("text", "lang"))
      .as[(Long, String)].collect() === Array(1L -> "changed"))
    // and a value CONTAINING a would-be separator cannot shift a column
    // boundary: ("a\u001fb", "c") vs ("a", "b\u001fc")
    val sepA = Seq((1L, "a\u001fb", "c")).toDF("doc_id", "text", "lang")
    val sepB = Seq((1L, "a", "b\u001fc")).toDF("doc_id", "text", "lang")
    assert(Dedup.corpusDeltaOn(sepA, sepB, Seq("text", "lang"))
      .as[(Long, String)].collect() === Array(1L -> "changed"))
  }

  test("incremental re-curation through the delta == full recompute") {
    val a = Seq((1L, "the cat sat"), (2L, "old words here"), (3L, "gone now"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "the cat sat"), (2L, "new words here now"), (4L, "a fresh doc"))
      .toDF("doc_id", "text")
    val delta = Dedup.corpusDelta(a, b)
    val inc = TextOps.qualityFeatures(a)
      .join(delta.filter(col("status") === "unchanged").select("doc_id"), "doc_id")
      .unionByName(TextOps.qualityFeatures(
        b.join(delta.filter(col("status").isin("added", "changed"))
          .select("doc_id"), "doc_id")))
    val full = TextOps.qualityFeatures(b)
    assert(inc.collect().map(_.toString).sorted ===
      full.collect().map(_.toString).sorted)
  }

  // ---- temperatureSampleByLang ------------------------------------------

  private def mixDocs(perLang: Map[String, Int]) = {
    val rows = perLang.toSeq.sortBy(_._1).flatMap { case (lang, n) =>
      (1 to n).map(i => (lang, ("w " * (5 + i % 7)).trim))
    }.zipWithIndex.map { case ((lang, text), id) => (id.toLong, lang, text) }
    rows.toDF("doc_id", "lang", "text")
  }

  test("mixture sample: low-resource lang keeps everything, head downsamples") {
    val docs = mixDocs(Map("en" -> 900, "fr" -> 60, "de" -> 40))
    val out = TextOps.temperatureSampleByLang(docs, budgetPpm = 500000L)
      .select("lang", "n_docs", "tok_total", "thr_ppm", "n_kept", "tok_kept")
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // τ=0.5 flattening: the rare languages' tempered share exceeds their
    // natural share, so their rate caps at 1e6 ppm (keep everything);
    // the dominant language must be cut below its raw mass
    assert(out("fr")._4 === 1000000L && out("de")._4 === 1000000L)
    assert(out("fr")._5 === out("fr")._2 && out("de")._5 === out("de")._2)
    assert(out("en")._4 < 1000000L)
    assert(out("en")._5 < out("en")._2)
    // kept token mass stays within the budget's ballpark (hash gate is
    // unbiased; wide tolerance keeps this deterministic-but-not-exact
    // check robust)
    val totalTok = out.values.map(_._3).sum
    val keptTok = out.values.map(_._6).sum
    assert(keptTok > totalTok * 3 / 10 && keptTok < totalTok * 8 / 10)
  }

  test("mixture sample: determinism and budget monotonicity") {
    val docs = mixDocs(Map("en" -> 400, "es" -> 100))
    val a = TextOps.temperatureSampleByLang(docs, budgetPpm = 500000L).collect()
    val b = TextOps.temperatureSampleByLang(docs.repartition(13), budgetPpm = 500000L)
      .collect()
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted,
      "gate is a pure hash function of (doc_id, lang totals)")
    val half = TextOps.temperatureSampleByLang(docs, budgetPpm = 500000L)
      .agg(sum("n_kept")).as[Long].head()
    val fifth = TextOps.temperatureSampleByLang(docs, budgetPpm = 200000L)
      .agg(sum("n_kept")).as[Long].head()
    assert(fifth < half, "smaller budget keeps fewer docs")
  }

  test("mixture sample: kept-docs frame agrees with the audit counts") {
    val docs = mixDocs(Map("en" -> 300, "fr" -> 50))
    val audit = TextOps.temperatureSampleByLang(docs, budgetPpm = 400000L)
      .select("lang", "n_kept").as[(String, Long)].collect().toMap
    val kept = TextOps.temperatureSampleDocs(docs, budgetPpm = 400000L)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(kept === audit.filter(_._2 > 0))
  }

  test("filter attribution: first_fail charges the first failing rule; funnel books to kept") {
    val stop = Seq("the", "a", "of", "and", "in", "to", "is")
    val stopPart = (0 until 40).map(i => stop(i % 7))
    def rich(prefix: String) =
      (stopPart ++ (0 until 60).map(i => s"$prefix$i")).mkString(" ")
    val corpus = Seq(
      1L -> "x x", // 2 words -> length fail (also repetitive: charged to length)
      2L -> "y y y y y y", // 6 words, no stopwords -> quality 0.036 -> quality fail
      3L -> (("the " * 40) + (0 until 60).map(i => s"z$i").mkString(" ")).trim,
      //      ^ quality 1.0 but top-word fraction 0.4 -> repetition fail
      4L -> rich("w"), 5L -> rich("w"), // identical twins -> dup-shingle fail
      6L -> rich("u") // shares only the stop-region shingles (~0.39) -> pass
    ).toDF("doc_id", "text")
    val att = TextOps.filterAttribution(corpus)
    val ff = att.select("doc_id", "first_fail").as[(Long, String)].collect().toMap
    assert(ff === Map(1L -> "0_length", 2L -> "1_quality", 3L -> "2_repetition",
      4L -> "3_dupngram", 5L -> "3_dupngram", 6L -> "pass"))
    assert(att.filter(col("kept")).select("doc_id").as[Long].collect().toSeq == Seq(6L))
    val funnel = TextOps.filterFunnel(att)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(funnel === Seq(
      ("0_length", 6L, 1L, 5L), ("1_quality", 5L, 1L, 4L),
      ("2_repetition", 4L, 1L, 3L), ("3_dupngram", 3L, 2L, 1L)))
  }

  test("pipeline kill matrix: funnel reconciles exactly with q189's stage counts") {
    val d = "/root/testdata/sf0.001"
    val v4 = SparkEntry.queries("q189_pipeline_v4")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fun = SparkEntry.queries("q193_pipeline_funnel")(spark, d)
      .as[(String, Long, Long, Long)].collect()
    val nIn = fun.map(t => t._1 -> t._2).toMap
    val nOut = fun.map(t => t._1 -> t._4).toMap
    // each funnel stage's survivors are the matching q189 stage count
    assert(nIn("1_length") == v4("1_raw"))
    assert(nOut("1_length") == v4("2_clean"))
    assert(nOut("2_exact_dup") == v4("3_exact"))
    assert(nOut("3_near_dup") == v4("4_neardup"))
    assert(nOut("4_quality") == v4("5_quality"))
    assert(nOut("5_balance") == v4("6_balance"))
    assert(nOut("6_classifier") == v4("9_sample"))
    assert(nOut("7_dsir") == v4("a_dsir"))
    // chain integrity: n_in chains from the previous n_out, kills book
    fun.sliding(2).foreach { w => assert(w(1)._2 == w(0)._4) }
    fun.foreach(t => assert(t._2 - t._3 == t._4))
    // the per-doc matrix agrees with its own funnel tail
    val kept = SparkEntry.queries("q192_pipeline_kill_matrix")(spark, d)
      .filter(col("kept")).count()
    assert(kept == nOut("7_dsir"))
  }

  // ---- DSIR importance resampling ---------------------------------------

  private def dsirCorpus: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // target-typical vocabulary {alpha..delta}, raw-typical {noise0..noise9};
    // docs 0-9 speak pure target, 10-29 pure noise, 30-34 half-half
    val tgt = Seq("alpha beta gamma delta", "beta gamma alpha alpha",
      "delta delta beta gamma", "gamma alpha beta delta")
    val docs = (0L until 35L).map { i =>
      val text =
        if (i < 10) tgt((i % 4).toInt)
        else if (i < 30) s"noise${i % 10} noise${(i + 3) % 10} noise${(i + 7) % 10}"
        else s"alpha beta noise${i % 10} noise${(i + 1) % 10}"
      (i, text)
    }.toDF("doc_id", "text")
    (docs.filter(col("doc_id") < 10), docs)
  }

  test("dsir: target-typical docs score positive, raw-typical negative, mixed between") {
    val (target, raw) = dsirCorpus
    val model = TextOps.dsirBucketLlr(target, raw, m = 256)
    val scored = TextOps.dsirSample(TextOps.dsirScore(raw, model, m = 256))
      .select("doc_id", "dsir6", "rate_ppm")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byId = scored.map(r => r._1 -> r).toMap
    assert((0L until 10L).forall(byId(_)._2 > 0), "pure-target docs must score positive")
    assert((10L until 30L).forall(byId(_)._2 < 0), "pure-noise docs must score negative")
    assert((0L until 10L).forall(byId(_)._3 > 500000L), "target docs must gate above p=0.5")
    assert((10L until 30L).forall(byId(_)._3 < 500000L), "noise docs must gate below p=0.5")
    val mixed = (30L until 35L).map(byId(_)._2)
    assert(mixed.forall(d => d > byId(10L)._2 && d < byId(0L)._2),
      "half-half docs must land between the pure poles")
  }

  test("dsir store: grown == monolithic, retire == fresh fit on survivors, replay refused") {
    val (_, raw) = dsirCorpus
    val isT = col("doc_id") < 10
    def freshOver(corpus: org.apache.spark.sql.DataFrame) =
      TextOps.dsirSample(TextOps.dsirScore(corpus,
          TextOps.dsirBucketLlr(corpus.filter(isT), corpus, m = 256), m = 256))
        .collect().map(_.toString).sorted.toSeq
    val p = java.nio.file.Files.createTempDirectory("graft_dsir_store").toString
    TextOps.saveDsir(raw.filter(col("doc_id") % 2 === 0), isT, m = 256, p)
    assert(TextOps.appendDsir(raw.filter(col("doc_id") % 2 === 1), isT, p, appendId = 1))
    assert(!TextOps.appendDsir(raw.filter(col("doc_id") % 2 === 1), isT, p, appendId = 1),
      "append replay must be refused by the dir ledger")
    def stored(corpus: org.apache.spark.sql.DataFrame) =
      TextOps.scoreWithDsir(corpus, p).collect().map(_.toString).sorted.toSeq
    assert(stored(raw) == freshOver(raw), "grown store must equal the monolithic fit")
    assert(TextOps.compactDsir(spark, p) == 1)
    assert(stored(raw) == freshOver(raw), "compaction changed scores")
    // retirement: the mixed slice (30-34) leaves the corpus; the store must
    // score the survivors exactly like a fresh fit that never saw it
    val survivors = raw.filter(col("doc_id") < 30)
    assert(TextOps.retireDsir(raw.filter(col("doc_id") >= 30), isT, p, appendId = 2))
    assert(stored(survivors) == freshOver(survivors),
      "retired store must equal a fresh fit on the survivors (pre-compaction)")
    assert(TextOps.compactDsir(spark, p) == 1)
    assert(stored(survivors) == freshOver(survivors),
      "retirement-applying compaction changed scores")
    // the compacted count table is row-identical to a fresh build's
    val p2 = java.nio.file.Files.createTempDirectory("graft_dsir_fresh").toString
    TextOps.saveDsir(survivors, isT, m = 256, p2)
    def rows(path: String) = spark.read.parquet(s"$path/buckets/batch=0")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(p) == rows(p2),
      "compacted retire+append store must be row-identical to a fresh build")
  }

  test("dsir: partition-invariant and deterministic; every input doc returned") {
    val (target, raw) = dsirCorpus
    def run(t: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      TextOps.dsirSample(TextOps.dsirScore(r,
          TextOps.dsirBucketLlr(t, r, m = 256), m = 256))
        .collect().map(_.toString).sorted.toSeq
    val a = run(target, raw)
    val b = run(target.repartition(7), raw.repartition(5))
    assert(a == b, "DSIR must be partition-invariant")
    assert(a.size == 35, "every input document must come back")
  }

  // ---- v4 incremental advance: winner PROMOTION --------------------------
  // Regression for the r13 advisor's high finding: anti-joining the append
  // set against stayIds (winners-in-B ∩ unchanged) instead of the actual
  // surviving store rows (keptPrev ∩ stayIds) silently skips an UNCHANGED
  // doc newly promoted to exact-winner — it was never appended (it was a
  // dup loser in A), so the store cannot mine its near-dup pairs and the
  // incremental frame diverges from the monolithic rebuild. sf0.001/sf0.01
  // contain zero exact-dup groups, so the scenario is planted here.

  test("v4 advance: unchanged doc promoted to exact-winner re-enters the minhash store") {
    import graft.queries.CorpusQueries
    val sfDocs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val dupT = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles watch quietly from the warm sandy riverbank nearby"
    val nearT = dupT.replace("riverbank nearby", "riverbank today")
    def crafted(id: Long, text: String) =
      Seq((id, text, "en", "crafted", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // A: 9000001/9000002 are an exact-dup group (winner = 9000001);
    // 9000000 is a near-dup of that text (one word differs → word-trigram
    // jaccard 17/19 ≈ 0.895 ≥ the 0.8 mine threshold)
    val a = sfDocs.unionByName(crafted(9000000L, nearT))
      .unionByName(crafted(9000001L, dupT))
      .unionByName(crafted(9000002L, dupT))
    // B: the group's winner 9000001 is REVISED → the UNCHANGED 9000002 is
    // promoted to winner; it must be appended (it was never stored) or its
    // near-dup pair with 9000000 is unminable
    val revised = "a completely different replacement text about quantum " +
      "harvesting machines and nine silver owls"
    val b = a.filter(col("doc_id") =!= 9000001L)
      .unionByName(crafted(9000001L, revised))
    val root = java.nio.file.Files.createTempDirectory("graft_v4_promote").toString
    val featA = CorpusQueries.v4BuildStoresOnA(spark, a, s"$root/inc/mh", s"$root/inc/dsir")
    val featB = CorpusQueries.v4AdvanceStores(spark, a, b, featA,
      s"$root/inc/mh", s"$root/inc/dsir",
      mhRetireId = 2, mhAppendId = 3, dsirRetireId = 1, dsirAppendId = 2)
    val pairs = graft.streaming.StreamingPipeline
      .readDedupPairs(spark, s"$root/inc/mh")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((9000000L, 9000002L)),
      "the promoted winner's near-dup pair must be minable from the store")
    assert(!pairs.exists(p => p._1 == 9000001L || p._2 == 9000001L),
      "the revised doc's old pairs must be dead after its retirement")
    val frameInc = CorpusQueries
      .v4FrameFromStores(spark, b, featB, s"$root/inc/mh", s"$root/inc/dsir")
      .collect().map(_.toString).toSeq
    // reference = the same stores built from scratch on B (the q191
    // convergence convention: incremental must equal the monolithic rebuild)
    val featBfs = CorpusQueries.v4BuildStoresOnA(spark, b, s"$root/fs/mh", s"$root/fs/dsir")
    val frameFs = CorpusQueries
      .v4FrameFromStores(spark, b, featBfs, s"$root/fs/mh", s"$root/fs/dsir")
      .collect().map(_.toString).toSeq
    assert(frameInc == frameFs,
      "incremental frame diverges from from-scratch after winner promotion")
  }
}
