package graft

import graft.forecast.Forecast
import graft.ingest.Ingest
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven invariants (SURVEY.md §5 test plan:
  * "properties for coercion/normalizer invariants"). Plain scalacheck Gen
  * with fixed seeds (the scalatest bridge artifact is not available in the
  * offline cache), so every run checks the same deterministic sample set.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def draws[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val finiteD = Gen.chooseNum(-1e6, 1e6)

  test("normalizer invariant: any bounds => exactly 7 rows, lower<=yhat<=upper, ascending Z dates") {
    for (vals <- draws(Gen.chooseNum(1, 9).flatMap(n => Gen.listOfN(n, Gen.zip(finiteD, finiteD, finiteD))), 8)) {
      val rows = vals.zipWithIndex.map { case ((y, lo, hi), i) =>
        (1L, "m", java.sql.Date.valueOf(java.time.LocalDate.of(2025, 1, 1).plusDays(i)), y, lo, hi, "v")
      }
      val df = rows.toDF("source_id", "metric", "target_date", "yhat", "yhat_lower", "yhat_upper", "model_version")
      val out = Forecast.normalizeContract(df).orderBy("metric_date").collect()
      assert(out.length == 7)
      out.foreach { r =>
        val y = r.getAs[Double]("yhat")
        assert(r.getAs[Double]("yhat_lower") <= y && y <= r.getAs[Double]("yhat_upper"))
        assert(r.getAs[String]("metric_date").endsWith("T00:00:00Z"))
      }
      val dates = out.map(_.getAs[String]("metric_date")).toSeq
      assert(dates == dates.sorted)
    }
  }

  test("coercion never throws: arbitrary strings -> value or null+warning") {
    for (raws <- draws(Gen.listOfN(20, Gen.zip(Gen.alphaNumStr, Gen.oneOf(Gen.alphaNumStr, Gen.numStr))), 8)) {
      val df = raws.map { case (t, v) => (t, v, null.asInstanceOf[String]) }
        .toDF("ts_raw", "value_raw", "metric_raw")
      val out = Ingest.cleanRows(df).collect()
      assert(out.length == raws.length)
      out.foreach { r =>
        val warned = !r.isNullAt(r.fieldIndex("warn"))
        val parsedOk = !r.isNullAt(r.fieldIndex("ts")) && !r.isNullAt(r.fieldIndex("value"))
        assert(warned || parsedOk) // every row is either clean or flagged
        assert(r.getAs[String]("metric") == "events_total")
      }
    }
  }

  test("gap-fill invariant: output spans every day of [min,max] exactly once per series") {
    for (dayOffsets <- draws(Gen.nonEmptyListOf(Gen.chooseNum(0, 40)), 8)) {
      val distinctDays = dayOffsets.distinct
      val rows = distinctDays.map(i =>
        (1L, "m", java.sql.Date.valueOf(java.time.LocalDate.of(2025, 1, 1).plusDays(i)), 7.5))
      val out = graft.operators.Windows.gapFillDaily(
        rows.toDF("source_id", "metric", "metric_date", "value"), Seq("source_id", "metric"))
        .collect()
      val span = distinctDays.max - distinctDays.min + 1
      assert(out.length == span)
      assert(out.map(_.getAs[java.sql.Date]("metric_date").toString).distinct.length == span)
      assert(out.count(_.getAs[Double]("value") == 0.0) == span - distinctDays.length)
    }
  }

  test("hex60 expression == composed md5 column chain for arbitrary strings") {
    val strs = draws(Gen.nonEmptyListOf(Gen.alphaNumStr), 4).flatten.distinct
    val df = strs.toDF("s")
    val both = df.select(
      graft.expressions.Hex60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("bloom filter: no false negatives and a brute-force membership twin on random sets") {
    // deliberately TINY m (crowded filter) so collisions are common — the
    // no-false-negative property must hold even when nearly every bit is set
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.identifier))
    for ((ms, ps) <- draws(Gen.zip(wordGen, wordGen), 6)) {
      val members = ms.distinct.toDF("item")
      val probes = (ms ++ ps).distinct.toDF("item")
      val words = graft.sketch.Sketches.bloomWords(members, "item", k = 3, m = 256)
      val got = graft.sketch.Sketches
        .bloomMightContain(probes, words, "item", k = 3, m = 256)
        .collect().map(r => r.getAs[String]("item") -> r.getAs[Boolean]("might_contain")).toMap
      val memberSet = ms.toSet
      (ms ++ ps).distinct.foreach { it =>
        if (memberSet(it))
          assert(got(it), s"false negative for member '$it'")
      }
      // brute-force twin: might_contain iff all k bits collide with SOME member's bits
      val bitOf = (seed: Int, s: String) => {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$s".getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 256
      }
      val setBits = memberSet.flatMap(s => (0 until 3).map(k => bitOf(k, s)))
      (ms ++ ps).distinct.foreach { it =>
        val expect = (0 until 3).forall(k => setBits(bitOf(k, it)))
        assert(got(it) == expect, s"membership verdict for '$it' diverged from brute force")
      }
    }
  }

  test("bloom OR-merge: any 2-way partition of a set merges to the monolithic filter bit-for-bit") {
    val wordGen = Gen.nonEmptyListOf(Gen.identifier)
    def words(items: Seq[String]): Set[(Long, Long)] =
      graft.sketch.Sketches.bloomWords(items.toDF("item"), "item", k = 3, m = 256)
        .collect().map(r => (r.getAs[Long]("word_idx"), r.getAs[Long]("word"))).toSet
    for ((items, cut) <- draws(Gen.zip(wordGen, Gen.choose(0, 100)), 6)) {
      val all = items.distinct
      // arbitrary (possibly empty-sided) split — OR over per-item
      // contributions must be partition-independent, which is the
      // invariant appendDecontamBench's exactness rests on
      val (a, b) = all.partition(s => (s.hashCode & 0x7fffffff) % 100 < cut)
      val merged = graft.sketch.Sketches.bloomMergeWords(
          graft.sketch.Sketches.bloomWords(a.toDF("item"), "item", k = 3, m = 256),
          graft.sketch.Sketches.bloomWords(b.toDF("item"), "item", k = 3, m = 256))
        .collect().map(r => (r.getAs[Long]("word_idx"), r.getAs[Long]("word"))).toSet
      assert(merged == words(all),
        s"merged filter diverged from monolithic for split $cut")
    }
  }

  test("LM additivity: appends over any partition of the corpus score like the monolithic fit") {
    val vocab = Gen.oneOf("the", "cat", "sat", "mat", "dog", "ran", "past", "door")
    val docGen = Gen.listOfN(10,
      Gen.zip(Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, vocab).map(_.mkString(" "))),
        Gen.choose(0, 2)))
    for ((docsRaw, i) <- draws(docGen, 3).zipWithIndex) {
      val docs = docsRaw.zipWithIndex.map { case ((text, grp), id) => (id.toLong, text, grp) }
      val df = docs.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      val path = java.nio.file.Files.createTempDirectory(s"graft_lm_prop$i").toString + "/lm"
      def part(g: Int) = docs.filter(_._3 == g).map { case (id, t, _) => (id, t) }
        .toDF("doc_id", "text")
      // group 0 is the build (possibly empty corpora are exercised by the
      // random assignment landing all docs in one group)
      graft.text.TextOps.saveLm(part(0), path)
      graft.text.TextOps.appendLm(part(1), path, appendId = 1)
      graft.text.TextOps.appendLm(part(2), path, appendId = 2)
      def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
        d.orderBy("doc_id").collect().map(_.toString).toSeq
      assert(canon(graft.text.TextOps.scoreWithLm(df, path)) ==
        canon(graft.text.TextOps.trigramBackoffNll(df)),
        s"partitioned store diverged from monolithic fit on draw $i")
    }
  }

  test("PCA moment sums are additive: any 3-way split merges to the monolithic table") {
    import graft.similarity.Pca
    val dim = 6
    for (seed <- 0 until 3) {
      val vecs = draws(Gen.listOfN(40, Gen.listOfN(dim, Gen.chooseNum(-5.0, 5.0))), 1).head
        .zipWithIndex.map { case (v, i) => ((i + seed * 100).toLong, v) }
      val df = vecs.toDF("vec_id", "embedding")
      val cuts = draws(Gen.listOfN(2, Gen.choose(0, vecs.length)), 1).head.sorted
      val parts = (Seq(0) ++ cuts ++ Seq(vecs.length)).sliding(2).map {
        case Seq(a, b) => vecs.slice(a, b).toDF("vec_id", "embedding")
      }.toSeq
      val merged = parts.map(p => Pca.momentSums(p, dim))
        .reduce(Pca.mergeMoments)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val mono = Pca.momentSums(df, dim)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(merged == mono, s"seed $seed: split-merged moments differ from monolithic")
    }
  }

  test("misra-gries guarantee holds over any partition split of random skewed streams") {
    val itemGen = Gen.frequency(
      (8, Gen.choose(0, 4)),    // a few hot items
      (4, Gen.choose(5, 30)),   // warm band
      (1, Gen.choose(31, 400))) // long tail
    for (seed <- 0 until 6) {
      val items = draws(Gen.listOfN(600, itemGen), 1).head.map(_.toString)
      val k = 8
      val n = items.length
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // arbitrary split points -> per-part MG + fold merge, as the
      // distributed path does per partition
      val cuts = draws(Gen.listOfN(3, Gen.choose(0, n)), 1).head.sorted
      val parts = (Seq(0) ++ cuts ++ Seq(n)).sliding(2).map {
        case Seq(a, b) => items.slice(a, b)
      }.toSeq
      val merged = parts.foldLeft(Map.empty[String, Long]) { (acc, p) =>
        graft.sketch.Sketches.mgMerge(acc,
          graft.sketch.Sketches.mgReduce(p.iterator, k), k)
      }
      assert(merged.size <= k, s"summary overflows k: ${merged.size}")
      exact.foreach { case (item, cnt) =>
        if (cnt > n.toDouble / k) {
          val est = merged.getOrElse(item, 0L)
          assert(est > 0, s"true heavy hitter $item ($cnt of $n) missing")
          assert(est <= cnt, s"$item overcounted: $est > $cnt")
          assert(cnt - est <= n.toDouble / k, s"$item error ${cnt - est} > n/k")
        }
      }
    }
  }

  test("MG epoch prefix-fold: folding any prefix into one summary first changes nothing") {
    // the epoch-compaction exactness claim (compactMgSlices): the merge is
    // NOT associative in general (each cut loses information), but an
    // epoch built as the rebuild's PREFIX fold composes exactly —
    // fold(fold(s0..si), si+1..) == fold(s0..sn) for every cut point,
    // because the left fold factors through any of its own prefixes.
    val itemGen = Gen.frequency(
      (6, Gen.choose(0, 2)), (3, Gen.choose(3, 12)), (1, Gen.choose(13, 300)))
    for (seed <- 0 until 6) {
      val k = 8
      val slices = (0 until 7).map(i =>
        draws(Gen.listOfN(80, itemGen), 1).head.map(_.toString))
      val summaries = slices.map(s =>
        graft.sketch.Sketches.mgReduce(s.iterator, k).toMap: collection.Map[String, Long])
      def fold(ss: Seq[collection.Map[String, Long]]) =
        ss.foldLeft(Map.empty[String, Long])(
          (acc, p) => graft.sketch.Sketches.mgMerge(acc, p, k))
      val direct = fold(summaries)
      for (cut <- 1 until summaries.length) {
        val epoch = fold(summaries.take(cut))
        assert(fold(epoch +: summaries.drop(cut)) == direct,
          s"epoch at prefix $cut diverges from the direct fold")
      }
    }
  }

  test("as-of join matches a brute-force per-row reference on random data") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 40L))
    for ((ls, rs) <- draws(Gen.zip(Gen.listOfN(25, rowGen), Gen.listOfN(15, rowGen)), 8)) {
      val left = ls.zipWithIndex.map { case ((kk, t), i) => (i.toLong, s"k$kk", t) }
        .toDF("id", "key", "ts")
      // payload encodes (key, ts, uniq) so the expected pick is computable
      val right = rs.zipWithIndex.map { case ((kk, t), i) => (s"k$kk", t, f"p$t%03d_$i%02d") }
        .toDF("key", "ts", "payload")
      val got = graft.operators.AsofJoin.backward(left, right, Seq("key"), "ts", "ts", "left")
        .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("payload"))).toMap
      ls.zipWithIndex.foreach { case ((kk, t), i) =>
        val eligible = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == kk && rt <= t }
        // operator picks greatest ts, ties by greatest payload struct (here:
        // payload string encodes ts then uniq, so max string == max struct)
        val expected = eligible.map { case ((_, rt), j) => f"p$rt%03d_$j%02d" }.sorted.lastOption
        assert(got(i.toLong) == expected, s"row $i key=k$kk ts=$t")
      }
    }
  }

  test("alternating-star CC == label-propagation CC on random graphs") {
    val edgeGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 20L)))
    for (es <- draws(edgeGen, 6)) {
      val pairs = es.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      if (pairs.nonEmpty) {
        val df = pairs.toDF("doc_a", "doc_b")
        val lp = graft.queries.AnalyticsQueries.connectedComponents(df, maxIter = 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val alt = graft.queries.AnalyticsQueries.connectedComponentsAlternating(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(alt == lp, s"edges=$pairs")
      }
    }
  }

  test("winnow_min expression == composed array expression for arbitrary strings") {
    val strs = draws(Gen.listOf(Gen.alphaNumStr), 4).flatten.filter(_.nonEmpty).distinct
    val terms = graft.text.TextOps.polyTerms(8, "L")(j => s"element_at(__codes, i + $j)")
    val both = strs.toDF("s")
      .withColumn("__codes",
        expr("concat(transform(split(s, ''), c -> ascii(c)), array_repeat(0, 8))"))
      .select(
        graft.expressions.WinnowMin(col("s"), 8).as("native"),
        expr(s"array_min(transform(sequence(1, greatest(length(s) - 7, 1)), i -> $terms))")
          .as("composed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("as-of join with tolerance matches a brute-force bounded-lookback reference") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 40L))
    for (((ls, rs), tol) <- draws(
        Gen.zip(Gen.zip(Gen.listOfN(25, rowGen), Gen.listOfN(15, rowGen)), Gen.oneOf(0L, 3L, 10L)), 8)) {
      val left = ls.zipWithIndex.map { case ((kk, t), i) => (i.toLong, s"k$kk", t) }
        .toDF("id", "key", "ts")
      val right = rs.zipWithIndex.map { case ((kk, t), i) => (s"k$kk", t, f"p$t%03d_$i%02d") }
        .toDF("key", "ts", "payload")
      val got = graft.operators.AsofJoin
        .backward(left, right, Seq("key"), "ts", "ts", "left", tolerance = Some(tol))
        .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("payload"))).toMap
      ls.zipWithIndex.foreach { case ((kk, t), i) =>
        val eligible = rs.zipWithIndex
          .filter { case ((rk, rt), _) => rk == kk && rt <= t && t - rt <= tol }
        val expected = eligible.map { case ((_, rt), j) => f"p$rt%03d_$j%02d" }.sorted.lastOption
        assert(got(i.toLong) == expected, s"row $i key=k$kk ts=$t tol=$tol")
      }
    }
  }

  test("forward as-of join matches a brute-force per-row reference on random data") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 40L))
    for ((ls, rs) <- draws(Gen.zip(Gen.listOfN(25, rowGen), Gen.listOfN(15, rowGen)), 8)) {
      val left = ls.zipWithIndex.map { case ((kk, t), i) => (i.toLong, s"k$kk", t) }
        .toDF("id", "key", "ts")
      val right = rs.zipWithIndex.map { case ((kk, t), i) => (s"k$kk", t, f"p$t%03d_$i%02d") }
        .toDF("key", "ts", "payload")
      val got = graft.operators.AsofJoin.forward(left, right, Seq("key"), "ts", "ts", "left")
        .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("payload"))).toMap
      ls.zipWithIndex.foreach { case ((kk, t), i) =>
        val eligible = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == kk && rt >= t }
        // operator picks smallest ts, ties by LEAST payload struct (payload
        // string encodes ts then uniq, so min string == min struct)
        val expected = eligible.map { case ((_, rt), j) => f"p$rt%03d_$j%02d" }.sorted.headOption
        assert(got(i.toLong) == expected, s"row $i key=k$kk ts=$t")
      }
    }
  }

  test("banded range join matches a brute-force filter for any band width") {
    val ptGen = Gen.listOfN(20, Gen.chooseNum(-50.0, 50.0))
    val rgGen = Gen.listOfN(10, Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0.0, 30.0)))
    for (((ps, rg), bw) <- draws(Gen.zip(Gen.zip(ptGen, rgGen), Gen.oneOf(0.5, 3.0, 100.0)), 8)) {
      val points = ps.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
      val ranges = rg.zipWithIndex.map { case ((lo, w), j) => (j.toLong, lo, lo + w) }
        .toDF("rid", "lo", "hi")
      val got = graft.operators.RangeJoin.pointInRange(points, ranges, "v", "lo", "hi", bw)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (v, i) <- ps.zipWithIndex
        ((lo, w), j) <- rg.zipWithIndex
        if v >= lo && v < lo + w
      } yield (i.toLong, j.toLong)).toSet
      assert(got == expected)
    }
  }

  test("sequence packing invariants: offsets in [0, budget), bins nondecreasing, totals conserved") {
    val genDocs = Gen.listOfN(25, Gen.chooseNum(0, 40)).map(_.zipWithIndex.map {
      case (nw, i) => (i.toLong, List.fill(math.max(nw, 1))("w").mkString(" "))
    })
    for (docs <- draws(genDocs, 6)) {
      val df = docs.toDF("doc_id", "text")
      val budget = 17
      val out = graft.text.TextOps.packSequences(df, budget, shards = 4)
        .orderBy("shard", "doc_id").collect()
      assert(out.length == docs.length)
      out.foreach { r =>
        val off = r.getAs[Long]("bin_offset")
        assert(off >= 0 && off < budget, s"offset $off out of [0, $budget)")
      }
      // bins never decrease within a shard, and reconstruct from token sums
      out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
        val bins = rows.map(_.getAs[Long]("bin")).toSeq
        assert(bins == bins.sorted)
        val toks = rows.map(_.getAs[Long]("n_tokens")).toSeq
        val prefixes = toks.scanLeft(0L)(_ + _).init
        assert(prefixes.map(_ / budget) == bins)
      }
    }
  }

  test("pii redaction is idempotent: a redacted text contains no further matches") {
    val genText = Gen.listOfN(6, Gen.oneOf(
      "plain words here", "x@y.io", "mail a.b@c.org now", "+1 (555) 010-1234",
      "5550104242999", "tel 555-010-9999 end")).map(_.mkString(" "))
    for (texts <- draws(Gen.listOfN(10, genText), 4)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val first = graft.text.TextOps.redactPii(df)
      // rebuild the redacted text exactly as the operator does, then rescan
      val redacted = df.select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), graft.text.TextOps.EmailRe, "<EMAIL>"),
          graft.text.TextOps.PhoneRe, "<PHONE>").as("text"))
      val second = graft.text.TextOps.redactPii(redacted).collect()
      second.foreach { r =>
        assert(r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_phones") == 0,
          s"redacted text still matches: $r")
      }
      assert(first.count() == texts.length)
    }
  }

  test("contamination fractions stay in [0,1]; identical doc scores 1.0") {
    val genCorpus = Gen.listOfN(8, Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")).map(_.mkString(" ")))
    for (texts <- draws(genCorpus, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) } :+ (100L, texts.head)
      val df = docs.toDF("doc_id", "text")
      val sh = graft.dedup.Dedup.wordShingles(df, 3)
      val out = graft.dedup.Dedup.contamination(
        sh.filter(col("doc_id") < 100), sh.filter(col("doc_id") === 100)).collect()
      out.foreach { r =>
        val f = r.getAs[Double]("overlap_frac")
        assert(f >= 0.0 && f <= 1.0)
      }
      // doc 1 is byte-identical to the benchmark doc => full leak
      assert(out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Double]("overlap_frac") == 1.0)
    }
  }

  test("corpus-curation invariants: nll positive/total, dup_frac in [0,1], trim counts exact") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    for (texts <- draws(Gen.listOfN(12, docGen), 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, "en", "src", t) }
        .toDF("doc_id", "lang", "source", "text")
      val nll = graft.text.TextOps.unigramNll(docs).collect()
      assert(nll.length == docs.count(), "unigramNll is total over docs")
      nll.foreach { r =>
        assert(r.getAs[Double]("nll") > 0.0, "smoothed nll is strictly positive")
        val toks = texts(r.getAs[Long]("doc_id").toInt).split("\\s+").length
        assert(r.getAs[Long]("doc_tokens") == toks.toLong)
      }
      val dup = graft.text.TextOps.dupNgramStats(docs, n = 3).collect()
      assert(dup.length == texts.length, "dupNgramStats is total over docs")
      dup.foreach { r =>
        val f = r.getAs[Double]("dup_frac")
        assert(f >= 0.0 && f <= 1.0)
        assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_shingles"))
      }
      val trim = graft.text.TextOps.lengthTrim(docs).collect()
      trim.foreach { r =>
        val n = r.getAs[Long]("n_docs")
        val expectKept = math.floor(0.95 * n).toLong - math.floor(0.05 * n).toLong
        assert(r.getAs[Long]("n_kept") == expectKept, "rank-cut count is closed-form")
      }
    }
    // identical twin docs: every shingle instance is duplicated in the twin
    val twins = Seq((1L, "en", "s", "p q r s t"), (2L, "en", "s", "p q r s t"))
      .toDF("doc_id", "lang", "source", "text")
    graft.text.TextOps.dupNgramStats(twins, n = 3).collect()
      .foreach(r => assert(r.getAs[Double]("dup_frac") == 1.0))
  }

  test("chunking covers every token exactly; consecutive chunks overlap by `overlap`") {
    for (params <- draws(Gen.zip(Gen.chooseNum(1, 40), Gen.chooseNum(2, 8), Gen.chooseNum(0, 6)), 10)) {
      val (n, size0, ov0) = params
      val size = math.max(size0, ov0 + 1) // enforce overlap < chunkSize
      val docs = Seq((1L, (0 until n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.text.TextOps.chunkDocuments(docs, size, ov0)
        .orderBy("chunk_id").collect()
      val stride = size - ov0
      // starts are exact multiples of stride from zero
      chunks.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("start_tok") == i.toLong * stride)
      }
      val last = chunks.last
      val lastEnd = last.getAs[Long]("start_tok") + last.getAs[Long]("chunk_tokens")
      assert(lastEnd == n.toLong, s"last chunk must end at the last token (n=$n size=$size ov=$ov0)")
      // no chunk beyond necessity: the penultimate chunk (if any) must not
      // already cover the final token
      if (chunks.length > 1) {
        val pen = chunks(chunks.length - 2)
        assert(pen.getAs[Long]("start_tok") + size < n.toLong + stride)
      }
    }
  }

  test("subword tokenizeWord: round-trip, maximality, OOV totality on random vocab") {
    import graft.text.Subword
    val letters = Seq('a', 'b', 'c', 'd')
    val wordGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(letters)).map(_.mkString))
    val pieceGen = Gen.chooseNum(1, 4)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf(letters)).map(_.mkString))
    val caseGen = Gen.zip(wordGen, Gen.chooseNum(0, 20).flatMap(Gen.listOfN(_, pieceGen)))
    for ((word, extra) <- draws(caseGen, 300)) {
      // alphabet-complete vocab: never OOV, exact round trip, greedy maximality
      val full = extra.toSet ++ letters.map(_.toString)
      val toks = Subword.tokenizeWord(word, full, 4)
      assert(toks.mkString == word, s"round trip broke for '$word'")
      var pos = 0
      toks.foreach { p =>
        ((p.length + 1) to math.min(4, word.length - pos)).foreach { l =>
          assert(!full.contains(word.substring(pos, pos + l)),
            s"piece '$p' at $pos in '$word' is not the longest match")
        }
        pos += p.length
      }
      // arbitrary partial vocab: the result is total — either an exact
      // cover or exactly [UNK], never a partial/corrupt tokenization
      val part = extra.toSet
      val toksP = Subword.tokenizeWord(word, part, 4)
      if (word.isEmpty) assert(toksP.isEmpty)
      else assert(toksP.sameElements(Array(Subword.Unk)) || toksP.mkString == word)
    }
  }

  test("first-write-wins is idempotent and key-unique") {
    for (pairs <- draws(Gen.listOfN(30, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(1L, 1000L))), 8)) {
      val df = pairs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("key", "value", "arrival")
      val once = graft.operators.Relational.firstWriteWins(df, Seq("key"), "arrival")
      val twice = graft.operators.Relational.firstWriteWins(once, Seq("key"), "arrival")
      assert(once.count() == df.select("key").distinct().count())
      assert(once.collect().toSet == twice.collect().toSet)
      once.collect().foreach { r =>
        val k = r.getAs[Int]("key")
        val minArrival = pairs.zipWithIndex.filter(_._1._1 == k).map(_._2).min
        assert(r.getAs[Long]("arrival") == minArrival.toLong)
      }
    }
  }
}
