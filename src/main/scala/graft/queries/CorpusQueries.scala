package graft.queries

import graft.core.Tables
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation queries — the quality/balance stages of a pretraining
  * data recipe, beyond the reference's own surface: unigram-LM scoring,
  * corpus-wide duplicated-content measurement, domain rebalancing, and
  * length trimming. All exactly oracle-checkable: integer-quantized
  * log-space arithmetic, integer hash gates, and IEEE-identical rank cuts.
  */
object CorpusQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** Writable per-scale-dir location for the q113 persisted subword
    * vocabulary (test fixtures are read-only, so artifacts land in tmpdir
    * — the same convention as DataQueries.ivfIndexPath, including the PID
    * namespace that keeps concurrent runners off each other's artifacts).
    */
  private[queries] def vocabPath(d: String): String =
    sys.props("java.io.tmpdir") + "/graft_subword_vocab_p" +
      ProcessHandle.current().pid() + "_" + d.replaceAll("[^A-Za-z0-9]", "_")

  private val hex60Sql: String => String = OracleCte.hex60Sql

  /** Shared stage frame for the q115/q160 pipeline compositions: (raw,
    * packed), where `raw` carries every document with its n_words and
    * `packed` carries the post-exact-dedup rows with cumulative per-stage
    * survival flags (`near`, `qual`, `bal`) and the packing `__binkey`.
    * One doc-level frame + one conditional aggregation per consumer — the
    * expensive near-dup mine executes exactly once per composed plan.
    */
  private def pipelineFlags(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import graft.dedup.Dedup
    import org.apache.spark.sql.expressions.Window
    val raw = docs(s, d).select(col("doc_id"), col("text"), col("source"))
      .withColumn("n_words", size(split(trim(col("text")), "\\s+")).cast("long"))
    val clean = raw.filter(col("n_words") >= 3)
    val exactKept = clean.withColumn("__keep",
        min(col("doc_id")).over(Window.partitionBy(md5(lower(col("text"))))))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
    val dropped = Dedup.minhashLshPairs(Dedup.wordShingles(exactKept, 3),
        numPerms = 16, bands = 4, threshold = 0.8, maxBucket = Int.MaxValue)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("__dup", lit(1L))
    // per-doc flags, each implying the previous stage's (exact rows only;
    // raw/clean totals are recoverable from the pre-dedup columns)
    val qs = least(lit(1.0), col("n_words") / 100.0) *
      (lit(1.0) - abs(size(filter(split(trim(col("text")), "\\s+"),
        x => x.isInCollection(Seq("the", "a", "of", "and", "in", "to", "is"))))
        .cast("double") / col("n_words") - 0.4))
    val flagged = exactKept.join(dropped, Seq("doc_id"), "left")
      .withColumn("near", col("__dup").isNull)
      .withColumn("qual", col("near") && qs >= 0.3)
    val domCounts = flagged.filter(col("qual"))
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val rates = domCounts.crossJoin(broadcast(domCounts.agg(min(col("nd")).as("min_nd"))))
      .select(col("source"), expr("min_nd * 1000000 div nd").as("rate_ppm"))
    val bal = flagged.join(broadcast(rates), Seq("source"), "left")
      .withColumn("bal", col("qual") &&
        Dedup.hex60(col("doc_id").cast("string")) % 1000000 < coalesce(col("rate_ppm"), lit(0L)))
    // shard-local packing over ONLY the balanced docs: the conditional
    // running sum skips unbalanced rows, so each balanced doc's exclusive
    // prefix counts exactly its prior balanced shard-mates (q76 semantics)
    val shard32 = pmod(Dedup.hex60(col("doc_id").cast("string")), lit(32L))
    val w = Window.partitionBy(shard32)
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val packed = bal
      .withColumn("__cum", coalesce(sum(when(col("bal"), col("n_words"))).over(w), lit(0L)))
      .withColumn("__binkey", when(col("bal"),
        concat_ws(":", shard32, expr("__cum div 512"))))
    (raw, packed)
  }

  /** The shared v3/v4 pipeline frames: (pre, one, prof, score, samp, gate)
    * — the 1-row stage aggregates plus the stage-9 gate frame (q174 reads
    * only the aggregates; q189 also filters the gate's survivors into its
    * DSIR stage). One localCheckpoint feeds BOTH model stages (the q160
    * precedent: ridge makes four aggregation passes, the gate join a
    * fifth — each would re-run the near-dup mine without it; the
    * checkpoint is a few hundred (doc_id, n_words) rows).
    */
  private def pipelineV3Parts(s: SparkSession, d: String):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (raw, packed0) = pipelineFlags(s, d)
    // `packed` feeds TWO plans (the stage aggregation and the checkpointed
    // survivor frame) — without this checkpoint each ran the whole upstream
    // chain including the near-dup mine (guide §1.2; the rows are narrow
    // doc-level flags, nothing like the array-heavy frames the mine's own
    // no-checkpoint note adjudicates)
    val packed = packed0.select(col("doc_id"), col("n_words"), col("near"),
      col("qual"), col("bal"), col("__binkey")).localCheckpoint(true)
    val one = packed.agg(
      count(lit(1)).as("d3"), coalesce(sum(col("n_words")), lit(0L)).as("t3"),
      count(when(col("near"), 1)).as("d4"),
      coalesce(sum(when(col("near"), col("n_words"))), lit(0L)).as("t4"),
      count(when(col("qual"), 1)).as("d5"),
      coalesce(sum(when(col("qual"), col("n_words"))), lit(0L)).as("t5"),
      count(when(col("bal"), 1)).as("d6"),
      coalesce(sum(when(col("bal"), col("n_words"))), lit(0L)).as("t6"),
      countDistinct(col("__binkey")).as("nb"))
    val pre = raw.agg(
      count(lit(1)).as("d1"), coalesce(sum(col("n_words")), lit(0L)).as("t1"),
      count(when(col("n_words") >= 3, 1)).as("d2"),
      coalesce(sum(when(col("n_words") >= 3, col("n_words"))), lit(0L)).as("t2"))
    val prof = graft.operators.Profile
      .profile(docs(s, d), Seq("doc_id", "text", "lang", "source", "n_chars"))
      .agg(max(col("n_rows")).as("p1"), sum(col("n_distinct")).as("p2"),
        sum(col("n_null")).as("p3"))
    // a filter over the packed checkpoint — no second materialization needed
    val surv = packed.filter(col("bal")).select(col("doc_id"), col("n_words"))
    // fj is a corpus text-feature pass; checkpoint it ONCE so the ridge fit
    // (which re-projects its own checkpoint) and predict share one pass
    val fj = DataQueries.ridgeFrame(s, d).join(surv.select(col("doc_id")), "doc_id")
      .localCheckpoint(true)
    val fit = graft.operators.Ridge.fit(fj, DataQueries.ridgeFeatureCols, "y")
    val score = graft.operators.Ridge.predict(fj, fit, "doc_id")
      .agg(count(lit(1)).as("s1"),
        coalesce(sum(floor(col("yhat")).cast("long")), lit(0L)).as("s2"))
    // stage 9: full-corpus classifier -> calibration map -> hex60 gate
    val lf = DataQueries.logitFrame(s, d).localCheckpoint(true) // one text-feature pass shared by fit/predict/label join (guide §1.2)
    val lfit = graft.operators.Logit.fit(lf, DataQueries.ridgeFeatureCols, "y")
    val lpred = graft.operators.Logit.predict(lf, lfit, "doc_id")
      .join(lf.select(col("doc_id"), col("y")), "doc_id")
      .localCheckpoint(true) // one fit; bins + the gate read the same scores
    val bins = graft.operators.Logit.calibrationBins(lpred)
    val cal = graft.operators.Logit.calibratedPredict(lpred, bins, "doc_id")
    val gate = surv.join(cal.select(col("doc_id"), col("p_cal")), "doc_id")
      .withColumn("__keep",
        graft.dedup.Dedup.hex60(col("doc_id").cast("string")) % 1000000L <
          floor(col("p_cal") * 1e6).cast("long"))
    val samp = gate.agg(
      count(when(col("__keep"), 1)).as("k1"),
      coalesce(sum(when(col("__keep"), col("n_words"))), lit(0L)).as("k2"),
      // exact expected-mass audit in integer micro-ppm units,
      // DECIMAL(38,0) partials (the q168 envelope rule)
      coalesce(sum(floor(col("p_cal") * 1e6).cast("decimal(38,0)")), lit(0))
        .cast("long").as("k3"))
    (pre, one, prof, score, samp, gate)
  }

  /** Per-document kill matrix of the FULL v4 pipeline — q187's treatment
    * lifted from the standalone text rules to the pipeline's own stages.
    * At 100 TB "why did my crawl slice vanish" is asked of the PIPELINE:
    * this frame answers it with every stage's survival verdict per
    * document plus `first_fail` (the stage a sequential run charges the
    * kill to). Verdicts are CUMULATIVE by construction — the pipeline is
    * a sequential funnel, so each stage's verdict is over its actual
    * input population (contrast q187, whose rules are independent):
    * length, exact-dup winner, near-dup, quality, balance draw, the
    * calibrated-classifier draw, and the DSIR draw. The model columns
    * (p_cal, rate_ppm) exist for EVERY document — the classifier and the
    * DSIR fit are corpus-wide (q189's stages) — so the charge is exact
    * even for docs killed upstream.
    */
  private def pipelineKillMatrix(s: SparkSession, d: String): DataFrame = {
    import graft.dedup.Dedup
    val (raw, packed) = pipelineFlags(s, d)
    val lf = DataQueries.logitFrame(s, d).localCheckpoint(true) // one text-feature pass shared by fit/predict/label join (guide §1.2)
    val lfit = graft.operators.Logit.fit(lf, DataQueries.ridgeFeatureCols, "y")
    val lpred = graft.operators.Logit.predict(lf, lfit, "doc_id")
      .join(lf.select(col("doc_id"), col("y")), "doc_id")
      .localCheckpoint(true) // one fit; bins + per-doc p_cal read the same scores
    val bins = graft.operators.Logit.calibrationBins(lpred)
    val cal = graft.operators.Logit.calibratedPredict(lpred, bins, "doc_id")
    val allDocs = docs(s, d)
    val rate = TextOps.dsirSample(TextOps.dsirScore(allDocs,
        TextOps.dsirBucketLlr(allDocs.filter(col("lang") === "en"), allDocs)))
      .select(col("doc_id"), col("rate_ppm"))
    raw.select(col("doc_id"), col("n_words"))
      .join(packed.select(col("doc_id"), col("near"), col("qual"), col("bal")),
        Seq("doc_id"), "left")
      .join(cal.select(col("doc_id"), col("p_cal")), "doc_id")
      .join(rate, "doc_id")
      .withColumn("pass_length", col("n_words") >= 3)
      .withColumn("pass_exact", col("near").isNotNull) // a packed row == exact winner
      .withColumn("pass_near", coalesce(col("near"), lit(false)))
      .withColumn("pass_quality", coalesce(col("qual"), lit(false)))
      .withColumn("pass_balance", coalesce(col("bal"), lit(false)))
      .withColumn("pass_classifier", col("pass_balance") &&
        Dedup.hex60(col("doc_id").cast("string")) % 1000000L <
          floor(col("p_cal") * 1e6).cast("long"))
      .withColumn("pass_dsir", col("pass_classifier") &&
        Dedup.hex60(concat(col("doc_id").cast("string"), lit(":dsir"))) % 1000000L
          < col("rate_ppm"))
      .withColumn("first_fail",
        when(!col("pass_length"), "length")
          .when(!col("pass_exact"), "exact_dup")
          .when(!col("pass_near"), "near_dup")
          .when(!col("pass_quality"), "quality")
          .when(!col("pass_balance"), "balance")
          .when(!col("pass_classifier"), "classifier")
          .when(!col("pass_dsir"), "dsir")
          .otherwise("none"))
      .withColumn("kept", col("pass_dsir"))
      .select(col("doc_id"), col("n_words"), col("pass_length"), col("pass_exact"),
        col("pass_near"), col("pass_quality"), col("pass_balance"),
        col("pass_classifier"), col("pass_dsir"), col("first_fail"), col("kept"))
  }

  // ---- the incremental-v4 cycle (q191/q196) ------------------------------

  /** Per-doc feature-store row for the incremental v4 loop: every
    * text-derived value the pipeline consumes downstream (same exprs as
    * the monolithic stages, so reused rows are bit-identical to
    * recomputed ones).
    */
  private def v4Features(df: DataFrame): DataFrame =
    TextOps.qualityFeatures(df)
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        col("avg_word_len"), col("stopword_ratio"), col("quality_score"))
      .join(df.select(col("doc_id"), md5(lower(col("text"))).as("h"),
        col("source"), col("n_chars")), "doc_id")

  /** Exact-dup winners from STORED hashes (keep-min over clean rows). */
  private def v4Winners(feat: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    feat.filter(col("n_words") >= 3)
      .withColumn("__keep", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
  }

  private val v4IsTarget = col("lang") === "en"

  /** ONE incremental cycle: advance the v4 stores from `prev` to `next`
    * and return the next feature store. The per-doc feature store reuses
    * unchanged docs (added+changed pay the only text pass); the MinHash
    * mine store retires/appends through the exact-WINNER-set diff (a store
    * row survives only if its doc is still a winner with unchanged text —
    * covers removal, revision, AND winner displacement); the DSIR model
    * store retires departing counts and appends arriving ones (q186's
    * path at q189's lang='en' target). Batch ids must be FRESH per cycle
    * (the stores' exactly-once ledgers refuse replays).
    */
  private[graft] def v4AdvanceStores(s: SparkSession, prev: DataFrame, next: DataFrame,
      featPrev: DataFrame, mh: String, dsirPath: String,
      mhRetireId: Long, mhAppendId: Long,
      dsirRetireId: Long, dsirAppendId: Long,
      sharedDelta: Option[DataFrame] = None): DataFrame = {
    import graft.dedup.Dedup
    import graft.streaming.StreamingPipeline
    // the warehouse cycles already hold this exact (checkpointed) delta —
    // recomputing it here was a redundant corpus-hash pass (guide §1.2)
    val delta = sharedDelta.getOrElse(Dedup.corpusDelta(
      prev.select(col("doc_id"), col("text")),
      next.select(col("doc_id"), col("text"))).localCheckpoint(true))
    val unchangedIds = delta.filter(col("status") === "unchanged").select("doc_id")
    val addedChangedIds =
      delta.filter(col("status").isin("added", "changed")).select("doc_id")
    val featNext = featPrev.join(unchangedIds, "doc_id")
      .unionByName(v4Features(next.join(addedChangedIds, "doc_id")))
      .localCheckpoint(true) // the new store: the delta paid one text pass
    // each winner set feeds the retire-side AND the append-side anti-join
    // chains (and `survive` references both) — without these checkpoints
    // the exact-dup winner window re-ran three times per side (guide §1.2;
    // the frames are bare doc_id lists)
    val keptPrev = v4Winners(featPrev).select(col("doc_id")).localCheckpoint(true)
    val keptNext = v4Winners(featNext).select(col("doc_id")).localCheckpoint(true)
    val stayIds = keptNext.join(unchangedIds, "doc_id")
    // A store row SURVIVES only if its doc is in the store (a prev-cycle
    // winner) AND still a winner with unchanged text. stayIds alone is not
    // the survivor set: an UNCHANGED doc newly PROMOTED to winner (its
    // group's previous winner removed or revised) is in stayIds but was
    // never appended — anti-joining the append set against stayIds would
    // silently leave it out of the store and its near-dup pairs unminable.
    val survive = keptPrev.join(stayIds, Seq("doc_id"), "leftsemi")
      .localCheckpoint(true) // read by both families' anti-joins
    // the MinHash and DSIR families advance DISJOINT stores from shared
    // (checkpointed) inputs — overlap them (guide §2.6): each family stays
    // internally sequential (retire -> append -> compact under its own
    // store lock), so results and crash discipline are unchanged
    graft.core.Par.sections(
      () => {
        StreamingPipeline.retireMinhashStore(s, mh,
          keptPrev.join(survive, Seq("doc_id"), "left_anti"), mhRetireId)
        StreamingPipeline.minhashDedupBatch(mh)(
          next.select(col("doc_id"), col("text"))
            .join(keptNext.join(survive, Seq("doc_id"), "left_anti"), "doc_id"),
          mhAppendId)
        StreamingPipeline.compactMinhashStore(s, mh)
      },
      () => {
        TextOps.retireDsir(
          prev.join(delta.filter(col("status").isin("removed", "changed"))
            .select("doc_id"), "doc_id"), v4IsTarget, dsirPath, appendId = dsirRetireId)
        TextOps.appendDsir(next.join(addedChangedIds, "doc_id"), v4IsTarget,
          dsirPath, appendId = dsirAppendId)
        TextOps.compactDsir(s, dsirPath)
      })
    featNext
  }

  /** The 11-row v4 stack frame over `corpus`, computed from the STORED
    * features and the maintained stores — stage flags, the balance and
    * packing windows, the ridge and calibrated-classifier fits, and all
    * three hex60 gates read `feat`; the near-dup verdicts come from the
    * MinHash store's verified pairs and the DSIR rates from the model
    * store. No text pass outside the stores (the exact-distinct profiler
    * aggregates full `corpus` by definition — its incremental twin is the
    * sketch-store family, q156/q158).
    */
  private[graft] def v4FrameFromStores(s: SparkSession, corpus: DataFrame,
      feat: DataFrame, mh: String, dsirPath: String): DataFrame = {
    import graft.dedup.Dedup
    import graft.streaming.StreamingPipeline
    import org.apache.spark.sql.expressions.Window
    val exactKept = v4Winners(feat)
    val dropped = StreamingPipeline.readDedupPairs(s, mh)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("__dup", lit(1L))
    val flagged = exactKept.join(dropped, Seq("doc_id"), "left")
      .withColumn("near", col("__dup").isNull)
      .withColumn("qual", col("near") && col("quality_score") >= 0.3)
    val domCounts = flagged.filter(col("qual"))
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val rates = domCounts.crossJoin(broadcast(domCounts.agg(min(col("nd")).as("min_nd"))))
      .select(col("source"), expr("min_nd * 1000000 div nd").as("rate_ppm"))
    val bal = flagged.join(broadcast(rates), Seq("source"), "left")
      .withColumn("bal", col("qual") &&
        Dedup.hex60(col("doc_id").cast("string")) % 1000000 < coalesce(col("rate_ppm"), lit(0L)))
    val shard32 = pmod(Dedup.hex60(col("doc_id").cast("string")), lit(32L))
    val w = Window.partitionBy(shard32)
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    // same two-consumer shape as pipelineV3Parts: checkpoint the narrow
    // doc-level flags once instead of re-running the winner window + store
    // join chain per consumer (guide §1.2)
    val packed = bal
      .withColumn("__cum", coalesce(sum(when(col("bal"), col("n_words"))).over(w), lit(0L)))
      .withColumn("__binkey", when(col("bal"),
        concat_ws(":", shard32, expr("__cum div 512"))))
      .select(col("doc_id"), col("n_words"), col("near"), col("qual"),
        col("bal"), col("__binkey")).localCheckpoint(true)
    val one = packed.agg(
      count(lit(1)).as("d3"), coalesce(sum(col("n_words")), lit(0L)).as("t3"),
      count(when(col("near"), 1)).as("d4"),
      coalesce(sum(when(col("near"), col("n_words"))), lit(0L)).as("t4"),
      count(when(col("qual"), 1)).as("d5"),
      coalesce(sum(when(col("qual"), col("n_words"))), lit(0L)).as("t5"),
      count(when(col("bal"), 1)).as("d6"),
      coalesce(sum(when(col("bal"), col("n_words"))), lit(0L)).as("t6"),
      countDistinct(col("__binkey")).as("nb"))
    val pre = feat.agg(
      count(lit(1)).as("d1"), coalesce(sum(col("n_words")), lit(0L)).as("t1"),
      count(when(col("n_words") >= 3, 1)).as("d2"),
      coalesce(sum(when(col("n_words") >= 3, col("n_words"))), lit(0L)).as("t2"))
    val prof = graft.operators.Profile
      .profile(corpus, Seq("doc_id", "text", "lang", "source", "n_chars"))
      .agg(max(col("n_rows")).as("p1"), sum(col("n_distinct")).as("p2"),
        sum(col("n_null")).as("p3"))
    val surv = packed.filter(col("bal")).select(col("doc_id"), col("n_words"))
    val fj = feat.select(col("doc_id"),
        col("n_words").cast("double").as("n_words"),
        col("avg_word_len"), col("stopword_ratio"),
        col("n_chars").cast("double").as("y"))
      .join(surv.select(col("doc_id")), "doc_id")
    val fit = graft.operators.Ridge.fit(fj, DataQueries.ridgeFeatureCols, "y")
    val score = graft.operators.Ridge.predict(fj, fit, "doc_id")
      .agg(count(lit(1)).as("s1"),
        coalesce(sum(floor(col("yhat")).cast("long")), lit(0L)).as("s2"))
    val lf = feat.select(col("doc_id"),
      col("n_words").cast("double").as("n_words"),
      col("avg_word_len"), col("stopword_ratio"),
      (col("quality_score") >= 0.3).cast("double").as("y"))
    val lfit = graft.operators.Logit.fit(lf, DataQueries.ridgeFeatureCols, "y")
    val lpred = graft.operators.Logit.predict(lf, lfit, "doc_id")
      .join(lf.select(col("doc_id"), col("y")), "doc_id")
      .localCheckpoint(true)
    val bins = graft.operators.Logit.calibrationBins(lpred)
    val cal = graft.operators.Logit.calibratedPredict(lpred, bins, "doc_id")
    val gate = surv.join(cal.select(col("doc_id"), col("p_cal")), "doc_id")
      .withColumn("__keep",
        Dedup.hex60(col("doc_id").cast("string")) % 1000000L <
          floor(col("p_cal") * 1e6).cast("long"))
    val samp = gate.agg(
      count(when(col("__keep"), 1)).as("k1"),
      coalesce(sum(when(col("__keep"), col("n_words"))), lit(0L)).as("k2"),
      coalesce(sum(floor(col("p_cal") * 1e6).cast("decimal(38,0)")), lit(0))
        .cast("long").as("k3"))
    val rate = TextOps.scoreWithDsir(corpus, dsirPath)
      .select(col("doc_id"), col("rate_ppm"))
    val dgate = gate.filter(col("__keep")).select(col("doc_id"), col("n_words"))
      .join(rate, "doc_id")
      .withColumn("__dk",
        Dedup.hex60(concat(col("doc_id").cast("string"), lit(":dsir"))) % 1000000L
          < col("rate_ppm"))
    val dsamp = dgate.agg(
      count(when(col("__dk"), 1)).as("x1"),
      coalesce(sum(when(col("__dk"), col("n_words"))), lit(0L)).as("x2"),
      coalesce(sum(col("rate_ppm").cast("decimal(38,0)")), lit(0))
        .cast("long").as("x3"))
    pre.crossJoin(one).crossJoin(broadcast(prof)).crossJoin(broadcast(score))
      .crossJoin(broadcast(samp)).crossJoin(broadcast(dsamp))
      .selectExpr(
        """stack(11,
          |  '0_profile', p1, p2, p3,
          |  '1_raw',     d1, t1, CAST(0 AS BIGINT),
          |  '2_clean',   d2, t2, CAST(0 AS BIGINT),
          |  '3_exact',   d3, t3, CAST(0 AS BIGINT),
          |  '4_neardup', d4, t4, CAST(0 AS BIGINT),
          |  '5_quality', d5, t5, CAST(0 AS BIGINT),
          |  '6_balance', d6, t6, CAST(0 AS BIGINT),
          |  '7_pack',    d6, t6, nb,
          |  '8_score',   s1, s2, CAST(0 AS BIGINT),
          |  '9_sample',  k1, k2, k3,
          |  'a_dsir',    x1, x2, x3
          |) AS (stage, n_docs, n_tokens, n_bins)""".stripMargin)
      .orderBy("stage")
  }

  /** The previous-cycle state the incremental loop starts from: the
    * snapshot-A feature store, the MinHash mine store built over A's
    * exact winners (two batches — the q178 shape), and the DSIR model
    * fit on A. Returns featA.
    */
  private[graft] def v4BuildStoresOnA(s: SparkSession, a: DataFrame,
      mh: String, dsirPath: String): DataFrame = {
    import graft.streaming.StreamingPipeline
    val featA = v4Features(a).localCheckpoint(true)
    // both store batches filter aKept — checkpoint the winner ids once
    // instead of re-running the winner window per batch (guide §1.2)
    val keptA = v4Winners(featA).select(col("doc_id")).localCheckpoint(true)
    val aKept = a.select(col("doc_id"), col("text")).join(keptA, "doc_id")
    // disjoint stores built from shared checkpointed inputs — overlap the
    // families (guide §2.6); the two MinHash batches stay ordered within
    // their section (same store, monotone batch ids)
    graft.core.Par.sections(
      () => {
        StreamingPipeline.minhashDedupBatch(mh)(aKept.filter(col("doc_id") % 2 === 0), 0)
        StreamingPipeline.minhashDedupBatch(mh)(aKept.filter(col("doc_id") % 2 === 1), 1)
      },
      () => TextOps.saveDsir(a, v4IsTarget, m = 1024, dsirPath))
    featA
  }

  val defs: Map[String, Q] = Map(
    // Unigram-LM quality score (add-one smoothing, corpus-fit).
    "q95_unigram_nll" -> ((s, d) =>
      TextOps.unigramNll(docs(s, d)).orderBy("doc_id")),

    // Duplicated word-trigram fraction per document (corpus-wide df).
    "q96_dup_ngrams" -> ((s, d) =>
      TextOps.dupNgramStats(docs(s, d), n = 3).orderBy("doc_id")),

    // Exact duplicated-span removal (substring-level dedup, Lee et al.
    // 2022 shape): every word position covered by a corpus-duplicated
    // 5-gram is cut; surviving words re-joined in order.
    "q128_span_removal" -> ((s, d) =>
      TextOps.removeDuplicatedSpans(docs(s, d), span = 5).orderBy("doc_id")),

    // Span removal at the production span scale (Lee et al. 2022 uses
    // ~50-token spans; 20 here so sf0.01 still has duplicated spans to
    // cut) — gates the parameterized span path AND the kept_offsets
    // remap column at a non-default setting.
    "q129_span_removal_wide" -> ((s, d) =>
      TextOps.removeDuplicatedSpans(docs(s, d), span = 20).orderBy("doc_id")),

    // Uniform domain mix via deterministic hash-gated downsampling.
    "q97_domain_rebalance" -> ((s, d) =>
      TextOps.domainRebalance(docs(s, d), domainCol = "source").orderBy("domain")),

    // Per-language 5%/95% token-length trim.
    "q98_length_trim" -> ((s, d) =>
      TextOps.lengthTrim(docs(s, d), groupCol = "lang").orderBy("grp")),

    // SemDeDup: k-means cells (same 8-centroid/3-iter fit as q52) + within-
    // cell cosine >= 0.4 pairwise collapse to the smallest id.
    "q99_semantic_dedup" -> ((s, d) =>
      graft.similarity.Similarity
        .semanticDedup(Tables(s, d, "embeddings"), numCentroids = 8, iters = 3,
          threshold = 0.4)
        .orderBy("vec_id")),

    // Fixed 32-token chunks with 4-token overlap (stride 28).
    "q100_doc_chunks" -> ((s, d) =>
      TextOps.chunkDocuments(docs(s, d), chunkSize = 32, overlap = 4)
        .orderBy("doc_id", "chunk_id")),

    // Bigram Markov LM score (add-one over the type vocabulary).
    "q101_bigram_nll" -> ((s, d) =>
      TextOps.bigramNll(docs(s, d)).orderBy("doc_id")),

    // Chunk-level cross-document dedup: the span/boilerplate analogue of
    // line-level dedup (this corpus has no newlines) — overlapping 32-token
    // chunks that recur across documents are repeated spans. Reports each
    // repeated chunk digest with its occurrence count, distinct-doc count,
    // and keeper (smallest doc, then earliest offset) — the remove-list a
    // boilerplate scrubber would apply. Exact-group shuffle on the digest;
    // no pair mining.
    "q104_chunk_dedup" -> ((s, d) =>
      TextOps.chunkDocuments(docs(s, d), chunkSize = 32, overlap = 4)
        // (doc, offset) argmin as one integer composite: collision-free and
        // lexicographic ONLY while start_tok < 2^20 (~1M tokens/doc) AND
        // 0 <= doc_id < 2^43 (a negative id breaks the ordering; a larger id
        // wraps int64 — silently in Spark, as a BIGINT overflow error in
        // DuckDB, an ASYMMETRIC failure the oracle could never catch). Both
        // bounds are ENFORCED, not assumed — an out-of-range corpus fails
        // loudly and identically on both engines instead of corrupting the
        // keeper (assert_true returns null when the predicate holds, so the
        // filter keeps every valid row and the oracle needs no mirror)
        .filter(assert_true(
          col("start_tok") < 1048576 &&
            col("doc_id") >= 0 && col("doc_id") < 8796093022208L,
          lit("q104 argmin packing requires start_tok < 2^20 and 0 <= doc_id < 2^43")).isNull)
        .groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id") * 1048576 + col("start_tok")).as("__k"))
        .filter(col("n_docs") >= 2)
        .select(col("chunk_md5"), col("n_occurrences"), col("n_docs"),
          expr("__k div 1048576").as("keep_doc"), (col("__k") % 1048576).as("keep_start"))
        .orderBy("chunk_md5")),

    // Quality-weighted (softmax, T=0.25) sampling: keep probability decays
    // exponentially with the quality gap to the corpus best; the gate is
    // the same deterministic hex60 ppm used by q80/q97 (the exp output is
    // quantized to integer ppm, so the libm last-ulp caveat of the ln-based
    // scores applies identically). The best document's rate is exactly 1e6
    // — always kept.
    "q102_quality_sample" -> ((s, d) => {
      val q = graft.text.TextOps.qualityFeatures(docs(s, d))
        .select(col("doc_id"), col("quality_score"))
      val qmax = q.agg(max(col("quality_score")).as("q_max"))
      q.crossJoin(broadcast(qmax))
        .withColumn("rate_ppm",
          floor(exp((col("quality_score") - col("q_max")) / 0.25) * 1e6 + 0.5).cast("long"))
        .withColumn("kept",
          graft.dedup.Dedup.hex60(col("doc_id").cast("string")) % 1000000 < col("rate_ppm"))
        .select(col("doc_id"), round(col("quality_score"), 6).as("quality_score"),
          col("rate_ppm"), col("kept"))
        .orderBy("doc_id")
    }),

    // Subword tokenizer gate (q91-q94 pattern): WordPiece-style greedy
    // longest-match over a corpus-learned piece vocabulary; DuckDB anchors
    // the row shape (doc_id, whitespace word count) and asserts the
    // round-trip / maximality / OOV / coverage counters are zero.
    "q105_subword_invariants" -> ((s, d) =>
      graft.text.Subword.invariantGate(docs(s, d), size = 256, maxPieceLen = 6)
        .orderBy("doc_id")),

    // Unigram-LM (SentencePiece) tokenizer gate — the third subword family
    // next to q105's WordPiece and q116's BPE: hard-EM-fitted piece
    // probabilities, Viterbi max-likelihood apply, and an INDEPENDENT
    // backward-DP optimality checker per word (plus round-trip/OOV/bound/
    // normalization counters, all pinned to zero by the oracle).
    "q141_unigram_invariants" -> ((s, d) =>
      graft.text.Unigram.invariantGate(docs(s, d), size = 256, maxPieceLen = 6,
          emRounds = 3)
        .orderBy("doc_id")),

    // The persisted-vocabulary twin of q141 (q113's treatment): fit the
    // unigram vocab ONCE, persist (piece, logp, rank), and gate that the
    // store round-trip is invisible — stored vs re-fit vocabularies must
    // produce identical ML segmentations and OOV verdicts on every word.
    "q142_unigram_store" -> ((s, d) => {
      val path = vocabPath(d) + "_uni"
      val vocab = graft.text.Unigram.fitVocab(docs(s, d), size = 256,
        maxPieceLen = 6, emRounds = 3)
      graft.text.Unigram.saveVocab(s, vocab, path)
      graft.text.Unigram.storedVocabGate(docs(s, d), size = 256,
          maxPieceLen = 6, emRounds = 3, path)
        .orderBy("doc_id")
    }),

    // Trigram Stupid-Backoff LM score: fit on the hex60 80% train split,
    // score every document — held-out docs exercise the 0.4 backoff chain.
    "q109_trigram_backoff" -> ((s, d) =>
      TextOps.trigramBackoffNll(docs(s, d)).orderBy("doc_id")),

    // The persisted-LM twin of q109 (the q113/q112 treatment for the last
    // trained structure that refit per query): land the trigram
    // Stupid-Backoff count tables as a parquet artifact, then score every
    // document FROM THE STORE — no training pass in the scoring plan. Same
    // oracle as q109: the store round-trip must be invisible to the scores,
    // which is what makes the frozen-LM artifact safe for a curation
    // pipeline that must score identically across runs.
    "q120_trigram_lm_store" -> ((s, d) => {
      val path = vocabPath(d) + "_lm"
      TextOps.saveLm(docs(s, d), path)
      TextOps.scoreWithLm(docs(s, d), path).orderBy("doc_id")
    }),

    // The LM store LIFECYCLE gate (q124's treatment for the count-table
    // family): the corpus arrives as three disjoint batches — build,
    // then two appendLm increments — the store compacts (counts MERGED
    // per gram, not just rewritten), and every document is scored from
    // the result. N-gram counts are additive longs, so the store must
    // score exactly like the monolithic fit over the union (q109's
    // oracle verbatim): a lost delta, a double-counted replay, or a
    // compaction that drops/duplicates a gram shifts some document's
    // backoff path and fails the hash.
    "q126_trigram_lm_lifecycle" -> ((s, d) => {
      val path = vocabPath(d) + "_lmlc"
      val dd = docs(s, d)
      TextOps.saveLm(dd.filter(col("doc_id") % 3 === 0), path)
      TextOps.appendLm(dd.filter(col("doc_id") % 3 === 1), path, appendId = 1)
      TextOps.appendLm(dd.filter(col("doc_id") % 3 === 2), path, appendId = 2)
      TextOps.compactLm(s, path)
      TextOps.scoreWithLm(dd, path).orderBy("doc_id")
    }),

    // The STREAMING-maintained LM store (q121's treatment for the LM
    // family, completing q126's batch lifecycle): the corpus arrives as a
    // micro-batched file stream (32 files at maxFilesPerTrigger=16, so the
    // maintainer fires across multiple triggers), each micro-batch lands a
    // count-delta append via the streaming maintainer, the store compacts,
    // and every document is scored from the result. Per-batch training
    // composes because the hex60 80% train gate is per-document and the
    // counts are additive longs — so the stream-grown store must score
    // exactly like the monolithic in-memory fit (q109's oracle verbatim);
    // a dropped micro-batch, a double-fired trigger, or a checkpoint
    // replay that double-counts fails the hash.
    "q130_trigram_lm_streamed" -> ((s, d) => {
      import graft.streaming.StreamingPipeline
      val base = vocabPath(d) + "_lmst"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      // fresh run each call: appendLm's ledger makes replays no-ops, so a
      // stale store would short-circuit the maintenance under test
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val dd = docs(s, d)
      dd.select(col("doc_id"), col("text"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/in")
      StreamingPipeline.lmAppendStream(
          StreamingPipeline.readDocStream(s, s"$base/in"),
          s"$base/lm", s"$base/ck")
        .start().awaitTermination()
      TextOps.compactLm(s, s"$base/lm")
      TextOps.scoreWithLm(dd, s"$base/lm").orderBy("doc_id")
    }),

    // BPE tokenizer gate (q105's pattern for the merges-RANKED learner —
    // the standard alternative to the frequency-ranked WordPiece vocab):
    // learn 128 merges from the corpus word histogram, round-trip them
    // through the parquet merge store, re-tokenize every word, and assert
    // the round-trip / fixpoint / bound / store-parity counters are zero.
    "q116_bpe_invariants" -> ((s, d) =>
      graft.text.Bpe.invariantGate(docs(s, d), numMerges = 128,
          storePath = vocabPath(d) + "_bpe")
        .orderBy("doc_id")),

    // End-to-end curation pipeline: clean -> exact dedup -> minhash near-dup
    // -> quality filter -> domain rebalance -> sequence packing, as ONE
    // composed plan, reported as per-stage (n_docs, n_tokens, n_bins)
    // counts. Every stage is individually green elsewhere (q24/q26/q31/
    // q97/q76); composing them proves the stages agree on conventions —
    // the whitespace token count, the doc_id keyed joins, the hex60 ppm
    // gates — because any disagreement shifts a downstream stage's counts.
    // Stage semantics (all deterministic):
    //  2_clean   n_words >= 3 (long enough to carry a trigram shingle);
    //  3_exact   keep the smallest doc_id per md5(lower(text)) group;
    //  4_neardup drop docs with a verified near-dup of smaller id
    //            (uncapped q26 pairs over the survivors, doc_b side);
    //  5_quality quality_score >= 0.3 (q31's formula);
    //  6_balance q97's ppm gate re-rated over the quality survivors;
    //  7_pack    q76's shard-local packing: n_bins = distinct (shard, bin).
    // Plan shape: naive per-stage aggregates would re-run the whole
    // upstream chain once per stage row (the pair mine 4x — measured 9.8 s
    // vs q26's own 1.9); instead ONE doc-level frame carries a survival
    // flag per stage, ONE conditional aggregation produces every stage's
    // counts, and stack() unpivots the single row — the expensive near-dup
    // mine executes exactly once.
    "q115_pipeline_e2e" -> ((s, d) => {
      val (raw, packed) = pipelineFlags(s, d)
      val one = packed.agg(
        count(lit(1)).as("d3"), coalesce(sum(col("n_words")), lit(0L)).as("t3"),
        count(when(col("near"), 1)).as("d4"),
        coalesce(sum(when(col("near"), col("n_words"))), lit(0L)).as("t4"),
        count(when(col("qual"), 1)).as("d5"),
        coalesce(sum(when(col("qual"), col("n_words"))), lit(0L)).as("t5"),
        count(when(col("bal"), 1)).as("d6"),
        coalesce(sum(when(col("bal"), col("n_words"))), lit(0L)).as("t6"),
        countDistinct(col("__binkey")).as("nb"))
      val pre = raw.agg(
        count(lit(1)).as("d1"), coalesce(sum(col("n_words")), lit(0L)).as("t1"),
        count(when(col("n_words") >= 3, 1)).as("d2"),
        coalesce(sum(when(col("n_words") >= 3, col("n_words"))), lit(0L)).as("t2"))
      pre.crossJoin(one).selectExpr(
        """stack(7,
          |  '1_raw',     d1, t1, CAST(0 AS BIGINT),
          |  '2_clean',   d2, t2, CAST(0 AS BIGINT),
          |  '3_exact',   d3, t3, CAST(0 AS BIGINT),
          |  '4_neardup', d4, t4, CAST(0 AS BIGINT),
          |  '5_quality', d5, t5, CAST(0 AS BIGINT),
          |  '6_balance', d6, t6, CAST(0 AS BIGINT),
          |  '7_pack',    d6, t6, nb
          |) AS (stage, n_docs, n_tokens, n_bins)""".stripMargin)
        .orderBy("stage")
    }),

    // Pipeline v2 (the flagship composition with the round-9 operators
    // load-bearing): q115's seven stages BOOKENDED by the column profiler
    // — '0_profile' packs the one-pass profile of the raw table as
    // (n_rows, sum n_distinct, sum n_null) over five columns — and a ridge
    // quality-scorer stage — '8_score' trains the q147 model ON THE
    // BALANCED SURVIVORS and packs (n_scored, sum floor(yhat)). Every
    // number is downstream of every stage: a drifted dedup verdict or
    // rebalance rate changes the training set, moves the learned weights,
    // and shifts the prediction mass — so one hash gates the whole
    // composition including both new operators.
    "q160_pipeline_v2" -> ((s, d) => {
      val (raw, packed0) = pipelineFlags(s, d)
      // two consumers (stage agg + survivor frame): checkpoint the narrow
      // flags once — the pipelineV3Parts treatment (guide §1.2)
      val packed = packed0.select(col("doc_id"), col("n_words"), col("near"),
        col("qual"), col("bal"), col("__binkey")).localCheckpoint(true)
      val one = packed.agg(
        count(lit(1)).as("d3"), coalesce(sum(col("n_words")), lit(0L)).as("t3"),
        count(when(col("near"), 1)).as("d4"),
        coalesce(sum(when(col("near"), col("n_words"))), lit(0L)).as("t4"),
        count(when(col("qual"), 1)).as("d5"),
        coalesce(sum(when(col("qual"), col("n_words"))), lit(0L)).as("t5"),
        count(when(col("bal"), 1)).as("d6"),
        coalesce(sum(when(col("bal"), col("n_words"))), lit(0L)).as("t6"),
        countDistinct(col("__binkey")).as("nb"))
      val pre = raw.agg(
        count(lit(1)).as("d1"), coalesce(sum(col("n_words")), lit(0L)).as("t1"),
        count(when(col("n_words") >= 3, 1)).as("d2"),
        coalesce(sum(when(col("n_words") >= 3, col("n_words"))), lit(0L)).as("t2"))
      val prof = graft.operators.Profile
        .profile(docs(s, d), Seq("doc_id", "text", "lang", "source", "n_chars"))
        .agg(max(col("n_rows")).as("p1"), sum(col("n_distinct")).as("p2"),
          sum(col("n_null")).as("p3"))
      // survivors are a filter over the packed checkpoint; fj is a corpus
      // text-feature pass shared by the ridge fit and predict, so IT is
      // what gets materialized once (the q146 precedent, guide §1.2)
      val surv = packed.filter(col("bal")).select(col("doc_id"))
      val fj = DataQueries.ridgeFrame(s, d).join(surv, "doc_id")
        .localCheckpoint(true)
      val fit = graft.operators.Ridge.fit(fj, DataQueries.ridgeFeatureCols, "y")
      val score = graft.operators.Ridge.predict(fj, fit, "doc_id")
        .agg(count(lit(1)).as("s1"),
          coalesce(sum(floor(col("yhat")).cast("long")), lit(0L)).as("s2"))
      pre.crossJoin(one).crossJoin(broadcast(prof)).crossJoin(broadcast(score))
        .selectExpr(
          """stack(9,
            |  '0_profile', p1, p2, p3,
            |  '1_raw',     d1, t1, CAST(0 AS BIGINT),
            |  '2_clean',   d2, t2, CAST(0 AS BIGINT),
            |  '3_exact',   d3, t3, CAST(0 AS BIGINT),
            |  '4_neardup', d4, t4, CAST(0 AS BIGINT),
            |  '5_quality', d5, t5, CAST(0 AS BIGINT),
            |  '6_balance', d6, t6, CAST(0 AS BIGINT),
            |  '7_pack',    d6, t6, nb,
            |  '8_score',   s1, s2, CAST(0 AS BIGINT)
            |) AS (stage, n_docs, n_tokens, n_bins)""".stripMargin)
        .orderBy("stage")
    }),

    // PIPELINE V3 (the classifier family made load-bearing): q160's nine
    // stages + '9_sample' — the LEARNED calibrated sampling gate run over
    // the balanced survivors. The classifier trains on the full corpus
    // (q164's fit), its scores pass through the q167 calibration map
    // (q169's join), and the q170 hex60 gate under floor(p_cal*1e6)
    // downsamples the curated corpus by learned quality. The stage row
    // carries kept docs, kept tokens, and the exact expected-mass audit
    // (sum of the integer micro-ppm p_cal over every survivor) — so a
    // drifted upstream verdict moves the training set, the calibration
    // bins, the per-doc p_cal, AND the sampled mass, and one hash gates
    // the whole composition including all three models.
    "q174_pipeline_v3" -> ((s, d) => {
      val (pre, one, prof, score, samp, _) = pipelineV3Parts(s, d)
      pre.crossJoin(one).crossJoin(broadcast(prof)).crossJoin(broadcast(score))
        .crossJoin(broadcast(samp))
        .selectExpr(
          """stack(10,
            |  '0_profile', p1, p2, p3,
            |  '1_raw',     d1, t1, CAST(0 AS BIGINT),
            |  '2_clean',   d2, t2, CAST(0 AS BIGINT),
            |  '3_exact',   d3, t3, CAST(0 AS BIGINT),
            |  '4_neardup', d4, t4, CAST(0 AS BIGINT),
            |  '5_quality', d5, t5, CAST(0 AS BIGINT),
            |  '6_balance', d6, t6, CAST(0 AS BIGINT),
            |  '7_pack',    d6, t6, nb,
            |  '8_score',   s1, s2, CAST(0 AS BIGINT),
            |  '9_sample',  k1, k2, k3
            |) AS (stage, n_docs, n_tokens, n_bins)""".stripMargin)
        .orderBy("stage")
    }),

    // Pipeline v4 — the DSIR gate composed as stage 'a_dsir' over the v3
    // sample survivors (FOUR models in one hash: profiler stats, the ridge
    // scorer, the calibrated classifier gate, and the corpus-wide DSIR
    // importance model). The dsir draw salts the doc_id (':dsir') so the
    // two sequential hex60 gates are independent uniforms, not the same
    // draw compared to two thresholds; the stage row carries kept docs,
    // kept tokens, and the exact integer expected-mass audit (sum of
    // rate_ppm over every stage-9 survivor).
    "q189_pipeline_v4" -> ((s, d) => {
      val (pre, one, prof, score, samp, gate) = pipelineV3Parts(s, d)
      val allDocs = docs(s, d)
      val rate = TextOps.dsirSample(TextOps.dsirScore(allDocs,
          TextOps.dsirBucketLlr(allDocs.filter(col("lang") === "en"), allDocs)))
        .select(col("doc_id"), col("rate_ppm"))
      val dgate = gate.filter(col("__keep")).select(col("doc_id"), col("n_words"))
        .join(rate, "doc_id")
        .withColumn("__dk",
          graft.dedup.Dedup.hex60(
            concat(col("doc_id").cast("string"), lit(":dsir"))) % 1000000L
            < col("rate_ppm"))
      val dsamp = dgate.agg(
        count(when(col("__dk"), 1)).as("x1"),
        coalesce(sum(when(col("__dk"), col("n_words"))), lit(0L)).as("x2"),
        coalesce(sum(col("rate_ppm").cast("decimal(38,0)")), lit(0))
          .cast("long").as("x3"))
      pre.crossJoin(one).crossJoin(broadcast(prof)).crossJoin(broadcast(score))
        .crossJoin(broadcast(samp)).crossJoin(broadcast(dsamp))
        .selectExpr(
          """stack(11,
            |  '0_profile', p1, p2, p3,
            |  '1_raw',     d1, t1, CAST(0 AS BIGINT),
            |  '2_clean',   d2, t2, CAST(0 AS BIGINT),
            |  '3_exact',   d3, t3, CAST(0 AS BIGINT),
            |  '4_neardup', d4, t4, CAST(0 AS BIGINT),
            |  '5_quality', d5, t5, CAST(0 AS BIGINT),
            |  '6_balance', d6, t6, CAST(0 AS BIGINT),
            |  '7_pack',    d6, t6, nb,
            |  '8_score',   s1, s2, CAST(0 AS BIGINT),
            |  '9_sample',  k1, k2, k3,
            |  'a_dsir',    x1, x2, x3
            |) AS (stage, n_docs, n_tokens, n_bins)""".stripMargin)
        .orderBy("stage")
    }),

    // INCREMENTAL pipeline v4 — the moving-corpus production loop, every
    // round-12 delta primitive composed into ONE cycle: the corpus moves
    // A -> B (q175's derived snapshot, full rows); the per-doc FEATURE
    // store reuses snapshot-A features for the unchanged majority and
    // recomputes only added+changed (q176's treatment — n_words, the
    // exact-dup hash, the quality/classifier/ridge features: every
    // text-pass value); the near-dup MinHash store retires departing
    // EXACT-WINNERS and appends arriving ones (q178's path, driven by the
    // winner-set diff — a displaced winner re-enters with its unchanged
    // text, a changed winner retires and resurrects); the corpus-wide
    // DSIR model store retires departing counts and appends arriving ones
    // (q186's path at q189's lang='en' target). Stage aggregations, the
    // ridge and calibrated-classifier fits, and all three hex60 gates
    // then run over STORED features only — no text pass touches an
    // unchanged document anywhere in the cycle. The oracle is the
    // monolithic q189 replay re-rooted at snapshot B: hash equality IS
    // the proof that the incremental loop converges to from-scratch.
    // (The exact-distinct profiler stage aggregates full B by definition
    // — its incremental twin is the sketch-store family, q156/q158.)
    // Cost ∝ delta, measured: the delta slice is ~26% of the corpus
    // (removed %13 + changed %7 + added %17) and only it pays a text
    // pass; end-to-end at sf0.1 the whole query — A-side store builds +
    // the cycle + every B-side aggregation — committed at 20.6 s vs the
    // monolithic q189's 14.7 s (r13 session), with a measured 10x scaling
    // exponent of 0.39 in the bench's scale10 block (sub-linear: the
    // delta-proportional maintenance dilutes the corpus-proportional
    // aggregations). Body factored into [[v4BuildStoresOnA]]/
    // [[v4AdvanceStores]]/[[v4FrameFromStores]], shared with q196's
    // second cycle.
    "q191_pipeline_v4_incremental" -> ((s, d) => {
      val base = DataQueries.ivfIndexPath(d) + "_v4inc"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val a = docs(s, d)
      val b = DataQueries.snapshotBFull(a)
      val featA = v4BuildStoresOnA(s, a, s"$base/mh", s"$base/dsir")
      val featB = v4AdvanceStores(s, a, b, featA, s"$base/mh", s"$base/dsir",
        mhRetireId = 2, mhAppendId = 3, dsirRetireId = 1, dsirAppendId = 2)
      v4FrameFromStores(s, b, featB, s"$base/mh", s"$base/dsir")
    }),

    // SECOND incremental cycle — the loop is a FIXED POINT, not a
    // one-shot: the corpus moves A→B→C and the SAME stores advance
    // through both deltas (the feature store twice-reused, the MinHash
    // store through two retire/append/compact cycles — the second over a
    // base its first retirement compaction already relocated — and the
    // DSIR count store through two signed-delta cycles). The frame over C
    // must hash-match the monolithic q189 recomputed over the
    // twice-derived snapshot: any state the first cycle leaves behind
    // that the second mis-reads (a stale ledger, a resurrected row, a
    // mis-merged base) shifts a stage count and fails.
    "q196_pipeline_v4_cycle2" -> ((s, d) => {
      val base = DataQueries.ivfIndexPath(d) + "_v4inc2"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val a = docs(s, d)
      val b = DataQueries.snapshotBFull(a)
      val c = DataQueries.snapshotCFull(b)
      val featA = v4BuildStoresOnA(s, a, s"$base/mh", s"$base/dsir")
      val featB = v4AdvanceStores(s, a, b, featA, s"$base/mh", s"$base/dsir",
        mhRetireId = 2, mhAppendId = 3, dsirRetireId = 1, dsirAppendId = 2)
      val featC = v4AdvanceStores(s, b, c, featB, s"$base/mh", s"$base/dsir",
        mhRetireId = 4, mhAppendId = 5, dsirRetireId = 3, dsirAppendId = 4)
      v4FrameFromStores(s, c, featC, s"$base/mh", s"$base/dsir")
    }),

    // THE WHOLE-WAREHOUSE CYCLE — every document-driven store family
    // advances through ONE corpus move in ONE maintenance cycle, then B
    // serves from all of them in one frame. The A-state warehouse holds
    // the v4 trio (per-doc feature store, MinHash mine store, DSIR model
    // store), the trigram-backoff LM count tables, the CMS term sketch,
    // and the refresh-managed WordPiece vocabulary; the crawl moves A→B
    // and each family takes its own un-learn path in the same pass —
    // winner-set diff (MinHash), signed count deltas (DSIR/LM/CMS),
    // fingerprint-gated retrain (vocab). One row per family, integer
    // aggregates only; the oracle recomputes every family FROM SCRATCH
    // over the snapshot-B CTE, so a cross-family id collision, a
    // maintenance pass that read a sibling store's half-advanced state,
    // or any single family's stale/leaked rows shifts its row and fails
    // the hash. (Embedding-driven families — ANN indexes, PCA moments —
    // advance on the embeddings delta, gated by q195/q201-q203; the
    // decontam store rotates on the eval-suite schedule, q194 — neither
    // moves with THIS table's delta, so they are correctly absent here.)
    "q207_warehouse_cycle" -> ((s, d) => {
      import graft.streaming.StreamingPipeline
      import graft.text.{TextOps, VocabStore}
      val base = DataQueries.ivfIndexPath(d) + "_wh"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val a = docs(s, d)
      val b = DataQueries.snapshotBFull(a)
      val aTxt = a.select(col("doc_id"), col("text"))
      val bTxt = b.select(col("doc_id"), col("text"))
      def terms(df: DataFrame) = df.select(
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      // one shared delta, checkpointed up front (it only needs the two
      // text snapshots), then every family's A-build -> advance chain runs
      // as its own section over DISJOINT stores (guide §2.6): each family
      // keeps its exact op order and store lock; only the between-family
      // interleaving changes, which no result can observe
      val delta = graft.dedup.Dedup.corpusDelta(aTxt, bTxt).localCheckpoint(true)
      val oldIds = delta.filter(col("status").isin("removed", "changed"))
        .select("doc_id")
      val newIds = delta.filter(col("status").isin("added", "changed"))
        .select("doc_id")
      @volatile var featB: DataFrame = null
      graft.core.Par.sections(
        () => {
          val featA = v4BuildStoresOnA(s, a, s"$base/mh", s"$base/dsir")
          featB = v4AdvanceStores(s, a, b, featA, s"$base/mh", s"$base/dsir",
            mhRetireId = 2, mhAppendId = 3, dsirRetireId = 1, dsirAppendId = 2,
            sharedDelta = Some(delta))
        },
        () => {
          TextOps.saveLm(aTxt, s"$base/lm")
          TextOps.retireLm(aTxt.join(oldIds, "doc_id"), s"$base/lm", appendId = 1)
          TextOps.appendLm(bTxt.join(newIds, "doc_id"), s"$base/lm", appendId = 2)
          TextOps.compactLm(s, s"$base/lm")
        },
        () => {
          (0 to 1).foreach(i => StreamingPipeline.cmsMergeBatch(s"$base/cms", "term")(
            terms(aTxt.filter(col("doc_id") % 2 === i)), i.toLong))
          StreamingPipeline.retireCmsSlice(s"$base/cms", "term")(
            terms(aTxt.join(oldIds, "doc_id")), retireId = 5L)
          StreamingPipeline.cmsMergeBatch(s"$base/cms", "term")(
            terms(bTxt.join(newIds, "doc_id")), 6L)
        },
        () => {
          require(VocabStore.refreshSubword(aTxt, size = 256, maxPieceLen = 6,
            s"$base/vocab"))
          require(VocabStore.refreshSubword(bTxt, size = 256, maxPieceLen = 6,
            s"$base/vocab"), "the moved corpus must retrain the vocab")
        },
        () => {
          // the drift monitor advances through the same shared delta: its
          // live counts move to B while the frozen baseline keeps A, so the
          // gate row carries the cycle's OWN drift report
          graft.operators.Drift.buildDriftStore(a, DataQueries.driftFeatures,
            s"$base/drift")
          graft.operators.Drift.retireDriftCounts(a.join(oldIds, "doc_id"),
            DataQueries.driftFeatures, s"$base/drift", appendId = 1)
          graft.operators.Drift.appendDriftCounts(b.join(newIds, "doc_id"),
            DataQueries.driftFeatures, s"$base/drift", appendId = 2)
          graft.operators.Drift.compactDriftStore(s, s"$base/drift")
        })
      // ---- one gate frame: B served from every advanced store
      def row(fam: String, df: DataFrame, m1: Column, m2: Column, m3: Column) =
        df.agg(m1.cast("long").as("m1"), m2.cast("long").as("m2"),
            m3.cast("long").as("m3"))
          .select(lit(fam).as("family"), col("m1"), col("m2"), col("m3"))
      val exactKept = v4Winners(featB).localCheckpoint(true)
      val dropped = StreamingPipeline.readDedupPairs(s, s"$base/mh")
        .select(col("doc_b").as("doc_id")).distinct()
      row("1_feat", featB,
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)), lit(0L))
        .unionByName(row("2_exact", exactKept,
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)), lit(0L)))
        .unionByName(row("3_near", exactKept.join(dropped, Seq("doc_id"), "left_anti"),
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)), lit(0L)))
        .unionByName(row("4_lm", TextOps.scoreWithLm(bTxt, s"$base/lm"),
          count(lit(1)), coalesce(sum(col("n_backoff")), lit(0L)),
          coalesce(sum(col("n_unseen")), lit(0L))))
        .unionByName(row("5_cms", graft.sketch.Sketches.cmsTopKFromCells(
            terms(bTxt), s.read.parquet(s"$base/cms"),
            termCol = "term", d = 3, w = 1024, k = 20),
          count(lit(1)), coalesce(sum(col("est")), lit(0L)),
          coalesce(sum(col("cnt")), lit(0L))))
        .unionByName(row("6_dsir", TextOps.scoreWithDsir(bTxt, s"$base/dsir"),
          count(lit(1)), coalesce(sum(col("dsir6")), lit(0L)),
          coalesce(sum(col("rate_ppm")), lit(0L))))
        .unionByName(row("7_vocab", graft.text.Subword.storedVocabGate(
            bTxt, size = 256, maxPieceLen = 6, s"$base/vocab"),
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)),
          coalesce(sum(col("vocab_viol") + col("tok_viol") + col("oov_viol")),
            lit(0L))))
        .unionByName(row("8_drift",
          graft.operators.Drift.psiFromStore(s, s"$base/drift"),
          count(lit(1)), coalesce(sum(col("n_b")), lit(0L)),
          coalesce(sum(floor(col("psi") * 1e6 + 0.5)), lit(0L))))
        .orderBy("family")
    }),

    // THE 10-FAMILY WAREHOUSE CYCLE (the r15 verdict's item 5): q207's
    // eight document-driven families PLUS the two store families round 15
    // left maintained outside the cycle — the chunk-packed EXPORT ledger
    // (q224's incremental path, advancing through the SAME shared delta:
    // reuse every bin the ripple can't reach, re-pack from the first
    // affected chunk) and the TIME-AXIS daily drift monitor (q225's
    // day-keyed ledger on the events table: history backfilled once, the
    // last day arriving through the daily append). One maintenance pass,
    // ten families, one gate frame; the oracle recomputes every family
    // FROM SCRATCH over the post-move state (snapshot B for the nine
    // document families, the raw event history for the daily monitor), so
    // any family serving half-advanced or stale state shifts its row and
    // fails the hash.
    "q230_warehouse_cycle10" -> ((s, d) => {
      import graft.streaming.StreamingPipeline
      import graft.text.{TextOps, VocabStore}
      import graft.operators.Shards
      val base = DataQueries.ivfIndexPath(d) + "_wh10"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val a = docs(s, d)
      val b = DataQueries.snapshotBFull(a)
      val aTxt = a.select(col("doc_id"), col("text"))
      val bTxt = b.select(col("doc_id"), col("text"))
      def terms(df: DataFrame) = df.select(
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      // one shared delta, checkpointed up front, then every family's
      // A-build -> advance chain runs as its own section over DISJOINT
      // stores (guide §2.6, same treatment as q207): per-family op order,
      // ids, and store locks are untouched — only the between-family
      // interleaving changes, which no result can observe
      val delta = graft.dedup.Dedup.corpusDelta(aTxt, bTxt).localCheckpoint(true)
      val oldIds = delta.filter(col("status").isin("removed", "changed"))
        .select("doc_id")
      val newIds = delta.filter(col("status").isin("added", "changed"))
        .select("doc_id")
      @volatile var featB: DataFrame = null
      @volatile var ledgerB: DataFrame = null
      graft.core.Par.sections(
        () => {
          val featA = v4BuildStoresOnA(s, a, s"$base/mh", s"$base/dsir")
          featB = v4AdvanceStores(s, a, b, featA, s"$base/mh", s"$base/dsir",
            mhRetireId = 2, mhAppendId = 3, dsirRetireId = 1, dsirAppendId = 2,
            sharedDelta = Some(delta))
        },
        () => {
          TextOps.saveLm(aTxt, s"$base/lm")
          TextOps.retireLm(aTxt.join(oldIds, "doc_id"), s"$base/lm", appendId = 1)
          TextOps.appendLm(bTxt.join(newIds, "doc_id"), s"$base/lm", appendId = 2)
          TextOps.compactLm(s, s"$base/lm")
        },
        () => {
          (0 to 1).foreach(i => StreamingPipeline.cmsMergeBatch(s"$base/cms", "term")(
            terms(aTxt.filter(col("doc_id") % 2 === i)), i.toLong))
          StreamingPipeline.retireCmsSlice(s"$base/cms", "term")(
            terms(aTxt.join(oldIds, "doc_id")), retireId = 5L)
          StreamingPipeline.cmsMergeBatch(s"$base/cms", "term")(
            terms(bTxt.join(newIds, "doc_id")), 6L)
        },
        () => {
          require(VocabStore.refreshSubword(aTxt, size = 256, maxPieceLen = 6,
            s"$base/vocab"))
          require(VocabStore.refreshSubword(bTxt, size = 256, maxPieceLen = 6,
            s"$base/vocab"), "the moved corpus must retrain the vocab")
        },
        () => {
          graft.operators.Drift.buildDriftStore(a, DataQueries.driftFeatures,
            s"$base/drift")
          graft.operators.Drift.retireDriftCounts(a.join(oldIds, "doc_id"),
            DataQueries.driftFeatures, s"$base/drift", appendId = 1)
          graft.operators.Drift.appendDriftCounts(b.join(newIds, "doc_id"),
            DataQueries.driftFeatures, s"$base/drift", appendId = 2)
          graft.operators.Drift.compactDriftStore(s, s"$base/drift")
        },
        () => {
          // the export family's A-state: the packed chunks + their ledger;
          // it advances through the SAME delta — both sides' chunks of the
          // non-unchanged docs invalidate, prefix bins reuse
          val packA = TextOps.packSequences(DataQueries.chunkUnits(aTxt),
            budget = 512, shards = 32, tokenCount = Some(col("n_tokens")))
            .localCheckpoint(true)
          val ledgerA = Shards.packedLedger(packA).localCheckpoint(true)
          val affected = DataQueries.chunkUnits(aTxt.join(oldIds, "doc_id"))
            .unionByName(DataQueries.chunkUnits(bTxt.join(newIds, "doc_id")))
            .select("doc_id")
          ledgerB = Shards.incrementalPackedLedger(
            DataQueries.chunkUnits(bTxt), packA, ledgerA, affected,
            budget = 512, nShards = 32).localCheckpoint(true)
        },
        () => {
          // the daily monitor's A-state is the day-keyed count ledger over
          // the event history; it advances through ITS OWN axis — today's
          // counts land once, replay-safe, through the daily append path
          val ev = Tables.cleanEvents(s, d)
            .select(to_date(col("ts")).as("day"), col("metric")).localCheckpoint(true)
          // bounded collect: ONE date — the "today" the daily job appends
          val maxDay = ev.agg(max("day")).head().getDate(0)
          graft.operators.Drift.buildDailyDriftStore(
            ev.filter(col("day") < lit(maxDay)), col("day"), col("metric"),
            s"$base/daily")
          graft.operators.Drift.appendDailyDriftCounts(
            ev.filter(col("day") === lit(maxDay)), col("metric"),
            s"$base/daily", maxDay.toLocalDate.toEpochDay)
        })
      // ---- one gate frame: B served from every advanced store
      def row(fam: String, df: DataFrame, m1: Column, m2: Column, m3: Column) =
        df.agg(m1.cast("long").as("m1"), m2.cast("long").as("m2"),
            m3.cast("long").as("m3"))
          .select(lit(fam).as("family"), col("m1"), col("m2"), col("m3"))
      val exactKept = v4Winners(featB).localCheckpoint(true)
      val dropped = StreamingPipeline.readDedupPairs(s, s"$base/mh")
        .select(col("doc_b").as("doc_id")).distinct()
      row("1_feat", featB,
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)), lit(0L))
        .unionByName(row("2_exact", exactKept,
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)), lit(0L)))
        .unionByName(row("3_near", exactKept.join(dropped, Seq("doc_id"), "left_anti"),
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)), lit(0L)))
        .unionByName(row("4_lm", TextOps.scoreWithLm(bTxt, s"$base/lm"),
          count(lit(1)), coalesce(sum(col("n_backoff")), lit(0L)),
          coalesce(sum(col("n_unseen")), lit(0L))))
        .unionByName(row("5_cms", graft.sketch.Sketches.cmsTopKFromCells(
            terms(bTxt), s.read.parquet(s"$base/cms"),
            termCol = "term", d = 3, w = 1024, k = 20),
          count(lit(1)), coalesce(sum(col("est")), lit(0L)),
          coalesce(sum(col("cnt")), lit(0L))))
        .unionByName(row("6_dsir", TextOps.scoreWithDsir(bTxt, s"$base/dsir"),
          count(lit(1)), coalesce(sum(col("dsir6")), lit(0L)),
          coalesce(sum(col("rate_ppm")), lit(0L))))
        .unionByName(row("7_vocab", graft.text.Subword.storedVocabGate(
            bTxt, size = 256, maxPieceLen = 6, s"$base/vocab"),
          count(lit(1)), coalesce(sum(col("n_words")), lit(0L)),
          coalesce(sum(col("vocab_viol") + col("tok_viol") + col("oov_viol")),
            lit(0L))))
        .unionByName(row("8_drift",
          graft.operators.Drift.psiFromStore(s, s"$base/drift"),
          count(lit(1)), coalesce(sum(col("n_b")), lit(0L)),
          coalesce(sum(floor(col("psi") * 1e6 + 0.5)), lit(0L))))
        .unionByName(row("9_pack", ledgerB,
          count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)),
          coalesce(expr("bit_xor(checksum)"), lit(0L))))
        .unionByName(row("a_daily",
          graft.operators.Drift.dailyDriftFromStore(s, s"$base/daily"),
          count(lit(1)), coalesce(sum(col("n_b")), lit(0L)),
          coalesce(sum(floor(col("psi") * 1e6 + 0.5)), lit(0L))))
        .orderBy("family")
    }),

    // The v4 pipeline's per-document kill matrix (see
    // [[pipelineKillMatrix]]) — every stage verdict + first-fail charging,
    // reconciling with q189's stage counts by shared construction; the
    // oracle replays the same monolithic CTEs per document.
    "q192_pipeline_kill_matrix" -> ((s, d) =>
      pipelineKillMatrix(s, d).orderBy("doc_id")),

    // The survival funnel over that matrix: (stage, n_in, n_killed,
    // n_out), sequential-chain accounting — each stage's n_out is q189's
    // matching stage count (d2..d6, k1, x1) and the last n_out is the v4
    // training set size.
    "q193_pipeline_funnel" -> ((s, d) => {
      val agg = pipelineKillMatrix(s, d).agg(
        count(lit(1)).as("n0"),
        count(when(col("pass_length"), 1)).as("n1"),
        count(when(col("pass_exact"), 1)).as("n2"),
        count(when(col("pass_near"), 1)).as("n3"),
        count(when(col("pass_quality"), 1)).as("n4"),
        count(when(col("pass_balance"), 1)).as("n5"),
        count(when(col("pass_classifier"), 1)).as("n6"),
        count(when(col("pass_dsir"), 1)).as("n7"))
      agg.selectExpr(
        """stack(7,
          |  '1_length',     n0, n0 - n1, n1,
          |  '2_exact_dup',  n1, n1 - n2, n2,
          |  '3_near_dup',   n2, n2 - n3, n3,
          |  '4_quality',    n3, n3 - n4, n4,
          |  '5_balance',    n4, n4 - n5, n5,
          |  '6_classifier', n5, n5 - n6, n6,
          |  '7_dsir',       n6, n6 - n7, n7
          |) AS (stage, n_in, n_killed, n_out)""".stripMargin)
        .orderBy("stage")
    }),

    // Delta-driven LM store maintenance — the UN-learn path (q175's
    // corpusDelta made load-bearing for the count-table family): the store
    // is the fit over snapshot A; the crawl moves to snapshot B; instead of
    // rebuilding, retireLm lands NEGATED counts for the removed/changed-old
    // slice and appendLm lands positive counts for the added/changed-new
    // slice — cost ∝ the delta, never the corpus. Counts are additive
    // longs, so after compaction (which drops fully-retired grams) the
    // store must score snapshot B exactly like a from-scratch monolithic
    // fit over it — q109's oracle re-rooted at the derived snapshot. A
    // lost retirement, a sign error, or a compaction keeping a zero-count
    // gram shifts some document's backoff path and fails the hash.
    "q177_lm_delta_maintenance" -> ((s, d) => {
      import graft.dedup.Dedup
      val path = vocabPath(d) + "_lmdelta"
      val a = docs(s, d).select(col("doc_id"), col("text"))
      val b = DataQueries.snapshotB(a)
      val delta = Dedup.corpusDelta(a, b).localCheckpoint(true)
      TextOps.saveLm(a, path)
      val oldSlice = a.join(delta.filter(col("status").isin("removed", "changed"))
        .select("doc_id"), "doc_id")
      val newSlice = b.join(delta.filter(col("status").isin("added", "changed"))
        .select("doc_id"), "doc_id")
      TextOps.retireLm(oldSlice, path, appendId = 1)
      TextOps.appendLm(newSlice, path, appendId = 2)
      TextOps.compactLm(s, path)
      TextOps.scoreWithLm(b, path).orderBy("doc_id")
    }),

    // The persisted-vocabulary twin of q105: train the WordPiece vocab ONCE
    // into a parquet store (piece, weight, rank), then tokenize every
    // document with the LOADED vocabulary and assert it produces the exact
    // piece sequences the in-memory path does (vocab/tok/oov disagreement
    // counters, all zero). DuckDB anchors the row shape; the counters make
    // the store round-trip's fidelity oracle-checkable.
    "q113_subword_store" -> ((s, d) => {
      val path = vocabPath(d)
      graft.text.Subword.savePieces(docs(s, d), size = 256, maxPieceLen = 6, path)
      graft.text.Subword.storedVocabGate(docs(s, d), size = 256, maxPieceLen = 6, path)
        .orderBy("doc_id")
    }),

    // VOCAB LIFECYCLE under the moving corpus — the one artifact family
    // where delta-maintenance is impossible by construction (the fit is a
    // global greedy ranking, not a sum), so the un-learn path is
    // fingerprint-gated retrain ([[graft.text.VocabStore]]): train on
    // snapshot A, prove the unmoved corpus is an EXACT NO-OP (the require
    // fails the query if a second refresh retrains), move the corpus to
    // snapshot B (doc removed / revised / added — the q175 delta), refresh,
    // and tokenize B through the STORED vocabulary. The gate counters must
    // all be zero against an in-memory vocab trained fresh on B — a
    // refresh that no-opped on the moved corpus (stale fingerprint), a
    // torn swap, or a stamp that ignored the revision serves A's vocab
    // and trips tok_viol/vocab_viol; oracle = q113's row shape over the
    // snapshot-B CTE.
    "q206_vocab_refresh" -> ((s, d) => {
      import graft.text.VocabStore
      val path = vocabPath(d) + "_refresh"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val a = docs(s, d).select(col("doc_id"), col("text"))
      val b = DataQueries.snapshotB(a)
      require(VocabStore.refreshSubword(a, size = 256, maxPieceLen = 6, path),
        "first refresh must train the store")
      require(!VocabStore.refreshSubword(a, size = 256, maxPieceLen = 6, path),
        "an unmoved corpus must be an exact no-op")
      require(VocabStore.refreshSubword(b, size = 256, maxPieceLen = 6, path),
        "a moved corpus must retrain")
      graft.text.Subword.storedVocabGate(b, size = 256, maxPieceLen = 6, path)
        .orderBy("doc_id")
    }),

    // STREAMING FLAGSHIP (the r10 verdict's last capability gap): every
    // streaming maintainer is gated per-family, but production runs them
    // TOGETHER — the reference's own ingest-triggers-recompute loop
    // (routers/ingest.py:183-189) is the one-series version of exactly
    // this. ONE streaming session over two file-delivery feeds grows FOUR
    // store families at once — the trigram LM (q130's maintainer), the
    // MinHash dedup store (q124's), the decontamination store (q121's
    // bench side; built from a bench prefix, stream-grown with the rest —
    // the q119 build-prefix-then-append lifecycle convention), and the
    // per-lang length histogram sketch (q159's) — then a final BATCH read
    // scores every corpus document from ALL four stores in one frame:
    // LM nll + unseen count, contamination verdict, near-dup membership,
    // and the doc's (lang, length-bucket) population. The oracle replays
    // the monolithic batch pipeline (q109 + q118 + q26 + a histogram
    // GROUP BY composed in one SQL) and never knows a stream was involved
    // — a dropped micro-batch, a double-fired trigger, cross-maintainer
    // interference between the four concurrent queries, or a stale store
    // half shifts some column of some document and fails the hash.
    "q163_streaming_flagship" -> ((s, d) => {
      import graft.streaming.StreamingPipeline
      import graft.dedup.Dedup
      val base = vocabPath(d) + "_sflag"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      // fresh run each call: the ledgers make replays no-ops, so a stale
      // store would short-circuit the maintenance under test
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val all = docs(s, d)
      def bucket = Dedup.hex60(col("doc_id").cast("string")) % 100
      // delivery feeds: the full corpus (32 files at maxFilesPerTrigger=16
      // -> every maintainer fires across multiple triggers) and the
      // hex60 >= 80 benchmark slice
      all.select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/in_all")
      val bench = all.filter(bucket >= 80)
      Dedup.buildDecontamStore(bench.filter(col("doc_id") % 3 === 0),
        s"$base/dc", n = 3, k = 4, m = 1 << 20)
      bench.filter(col("doc_id") % 3 =!= 0).select(col("doc_id"), col("text"))
        .repartition(8).write.mode("overwrite").parquet(s"$base/in_bench")
      // ONE streaming session: four maintainers run concurrently, each
      // with its own checkpoint and store — start all, then drain
      val running = startFlagshipMaintainers(s, s"$base/in_all", s"$base/in_bench", base)
      running.foreach(_.awaitTermination())
      compactFlagshipStores(s, base)
      // final batch read: one frame scoring the corpus slice from all four
      flagshipScoreFrame(s, base, all.filter(bucket < 80))
    }),

    // STREAMING FLAGSHIP v2 — q163's composed session plus the DSIR
    // importance model as a FIFTH concurrently-growing store family: the
    // model batch-builds on the doc_id % 3 == 0 prefix (appends need the
    // store's pinned m — the decontam-appender convention), the rest of
    // the corpus streams through the exactly-once count-delta maintainer
    // on its own checkpoint, and the final batch frame scores every
    // corpus-slice document from ALL FIVE stores (LM nll, contamination,
    // near-dup membership, length-bucket population, AND the DSIR weight
    // + acceptance rate). The oracle is q163's composed monolith joined
    // with the ds_-namespaced DSIR replay — five concurrent maintainers,
    // one hash, and the stream remains unobservable. (Restart coverage:
    // StreamingFlagshipSpec drills exactly this five-maintainer set —
    // kill mid-stream with the DSIR checkpoint among the skewed-ahead
    // families, compact while down, restart, replay — plus the
    // per-family streamed-DSIR restart drill in IngestStreamingSpec.)
    "q190_streaming_flagship_v2" -> ((s, d) => {
      import graft.streaming.StreamingPipeline
      import graft.dedup.Dedup
      val base = vocabPath(d) + "_sflag2"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val all = docs(s, d)
      def bucket = Dedup.hex60(col("doc_id").cast("string")) % 100
      all.select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/in_all")
      val bench = all.filter(bucket >= 80)
      Dedup.buildDecontamStore(bench.filter(col("doc_id") % 3 === 0),
        s"$base/dc", n = 3, k = 4, m = 1 << 20)
      bench.filter(col("doc_id") % 3 =!= 0).select(col("doc_id"), col("text"))
        .repartition(8).write.mode("overwrite").parquet(s"$base/in_bench")
      val isT = col("lang") === "en"
      TextOps.saveDsir(all.filter(col("doc_id") % 3 === 0), isT, m = 1024,
        s"$base/dsir")
      all.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(8).write.mode("overwrite").parquet(s"$base/in_rest")
      val running = startFlagshipMaintainers(
          s, s"$base/in_all", s"$base/in_bench", base) :+
        StreamingPipeline.dsirAppendStream(
          StreamingPipeline.readColumnsStream(s, s"$base/in_rest",
            "doc_id LONG, text STRING, lang STRING"),
          isT, s"$base/dsir", s"$base/ck_dsir").start()
      running.foreach(_.awaitTermination())
      // disjoint stores, independent compactions — overlap (guide §2.6)
      graft.core.Par.sections(
        () => compactFlagshipStores(s, base),
        () => { TextOps.compactDsir(s, s"$base/dsir"); () })
      val slice = all.filter(bucket < 80)
      flagshipScoreFrame(s, base, slice)
        .join(TextOps.scoreWithDsir(
            slice.select(col("doc_id"), col("text")), s"$base/dsir")
          .select(col("doc_id"), col("dsir6"), col("rate_ppm")), Seq("doc_id"))
        .orderBy("doc_id")
    }),

    // STREAMING FLAGSHIP v3 — q190's five concurrent maintainers plus
    // the PACKED EXPORT as a SIXTH stream-grown store family (the r16
    // verdict's item 6: the export matured outside the flagship). The
    // pack feed delivers in id-ordered tranches (the monotone-ingest
    // contract q227 established); the other five families ride the same
    // three sessions — their feeds are fully delivered up front, so
    // sessions 2 and 3 are checkpointed no-ops for them. Between-session
    // maintenance now includes the export compaction, and EVERY
    // compaction self-vacuums its ledger (r16 item 5): the session ends
    // with bounded ledger metadata without any vacuumStore call — the
    // final assert_true row pins exactly that (≤ 2 batch dirs and a
    // stamped watermark on the pack half). The final frame scores the
    // corpus slice from ALL SIX stores: q190's five plus the per-doc
    // pack placement (unit count, packed tokens, chunk-0 (shard, bin),
    // and an order-free xor checksum over every unit's (id, shard, bin,
    // offset)) served from the store's pack rows — hash-equal to the
    // monolithic chunk→pack chain over the same corpus.
    "q235_streaming_flagship_v3" -> ((s, d) => {
      import graft.streaming.StreamingPipeline
      import graft.dedup.Dedup
      val base = vocabPath(d) + "_sflag3"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val all = docs(s, d)
      def bucket = Dedup.hex60(col("doc_id").cast("string")) % 100
      all.select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/in_all")
      val bench = all.filter(bucket >= 80)
      Dedup.buildDecontamStore(bench.filter(col("doc_id") % 3 === 0),
        s"$base/dc", n = 3, k = 4, m = 1 << 20)
      bench.filter(col("doc_id") % 3 =!= 0).select(col("doc_id"), col("text"))
        .repartition(8).write.mode("overwrite").parquet(s"$base/in_bench")
      val isT = col("lang") === "en"
      TextOps.saveDsir(all.filter(col("doc_id") % 3 === 0), isT, m = 1024,
        s"$base/dsir")
      all.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("text"), col("lang"))
        .repartition(8).write.mode("overwrite").parquet(s"$base/in_rest")
      val dd = all.select(col("doc_id"), col("text")).localCheckpoint(true)
      // bounded collect: two cut points — the monotone-ingest tranches
      val maxId = dd.agg(max("doc_id")).head().getLong(0)
      val (c1, c2) = (maxId / 3, 2 * maxId / 3)
      def deliverPack(df: DataFrame): Unit =
        df.coalesce(1).write.mode("append").parquet(s"$base/in_pack")
      def session(): Unit = {
        val running = startFlagshipMaintainers(
            s, s"$base/in_all", s"$base/in_bench", base) ++ Seq(
          StreamingPipeline.dsirAppendStream(
            StreamingPipeline.readColumnsStream(s, s"$base/in_rest",
              "doc_id LONG, text STRING, lang STRING"),
            isT, s"$base/dsir", s"$base/ck_dsir").start(),
          StreamingPipeline.packedExportStream(
            StreamingPipeline.readDocStream(s, s"$base/in_pack"),
            s"$base/pack", s"$base/ck_pack", budget = 512, nShards = 32).start())
        running.foreach(_.awaitTermination())
      }
      deliverPack(dd.filter(col("doc_id") <= c1)); session()
      deliverPack(dd.filter(col("doc_id") > c1 && col("doc_id") <= c2)); session()
      deliverPack(dd.filter(col("doc_id") > c2)); session()
      graft.core.Par.sections(
        () => compactFlagshipStores(s, base),
        () => { TextOps.compactDsir(s, s"$base/dsir"); () },
        () => { StreamingPipeline.compactPackedExport(s, s"$base/pack"); () })
      // the self-running-vacuum gate: bounded ledger metadata with NO
      // explicit vacuum anywhere in this query
      val packHalf = s"$base/pack/pack"
      val nLedgerDirs = fs.listStatus(new org.apache.hadoop.fs.Path(packHalf))
        .count(_.getPath.getName.startsWith("batch="))
      val wOk = graft.store.Ledger.watermark(fs, packHalf) >= 4L
      val slice = all.filter(bucket < 80)
      val packRows = s.read.parquet(graft.similarity.Similarity.activeDir(
          fs, packHalf))
        .select("shard", "bin", "doc_id", "n_tokens", "bin_offset")
      val perDoc = packRows
        .withColumn("orig", expr("doc_id div 1000000"))
        .withColumn("u", Dedup.hex60(concat_ws(":",
          col("doc_id").cast("string"), col("shard").cast("string"),
          col("bin").cast("string"), col("bin_offset").cast("string"))))
        .groupBy("orig").agg(count(lit(1)).as("n_units"),
          sum("n_tokens").as("tok_packed"), expr("bit_xor(u)").as("pack_sum"))
      val firstUnit = packRows.filter(col("doc_id") % 1000000L === 0L)
        .select(expr("doc_id div 1000000").as("orig"),
          col("shard").as("first_shard"), col("bin").as("first_bin"))
      flagshipScoreFrame(s, base, slice)
        .join(TextOps.scoreWithDsir(
            slice.select(col("doc_id"), col("text")), s"$base/dsir")
          .select(col("doc_id"), col("dsir6"), col("rate_ppm")), Seq("doc_id"))
        .join(perDoc.join(firstUnit, "orig")
          .select(col("orig").as("doc_id"), col("n_units"), col("tok_packed"),
            col("first_shard"), col("first_bin"), col("pack_sum")), Seq("doc_id"))
        // assert_true returns null when the predicate holds, so the
        // filter keeps every row and the oracle needs no mirror
        .filter(assert_true(lit(nLedgerDirs <= 2 && wOk),
          lit(s"self-vacuum failed: $nLedgerDirs pack ledger dirs, " +
            s"watermark-stamped=$wOk")).isNull)
        .orderBy("doc_id")
    })
  )

  /** q163's four concurrent store maintainers — ONE streaming session
    * growing the trigram LM, the MinHash dedup store, the per-lang length
    * histogram, and the decontamination store, each on its own checkpoint
    * under `base`. Shared by the composed-session restart drill
    * (StreamingFlagshipSpec), which kills and restarts exactly this set on
    * the same checkpoints.
    */
  private[graft] def startFlagshipMaintainers(s: SparkSession, inAll: String,
      inBench: String, base: String): Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
    import graft.streaming.StreamingPipeline
    Seq(
      StreamingPipeline.lmAppendStream(
        StreamingPipeline.readDocStream(s, inAll),
        s"$base/lm", s"$base/ck_lm").start(),
      StreamingPipeline.minhashDedupStream(
        StreamingPipeline.readDocStream(s, inAll),
        s"$base/mh", s"$base/ck_mh").start(),
      StreamingPipeline.histogramStream(
        StreamingPipeline.readColumnsStream(s, inAll,
          "doc_id BIGINT, lang STRING, n_chars BIGINT"),
        s"$base/hist", s"$base/ck_hist",
        keys = Seq("lang"), valueCol = "n_chars", binWidth = 50.0, numBins = 20).start(),
      StreamingPipeline.decontamAppendStream(
        StreamingPipeline.readDocStream(s, inBench),
        s"$base/dc", s"$base/ck_dc").start())
  }

  /** Between-sessions maintenance over the flagship's grown stores. */
  private[graft] def compactFlagshipStores(s: SparkSession, base: String): Unit =
    // three disjoint stores, three independent compactions — overlap them
    // (guide §2.6); each keeps its own maintenance lock and swap discipline
    graft.core.Par.sections(
      () => { TextOps.compactLm(s, s"$base/lm"); () },
      () => { graft.streaming.StreamingPipeline.compactMinhashStore(s, s"$base/mh"); () },
      () => { graft.dedup.Dedup.compactDecontamStore(s, s"$base/dc"); () })

  /** The flagship's final batch read: one frame scoring every `corpus`
    * document (doc_id, text, lang, n_chars) from ALL four grown stores —
    * LM nll + unseen count, contamination verdict, near-dup membership,
    * and the (lang, length-bucket) population. Store geometry (decontam
    * k=4 / m=1<<20, histogram binWidth=50 x 20 bins) is pinned to the
    * maintainers above.
    */
  private[graft] def flagshipScoreFrame(s: SparkSession, base: String,
      corpus: DataFrame): DataFrame = {
    import graft.dedup.Dedup
    val lm = TextOps.scoreWithLm(corpus.select(col("doc_id"), col("text")), s"$base/lm")
      .select(col("doc_id"), col("n_unseen"), col("nll"))
    val dc = Dedup.bloomContaminationAgainst(
        Dedup.wordShingles(corpus, 3),
        s.read.parquet(s"$base/dc/shingles"),
        s.read.parquet(s"$base/dc/words"), k = 4, m = 1 << 20)
      .select(col("doc_id"), col("n_present"), col("contaminated"))
    val pairs = s.read.parquet(s"$base/mh/pairs")
    val dup = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("__dup", lit(true))
    val hist = s.read.parquet(s"$base/hist")
      .select(col("lang"), col("bucket"), col("n").as("len_n"))
    corpus
      .select(col("doc_id"), col("lang"),
        least(greatest(floor(col("n_chars") / 50.0), lit(0.0)), lit(19.0))
          .cast("int").as("bucket"))
      .join(lm, Seq("doc_id"), "left")
      .join(dc, Seq("doc_id"), "left")
      .join(broadcast(dup), Seq("doc_id"), "left")
      .join(broadcast(hist), Seq("lang", "bucket"), "left")
      .select(col("doc_id"),
        coalesce(col("nll"), lit(0.0)).as("nll"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        coalesce(col("n_present"), lit(0L)).as("n_present"),
        coalesce(col("__dup"), lit(false)).as("near_dup"),
        col("len_n"))
      .orderBy("doc_id")
  }

  /** The q163 composed-oracle CTEs (minhash pair mining, bloom decontam
    * replay, streamed-LM replay, per-lang length histogram), shared by the
    * q190 v2 entry which appends the ds_-namespaced DSIR replay after them.
    * No trailing comma.
    */
  private lazy val flagshipOracleCtes: String =
    s"""${OracleCte.triCte},
         |bkt AS (
         |  SELECT doc_id, ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |  FROM documents
         |),
         |tri2 AS (
         |  SELECT doc_id, ${hex60Sql("shingle")} % 2147483647 AS base FROM tri
         |),
         |mh AS (
         |  SELECT doc_id, p.i AS i,
         |         min((((1103515245*(p.i+1) + 12345) % 2147483647 * 2 + 1) % 2147483647 * base
         |              + (p.i+1) * 2654435761 % 2147483647) % 2147483647) AS minh
         |  FROM tri2, unnest(generate_series(0, 15)) AS p(i)
         |  GROUP BY doc_id, p.i
         |),
         |bandkeys AS (
         |  SELECT doc_id, CAST(i // 4 AS INT) AS band,
         |         md5(CAST(i // 4 AS INT)::VARCHAR || ':' || string_agg(minh::VARCHAR, ',' ORDER BY i)) AS band_key
         |  FROM mh GROUP BY doc_id, i // 4
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bandkeys a JOIN bandkeys b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tri GROUP BY 1),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN tri a ON a.doc_id = c.doc_a
         |  JOIN tri b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1,2
         |),
         |mpairs AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |  JOIN sizes sa ON sa.doc_id = c.doc_a
         |  JOIN sizes sb ON sb.doc_id = c.doc_b
         |  WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= 0.8
         |),
         |dupids AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM mpairs
         |    UNION ALL SELECT doc_b AS doc_id FROM mpairs)
         |),
         |b AS (
         |  SELECT t.doc_id, t.shingle, k.bucket
         |  FROM tri t JOIN bkt k ON k.doc_id = t.doc_id
         |),
         |bench AS (SELECT DISTINCT shingle FROM b WHERE bucket >= 80),
         |words AS (
         |  SELECT bit >> 5 AS word_idx,
         |    bit_or(CAST(1 AS BIGINT) << CAST(bit & 31 AS INT)) AS word
         |  FROM (
         |    SELECT ${hex60Sql("s.seed || ':' || bench.shingle")} % 1048576 AS bit
         |    FROM bench CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS seed) s
         |  ) GROUP BY 1
         |),
         |probes AS (
         |  SELECT c.doc_id, c.shingle,
         |    ${hex60Sql("s.seed || ':' || c.shingle")} % 1048576 AS bit
         |  FROM (SELECT DISTINCT doc_id, shingle FROM b WHERE bucket < 80) c
         |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS seed) s
         |),
         |flags AS (
         |  SELECT p.doc_id, p.shingle,
         |    (count(*) FILTER (WHERE
         |      (w.word & (CAST(1 AS BIGINT) << CAST(p.bit & 31 AS INT))) <> 0) = 4) AS might
         |  FROM probes p LEFT JOIN words w ON w.word_idx = p.bit >> 5
         |  GROUP BY 1, 2
         |),
         |pres AS (
         |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_present
         |  FROM flags f JOIN bench bn ON bn.shingle = f.shingle
         |  WHERE f.might GROUP BY 1
         |),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM flags GROUP BY 1
         |),
         |dcv AS (
         |  SELECT a.doc_id,
         |    coalesce(p.n_present, CAST(0 AS BIGINT)) AS n_present,
         |    coalesce(p.n_present, 0) > 0 AS contaminated
         |  FROM agg a LEFT JOIN pres p ON p.doc_id = a.doc_id
         |),
         |lm_base AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
         |),
         |lm_train AS (
         |  SELECT lb.* FROM lm_base lb JOIN bkt k ON k.doc_id = lb.doc_id
         |  WHERE k.bucket < 80
         |),
         |lm_uni AS (
         |  SELECT w[i] AS g, count(*) AS c
         |  FROM lm_train, unnest(generate_series(1, len(w))) AS t(i) GROUP BY 1
         |),
         |lm_bi AS (
         |  SELECT w[i] || ' ' || w[i+1] AS g, count(*) AS c
         |  FROM lm_train, unnest(generate_series(1, len(w)-1)) AS t(i) GROUP BY 1
         |),
         |lm_tri AS (
         |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g, count(*) AS c
         |  FROM lm_train, unnest(generate_series(1, len(w)-2)) AS t(i) GROUP BY 1
         |),
         |lm_corpus AS (
         |  SELECT CAST(coalesce(sum(len(w)), 0) AS BIGINT) AS n_train FROM lm_train
         |),
         |lm_inst AS (
         |  -- scored docs = the bucket < 80 corpus slice = lm_train exactly
         |  -- (the store's internal hex60 80% train gate over ALL delivered
         |  -- docs lands on the same slice)
         |  SELECT doc_id,
         |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tg,
         |    w[i] || ' ' || w[i+1] AS w12,
         |    w[i+1] || ' ' || w[i+2] AS w23,
         |    w[i+1] AS w2, w[i+2] AS w3,
         |    count(*) AS k
         |  FROM lm_train, unnest(generate_series(1, len(w)-2)) AS t(i)
         |  GROUP BY 1, 2, 3, 4, 5, 6
         |),
         |lm_scored AS (
         |  SELECT i.doc_id, i.k, t3.c AS c3,
         |    CASE
         |      WHEN t3.c IS NOT NULL THEN CAST(t3.c AS DOUBLE) / b1.c
         |      WHEN b2.c IS NOT NULL THEN 0.4 * b2.c / u2.c
         |      WHEN u3.c IS NOT NULL THEN 0.16 * u3.c / lm_corpus.n_train
         |    END AS s
         |  FROM lm_inst i
         |  LEFT JOIN lm_tri t3 ON i.tg = t3.g
         |  LEFT JOIN lm_bi b1 ON i.w12 = b1.g
         |  LEFT JOIN lm_bi b2 ON i.w23 = b2.g
         |  LEFT JOIN lm_uni u2 ON i.w2 = u2.g
         |  LEFT JOIN lm_uni u3 ON i.w3 = u3.g
         |  CROSS JOIN lm_corpus
         |),
         |lm_q AS (
         |  SELECT doc_id, k, c3, s,
         |    CASE WHEN s IS NOT NULL
         |         THEN CAST(floor(-ln(s) * 1000000.0 + 0.5) AS BIGINT) END AS nll6
         |  FROM lm_scored
         |),
         |lm_per AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN s IS NULL THEN k ELSE 0 END) AS BIGINT) AS n_unseen,
         |    round(CAST(sum(CASE WHEN s IS NOT NULL THEN k * nll6 ELSE 0 END) AS DOUBLE)
         |      / greatest(sum(CASE WHEN s IS NOT NULL THEN k ELSE 0 END), 1) / 1000000.0, 6) AS nll
         |  FROM lm_q GROUP BY 1
         |),
         |hb AS (
         |  SELECT lang,
         |    CAST(least(greatest(floor(n_chars / 50.0), 0.0), 19.0) AS INT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS len_n
         |  FROM documents GROUP BY 1, 2
         |)""".stripMargin

  /** The flagship final SELECT, parameterized for v2's extra DSIR columns
    * and join.
    */
  private def flagshipSelect(extraCols: String = "", extraJoin: String = ""): String =
    s"""SELECT d.doc_id,
         |  coalesce(p.nll, 0.0) AS nll,
         |  coalesce(p.n_unseen, CAST(0 AS BIGINT)) AS n_unseen,
         |  coalesce(v.contaminated, false) AS contaminated,
         |  coalesce(v.n_present, CAST(0 AS BIGINT)) AS n_present,
         |  (du.doc_id IS NOT NULL) AS near_dup,
         |  hb.len_n AS len_n$extraCols
         |FROM documents d
         |JOIN bkt k ON k.doc_id = d.doc_id AND k.bucket < 80
         |LEFT JOIN lm_per p ON p.doc_id = d.doc_id
         |LEFT JOIN dcv v ON v.doc_id = d.doc_id
         |LEFT JOIN dupids du ON du.doc_id = d.doc_id
         |JOIN hb ON hb.lang = d.lang
         |  AND hb.bucket = CAST(least(greatest(floor(d.n_chars / 50.0), 0.0), 19.0) AS INT)$extraJoin
         |ORDER BY d.doc_id""".stripMargin

  /** The q115 stage CTEs (nw .. packstat), shared verbatim by the q160
    * pipeline-v2 oracle which appends profiler + ridge CTEs after them.
    */
  private lazy val pipelineOracleCtes: String = pipelineOracleCtesOver("documents")

  /** [[pipelineOracleCtes]] parameterized over the corpus relation (the
    * q177 trigramBackoffOracleOver treatment) so the q191 incremental
    * pipeline can re-root the SAME monolithic stage replay at the derived
    * snapshot B. rel = "documents" reproduces the q115/q160/q174/q189
    * text byte-for-byte.
    */
  private def pipelineOracleCtesOver(rel: String): String =
    s"""nw AS (
         |  SELECT doc_id, text, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words
         |  FROM $rel
         |),
         |clean AS (SELECT * FROM nw WHERE n_words >= 3),
         |exact AS (
         |  SELECT doc_id, text, source, n_words FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keep_id
         |    FROM clean)
         |  WHERE doc_id = keep_id
         |),
         |toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM exact),
         |tri AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
         |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
         |),
         |tri2 AS (
         |  SELECT doc_id, ${hex60Sql("shingle")} % 2147483647 AS base FROM tri
         |),
         |mh AS (
         |  SELECT doc_id, p.i AS i,
         |         min((((1103515245*(p.i+1) + 12345) % 2147483647 * 2 + 1) % 2147483647 * base
         |              + (p.i+1) * 2654435761 % 2147483647) % 2147483647) AS minh
         |  FROM tri2, unnest(generate_series(0, 15)) AS p(i)
         |  GROUP BY doc_id, p.i
         |),
         |bandkeys AS (
         |  SELECT doc_id, CAST(i // 4 AS INT) AS band,
         |         md5(CAST(i // 4 AS INT)::VARCHAR || ':' || string_agg(minh::VARCHAR, ',' ORDER BY i)) AS band_key
         |  FROM mh GROUP BY doc_id, i // 4
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bandkeys a JOIN bandkeys b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tri GROUP BY 1),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN tri a ON a.doc_id = c.doc_a
         |  JOIN tri b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1,2
         |),
         |dropped AS (
         |  SELECT DISTINCT c.doc_b AS doc_id
         |  FROM cand c JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |  JOIN sizes sa ON sa.doc_id = c.doc_a
         |  JOIN sizes sb ON sb.doc_id = c.doc_b
         |  WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= 0.8
         |),
         |near AS (
         |  SELECT e.* FROM exact e
         |  WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = e.doc_id)
         |),
         |qf AS (
         |  SELECT near.*,
         |    least(1.0, n_words / 100.0) * (1.0 - abs(
         |      CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE)
         |        / n_words - 0.4)) AS qs
         |  FROM near
         |),
         |qual AS (SELECT * FROM qf WHERE qs >= 0.3),
         |dc AS (SELECT source, count(*) AS nd FROM qual GROUP BY 1),
         |rates AS (
         |  SELECT source, (SELECT min(nd) FROM dc) * 1000000 // nd AS rate_ppm FROM dc
         |),
         |bal AS (
         |  SELECT q.doc_id, q.source, q.n_words
         |  FROM qual q JOIN rates r ON q.source = r.source
         |  WHERE ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm
         |),
         |pc AS (
         |  SELECT doc_id, n_words AS n_tokens,
         |    ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 32 AS shard,
         |    CAST(coalesce(sum(n_words) OVER (
         |      PARTITION BY ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 32 ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
         |  FROM bal
         |),
         |pb AS (SELECT shard, cum_excl // 512 AS bin, n_tokens FROM pc),
         |packstat AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens,
         |         CAST((SELECT count(*) FROM (SELECT DISTINCT shard, bin FROM pb)) AS BIGINT) AS n_bins
         |  FROM pb
         |)""".stripMargin

  /** The full q160 WITH-list ([[pipelineOracleCtes]] + profiler + ridge
    * fit + prediction mass), shared by the q174 pipeline-v3 oracle which
    * appends the classifier/calibration/sampling CTEs after it.
    */
  private lazy val pipelineV2OracleCtes: String = pipelineV2OracleCtesOver("documents")

  /** The q192/q193 per-document matrix CTEs: the monolithic v4 stage
    * CTEs (no ridge — the score stage kills nothing) re-joined back to
    * every raw document, with the corpus-wide classifier calibration
    * (cal3) and DSIR rates (dsrated) attached per doc. `mrow` carries the
    * seven cumulative stage verdicts.
    */
  private lazy val pipelineMatrixCtes: String =
    s"""$pipelineOracleCtes,
       |${DataOracles.logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
       |$pipelineV3OracleMid,
       |${DataOracles.dsirRatedBlock("ds")},
       |mrow AS (
       |  SELECT nw.doc_id, nw.n_words,
       |    nw.n_words >= 3 AS pass_length,
       |    (e.doc_id IS NOT NULL) AS pass_exact,
       |    (n2.doc_id IS NOT NULL) AS pass_near,
       |    (q.doc_id IS NOT NULL) AS pass_quality,
       |    (b.doc_id IS NOT NULL) AS pass_balance,
       |    (b.doc_id IS NOT NULL
       |     AND ${hex60Sql("CAST(nw.doc_id AS VARCHAR)")} % 1000000
       |       < CAST(floor(c.p_cal * 1000000.0) AS BIGINT)) AS pass_classifier,
       |    (b.doc_id IS NOT NULL
       |     AND ${hex60Sql("CAST(nw.doc_id AS VARCHAR)")} % 1000000
       |       < CAST(floor(c.p_cal * 1000000.0) AS BIGINT)
       |     AND ${hex60Sql("CAST(nw.doc_id AS VARCHAR) || ':dsir'")} % 1000000
       |       < r.rate_ppm) AS pass_dsir
       |  FROM nw
       |  LEFT JOIN exact e ON e.doc_id = nw.doc_id
       |  LEFT JOIN near n2 ON n2.doc_id = nw.doc_id
       |  LEFT JOIN qual q ON q.doc_id = nw.doc_id
       |  LEFT JOIN bal b ON b.doc_id = nw.doc_id
       |  JOIN cal3 c ON c.doc_id = nw.doc_id
       |  JOIN dsrated r ON r.doc_id = nw.doc_id
       |)""".stripMargin

  /** [[pipelineV2OracleCtes]] over a caller-chosen corpus relation — the
    * q191 re-rooting. rel = "documents" reproduces the committed
    * q160/q174/q189 oracle text byte-for-byte.
    */
  private def pipelineV2OracleCtesOver(rel: String): String =
    s"""${pipelineOracleCtesOver(rel)},
       |prof AS (
       |  SELECT CAST(count(*) AS BIGINT) AS p1,
       |    CAST(count(DISTINCT doc_id) + count(DISTINCT text) + count(DISTINCT lang)
       |       + count(DISTINCT source) + count(DISTINCT n_chars) AS BIGINT) AS p2,
       |    CAST((count(*) - count(doc_id)) + (count(*) - count(text))
       |       + (count(*) - count(lang)) + (count(*) - count(source))
       |       + (count(*) - count(n_chars)) AS BIGINT) AS p3
       |  FROM $rel
       |),
       |rsrc AS MATERIALIZED (
       |  SELECT dd.doc_id, dd.text, dd.n_chars
       |  FROM $rel dd JOIN bal ON bal.doc_id = dd.doc_id
       |),
       |${DataOracles.ridgeCtes(iters = 30, lr = 0.9, lambda = 0.001, src = "rsrc")},
       |pred AS MATERIALIZED (
       |  SELECT r.doc_id,
       |    my + sy * ((CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
       |      + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
       |      + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0) AS yhat
       |  FROM rz r CROSS JOIN w30 CROSS JOIN rmu CROSS JOIN rsd
       |),
       |scoresum AS (
       |  SELECT CAST(count(*) AS BIGINT) AS s1,
       |    CAST(coalesce(sum(CAST(floor(yhat) AS BIGINT)), 0) AS BIGINT) AS s2
       |  FROM pred
       |)""".stripMargin

  /** The nine q160 stage rows (shared by q174, which appends '9_sample'
    * and the final ORDER BY is supplied by the caller).
    */
  /** The v3 oracle's model CTEs (logit scores -> calibration bins ->
    * per-doc p_cal -> the stage-9 sample row), shared verbatim by the
    * q174 and q189 entries. No leading or trailing comma.
    */
  private lazy val pipelineV3OracleMid: String =
    s"""lp3 AS MATERIALIZED (
       |  SELECT doc_id,
       |    floor((0.5 + 0.5 * tt / (1 + abs(tt))) * 1000000.0 + 0.5) / 1000000.0 AS p, y
       |  FROM (
       |    SELECT lz.doc_id, lz.y,
       |      (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
       |       + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
       |       + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
       |    FROM lz CROSS JOIN v30)
       |),
       |cb3 AS (
       |  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
       |    floor(CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
       |      / 1000000.0 AS p_cal
       |  FROM lp3 GROUP BY 1
       |),
       |cal3 AS (
       |  SELECT s.doc_id, cb3.p_cal
       |  FROM (SELECT doc_id, CAST(least(floor(p * 10), 9) AS INT) AS bin FROM lp3) s
       |  JOIN cb3 USING (bin)
       |),
       |sampv3 AS (
       |  SELECT
       |    CAST(count(CASE WHEN keep = 1 THEN 1 END) AS BIGINT) AS k1,
       |    CAST(coalesce(sum(CASE WHEN keep = 1 THEN n_words END), 0) AS BIGINT) AS k2,
       |    CAST(coalesce(sum(CAST(floor(p_cal * 1000000.0) AS BIGINT)), 0) AS BIGINT) AS k3
       |  FROM (
       |    SELECT b.n_words, c.p_cal,
       |      CASE WHEN ${hex60Sql("CAST(b.doc_id AS VARCHAR)")} % 1000000
       |        < CAST(floor(c.p_cal * 1000000.0) AS BIGINT) THEN 1 ELSE 0 END AS keep
       |    FROM bal b JOIN cal3 c ON c.doc_id = b.doc_id
       |  )
       |)""".stripMargin

  private lazy val pipelineV2StageRows: String =
    """SELECT '0_profile' AS stage, p1 AS n_docs, p2 AS n_tokens, p3 AS n_bins FROM prof
      |UNION ALL SELECT '1_raw', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM nw
      |UNION ALL SELECT '2_clean', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM clean
      |UNION ALL SELECT '3_exact', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM exact
      |UNION ALL SELECT '4_neardup', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM near
      |UNION ALL SELECT '5_quality', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM qual
      |UNION ALL SELECT '6_balance', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM bal
      |UNION ALL SELECT '7_pack', n_docs, n_tokens, n_bins FROM packstat
      |UNION ALL SELECT '8_score', s1, s2, CAST(0 AS BIGINT) FROM scoresum""".stripMargin

  /** DuckDB replay of the trigram Stupid-Backoff scoring — shared by q109
    * (in-memory fit) and q120 (scores from the persisted LM artifact, which
    * must be bit-identical).
    */
  private val trigramBackoffOracle: String = trigramBackoffOracleOver("documents")

  /** The q109 scoring SQL parameterized over the corpus relation, so the
    * delta-maintained-store gate (q177) can re-root the SAME monolithic-fit
    * oracle at the derived snapshot B: the store after retire+append must
    * score exactly like a from-scratch fit over the new corpus.
    * `extraCtes` (comma-terminated) lets callers prepend the snapshot
    * derivation.
    */
  private def trigramBackoffOracleOver(rel: String, extraCtes: String = ""): String =
    s"""WITH ${extraCtes}base AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM $rel
       |),
       |train AS (
       |  SELECT * FROM base WHERE ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 80
       |),
       |uni AS (
       |  SELECT w[i] AS g, count(*) AS c
       |  FROM train, unnest(generate_series(1, len(w))) AS t(i) GROUP BY 1
       |),
       |bi AS (
       |  SELECT w[i] || ' ' || w[i+1] AS g, count(*) AS c
       |  FROM train, unnest(generate_series(1, len(w)-1)) AS t(i) GROUP BY 1
       |),
       |tri AS (
       |  SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g, count(*) AS c
       |  FROM train, unnest(generate_series(1, len(w)-2)) AS t(i) GROUP BY 1
       |),
       |corpus AS (
       |  SELECT CAST(coalesce(sum(len(w)), 0) AS BIGINT) AS n_train FROM train
       |),
       |inst AS (
       |  SELECT doc_id,
       |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tg,
       |    w[i] || ' ' || w[i+1] AS w12,
       |    w[i+1] || ' ' || w[i+2] AS w23,
       |    w[i+1] AS w2, w[i+2] AS w3,
       |    count(*) AS k
       |  FROM base, unnest(generate_series(1, len(w)-2)) AS t(i)
       |  GROUP BY 1, 2, 3, 4, 5, 6
       |),
       |scored AS (
       |  SELECT i.doc_id, i.k, t3.c AS c3,
       |    CASE
       |      WHEN t3.c IS NOT NULL THEN CAST(t3.c AS DOUBLE) / b1.c
       |      WHEN b2.c IS NOT NULL THEN 0.4 * b2.c / u2.c
       |      WHEN u3.c IS NOT NULL THEN 0.16 * u3.c / corpus.n_train
       |    END AS s
       |  FROM inst i
       |  LEFT JOIN tri t3 ON i.tg = t3.g
       |  LEFT JOIN bi b1 ON i.w12 = b1.g
       |  LEFT JOIN bi b2 ON i.w23 = b2.g
       |  LEFT JOIN uni u2 ON i.w2 = u2.g
       |  LEFT JOIN uni u3 ON i.w3 = u3.g
       |  CROSS JOIN corpus
       |),
       |q AS (
       |  SELECT doc_id, k, c3, s,
       |    CASE WHEN s IS NOT NULL
       |         THEN CAST(floor(-ln(s) * 1000000.0 + 0.5) AS BIGINT) END AS nll6
       |  FROM scored
       |),
       |per AS (
       |  SELECT doc_id,
       |    CAST(sum(k) AS BIGINT) AS n_trigrams,
       |    CAST(sum(CASE WHEN c3 IS NULL AND s IS NOT NULL THEN k ELSE 0 END) AS BIGINT) AS n_backoff,
       |    CAST(sum(CASE WHEN s IS NULL THEN k ELSE 0 END) AS BIGINT) AS n_unseen,
       |    round(CAST(sum(CASE WHEN s IS NOT NULL THEN k * nll6 ELSE 0 END) AS DOUBLE)
       |      / greatest(sum(CASE WHEN s IS NOT NULL THEN k ELSE 0 END), 1) / 1000000.0, 6) AS nll
       |  FROM q GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  coalesce(p.n_trigrams, 0) AS n_trigrams,
       |  coalesce(p.n_backoff, 0) AS n_backoff,
       |  coalesce(p.n_unseen, 0) AS n_unseen,
       |  coalesce(p.nll, 0.0) AS nll
       |FROM $rel d LEFT JOIN per p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q105_subword_invariants" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  0 AS concat_viol, 0 AS greedy_viol, 0 AS oov_viol,
        |  0 AS bound_viol, 0 AS unk_viol
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q113_subword_store" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  0 AS vocab_viol, 0 AS tok_viol, 0 AS oov_viol
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q113's row shape re-rooted at the moved corpus (snapshot B)
    "q206_vocab_refresh" ->
      s"""WITH ${DataOracles.snapshotBSql}
         |SELECT doc_id,
         |  len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
         |  0 AS vocab_viol, 0 AS tok_viol, 0 AS oov_viol
         |FROM b ORDER BY doc_id""".stripMargin,
    "q141_unigram_invariants" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  0 AS concat_viol, 0 AS opt_viol, 0 AS oov_viol,
        |  0 AS bound_viol, 0 AS norm_viol
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q142_unigram_store" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  0 AS vocab_viol, 0 AS tok_viol, 0 AS oov_viol
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q116_bpe_invariants" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  0 AS concat_viol, 0 AS fixpoint_viol, 0 AS bound_viol,
        |  0 AS store_viol, 0 AS dup_viol
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The q26 minhash machinery verbatim, re-rooted on the exact-dedup
    // survivors; each stage then reuses the already-green oracle formula of
    // its standalone query (q24/q26/q31/q97/q76).
    "q115_pipeline_e2e" ->
      s"""WITH $pipelineOracleCtes
         |SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(coalesce(sum(n_words), 0) AS BIGINT) AS n_tokens, CAST(0 AS BIGINT) AS n_bins FROM nw
         |UNION ALL SELECT '2_clean', CAST(count(*) AS BIGINT),
         |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM clean
         |UNION ALL SELECT '3_exact', CAST(count(*) AS BIGINT),
         |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM exact
         |UNION ALL SELECT '4_neardup', CAST(count(*) AS BIGINT),
         |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM near
         |UNION ALL SELECT '5_quality', CAST(count(*) AS BIGINT),
         |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM qual
         |UNION ALL SELECT '6_balance', CAST(count(*) AS BIGINT),
         |  CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM bal
         |UNION ALL SELECT '7_pack', n_docs, n_tokens, n_bins FROM packstat
         |ORDER BY stage""".stripMargin,

    // q115's stage CTEs + the profiler replay + the ridge fit (q147's
    // CTEs re-pointed at the balanced survivors) + the prediction mass.
    "q160_pipeline_v2" ->
      s"""WITH $pipelineV2OracleCtes
         |$pipelineV2StageRows
         |ORDER BY stage""".stripMargin,

    // q160's oracle + the full-corpus classifier CTEs (q164's 30-round GD
    // replay), the calibration-bin join (q169's), and the hex60 sampling
    // gate under floor(p_cal*1e6) applied to the balanced survivors
    // (q170's) — one more stage row carries the kept docs/tokens and the
    // exact integer expected-mass audit.
    "q174_pipeline_v3" ->
      s"""WITH $pipelineV2OracleCtes,
         |${DataOracles.logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
         |$pipelineV3OracleMid
         |$pipelineV2StageRows
         |UNION ALL SELECT '9_sample', k1, k2, k3 FROM sampv3
         |ORDER BY stage""".stripMargin,

    // v4 = v3 + the DSIR stage: the ds_-namespaced model CTEs replay the
    // corpus-wide en-target fit, s9 re-derives the stage-9 survivors, and
    // the salted (':dsir') hex60 draw gates them through rate_ppm
    "q189_pipeline_v4" ->
      s"""WITH $pipelineV2OracleCtes,
         |${DataOracles.logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
         |$pipelineV3OracleMid,
         |s9 AS (
         |  SELECT b.doc_id, b.n_words
         |  FROM bal b JOIN cal3 c ON c.doc_id = b.doc_id
         |  WHERE ${hex60Sql("CAST(b.doc_id AS VARCHAR)")} % 1000000
         |    < CAST(floor(c.p_cal * 1000000.0) AS BIGINT)
         |),
         |${DataOracles.dsirRatedBlock("ds")},
         |dsirv4 AS (
         |  SELECT
         |    CAST(count(CASE WHEN keep = 1 THEN 1 END) AS BIGINT) AS x1,
         |    CAST(coalesce(sum(CASE WHEN keep = 1 THEN n_words END), 0) AS BIGINT) AS x2,
         |    CAST(coalesce(sum(rate_ppm), 0) AS BIGINT) AS x3
         |  FROM (
         |    SELECT s9.n_words, r.rate_ppm,
         |      CASE WHEN ${hex60Sql("CAST(s9.doc_id AS VARCHAR) || ':dsir'")} % 1000000
         |        < r.rate_ppm THEN 1 ELSE 0 END AS keep
         |    FROM s9 JOIN dsrated r ON r.doc_id = s9.doc_id
         |  )
         |)
         |$pipelineV2StageRows
         |UNION ALL SELECT '9_sample', k1, k2, k3 FROM sampv3
         |UNION ALL SELECT 'a_dsir', x1, x2, x3 FROM dsirv4
         |ORDER BY stage""".stripMargin,

    // the MONOLITHIC v4 replay re-rooted at the derived snapshot B — the
    // incremental cycle (feature-store reuse + minhash/DSIR store
    // maintenance) must be indistinguishable from recomputing everything
    // from scratch over the moved corpus
    // one row per family, every family recomputed FROM SCRATCH over the
    // snapshot-B CTE — the warehouse cycle's convergence proof (the lm and
    // cms families ride as WITH-subqueries so their oracle text stays the
    // single source the standalone gates q109/q177/q89/q198 already use)
    "q207_warehouse_cycle" ->
      s"""WITH ${DataOracles.snapshotBFullSql},
         |${pipelineOracleCtesOver("bsnap")},
         |${DataOracles.dsirRatedBlock("ds", src = "bsnap")},
         |${DataOracles.psiCtesOver("documents", "bsnap", "dr")}
         |SELECT family, m1, m2, m3 FROM (
         |  SELECT '1_feat' AS family, CAST(count(*) AS BIGINT) AS m1,
         |    CAST(coalesce(sum(n_words), 0) AS BIGINT) AS m2,
         |    CAST(0 AS BIGINT) AS m3 FROM nw
         |  UNION ALL SELECT '2_exact', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM exact
         |  UNION ALL SELECT '3_near', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM near
         |  UNION ALL SELECT '4_lm', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_backoff), 0) AS BIGINT),
         |    CAST(coalesce(sum(n_unseen), 0) AS BIGINT)
         |  FROM (${trigramBackoffOracleOver("bsnap")}) lmq
         |  UNION ALL SELECT '5_cms', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(est), 0) AS BIGINT),
         |    CAST(coalesce(sum(cnt), 0) AS BIGINT)
         |  FROM (${SketchQueries.cmsOracleOver("1=1", src = "bsnap")}) cmsq
         |  UNION ALL SELECT '6_dsir', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(dsir6), 0) AS BIGINT),
         |    CAST(coalesce(sum(rate_ppm), 0) AS BIGINT) FROM dsrated
         |  UNION ALL SELECT '7_vocab', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(len(string_split_regex(trim(lower(text)), '\\s+'))), 0)
         |      AS BIGINT),
         |    CAST(0 AS BIGINT) FROM bsnap
         |  UNION ALL SELECT '8_drift', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_b), 0) AS BIGINT),
         |    CAST(coalesce(sum(CAST(floor(psi * 1000000.0 + 0.5) AS BIGINT)), 0)
         |      AS BIGINT) FROM drrep
         |) ORDER BY family""".stripMargin,

    // q207's oracle extended by the two r15 store families, each
    // recomputed from scratch: '9_pack' aggregates the chunk-pack ledger
    // of snapshot B (q224's oracle as a subquery — the inner bsnap
    // shadows the outer, same text), 'a_daily' aggregates the day-pair
    // drift monitor over raw events (q220's oracle as a subquery).
    "q230_warehouse_cycle10" ->
      s"""WITH ${DataOracles.snapshotBFullSql},
         |${pipelineOracleCtesOver("bsnap")},
         |${DataOracles.dsirRatedBlock("ds", src = "bsnap")},
         |${DataOracles.psiCtesOver("documents", "bsnap", "dr")}
         |SELECT family, m1, m2, m3 FROM (
         |  SELECT '1_feat' AS family, CAST(count(*) AS BIGINT) AS m1,
         |    CAST(coalesce(sum(n_words), 0) AS BIGINT) AS m2,
         |    CAST(0 AS BIGINT) AS m3 FROM nw
         |  UNION ALL SELECT '2_exact', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM exact
         |  UNION ALL SELECT '3_near', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_words), 0) AS BIGINT), CAST(0 AS BIGINT) FROM near
         |  UNION ALL SELECT '4_lm', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_backoff), 0) AS BIGINT),
         |    CAST(coalesce(sum(n_unseen), 0) AS BIGINT)
         |  FROM (${trigramBackoffOracleOver("bsnap")}) lmq
         |  UNION ALL SELECT '5_cms', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(est), 0) AS BIGINT),
         |    CAST(coalesce(sum(cnt), 0) AS BIGINT)
         |  FROM (${SketchQueries.cmsOracleOver("1=1", src = "bsnap")}) cmsq
         |  UNION ALL SELECT '6_dsir', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(dsir6), 0) AS BIGINT),
         |    CAST(coalesce(sum(rate_ppm), 0) AS BIGINT) FROM dsrated
         |  UNION ALL SELECT '7_vocab', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(len(string_split_regex(trim(lower(text)), '\\s+'))), 0)
         |      AS BIGINT),
         |    CAST(0 AS BIGINT) FROM bsnap
         |  UNION ALL SELECT '8_drift', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_b), 0) AS BIGINT),
         |    CAST(coalesce(sum(CAST(floor(psi * 1000000.0 + 0.5) AS BIGINT)), 0)
         |      AS BIGINT) FROM drrep
         |  UNION ALL SELECT '9_pack', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
         |    CAST(coalesce(bit_xor(checksum), 0) AS BIGINT)
         |  FROM (${DataOracles.chunkExportLedgerSql("bsnap")}) pk
         |  UNION ALL SELECT 'a_daily', CAST(count(*) AS BIGINT),
         |    CAST(coalesce(sum(n_b), 0) AS BIGINT),
         |    CAST(coalesce(sum(CAST(floor(psi * 1000000.0 + 0.5) AS BIGINT)), 0)
         |      AS BIGINT)
         |  FROM (${DataOracles.dailyDriftSql}) dd
         |) ORDER BY family""".stripMargin,

    "q191_pipeline_v4_incremental" ->
      s"""WITH ${DataOracles.snapshotBFullSql},
         |${pipelineV2OracleCtesOver("bsnap")},
         |${DataOracles.logitCtes(iters = 30, lr = 0.5, lambda = 0.001, src = "bsnap")},
         |$pipelineV3OracleMid,
         |s9 AS (
         |  SELECT b.doc_id, b.n_words
         |  FROM bal b JOIN cal3 c ON c.doc_id = b.doc_id
         |  WHERE ${hex60Sql("CAST(b.doc_id AS VARCHAR)")} % 1000000
         |    < CAST(floor(c.p_cal * 1000000.0) AS BIGINT)
         |),
         |${DataOracles.dsirRatedBlock("ds", src = "bsnap")},
         |dsirv4 AS (
         |  SELECT
         |    CAST(count(CASE WHEN keep = 1 THEN 1 END) AS BIGINT) AS x1,
         |    CAST(coalesce(sum(CASE WHEN keep = 1 THEN n_words END), 0) AS BIGINT) AS x2,
         |    CAST(coalesce(sum(rate_ppm), 0) AS BIGINT) AS x3
         |  FROM (
         |    SELECT s9.n_words, r.rate_ppm,
         |      CASE WHEN ${hex60Sql("CAST(s9.doc_id AS VARCHAR) || ':dsir'")} % 1000000
         |        < r.rate_ppm THEN 1 ELSE 0 END AS keep
         |    FROM s9 JOIN dsrated r ON r.doc_id = s9.doc_id
         |  )
         |)
         |$pipelineV2StageRows
         |UNION ALL SELECT '9_sample', k1, k2, k3 FROM sampv3
         |UNION ALL SELECT 'a_dsir', x1, x2, x3 FROM dsirv4
         |ORDER BY stage""".stripMargin,

    // the monolithic v4 replay re-rooted at the TWICE-derived snapshot C:
    // the stores carried through two delta cycles must be
    // indistinguishable from a from-scratch recompute over the end state
    "q196_pipeline_v4_cycle2" ->
      s"""WITH ${DataOracles.snapshotBFullSql},
         |${DataOracles.snapshotCFullSql},
         |${pipelineV2OracleCtesOver("csnap")},
         |${DataOracles.logitCtes(iters = 30, lr = 0.5, lambda = 0.001, src = "csnap")},
         |$pipelineV3OracleMid,
         |s9 AS (
         |  SELECT b.doc_id, b.n_words
         |  FROM bal b JOIN cal3 c ON c.doc_id = b.doc_id
         |  WHERE ${hex60Sql("CAST(b.doc_id AS VARCHAR)")} % 1000000
         |    < CAST(floor(c.p_cal * 1000000.0) AS BIGINT)
         |),
         |${DataOracles.dsirRatedBlock("ds", src = "csnap")},
         |dsirv4 AS (
         |  SELECT
         |    CAST(count(CASE WHEN keep = 1 THEN 1 END) AS BIGINT) AS x1,
         |    CAST(coalesce(sum(CASE WHEN keep = 1 THEN n_words END), 0) AS BIGINT) AS x2,
         |    CAST(coalesce(sum(rate_ppm), 0) AS BIGINT) AS x3
         |  FROM (
         |    SELECT s9.n_words, r.rate_ppm,
         |      CASE WHEN ${hex60Sql("CAST(s9.doc_id AS VARCHAR) || ':dsir'")} % 1000000
         |        < r.rate_ppm THEN 1 ELSE 0 END AS keep
         |    FROM s9 JOIN dsrated r ON r.doc_id = s9.doc_id
         |  )
         |)
         |$pipelineV2StageRows
         |UNION ALL SELECT '9_sample', k1, k2, k3 FROM sampv3
         |UNION ALL SELECT 'a_dsir', x1, x2, x3 FROM dsirv4
         |ORDER BY stage""".stripMargin,

    // per-doc replay of the monolithic stage CTEs, left-joined back to
    // every raw document, with the corpus-wide classifier + DSIR models
    // supplying a p_cal / rate_ppm for EVERY doc (kills charged exactly
    // even for docs dead upstream)
    "q192_pipeline_kill_matrix" ->
      s"""WITH $pipelineMatrixCtes
         |SELECT doc_id, n_words, pass_length, pass_exact, pass_near,
         |  pass_quality, pass_balance, pass_classifier, pass_dsir,
         |  CASE WHEN NOT pass_length THEN 'length'
         |       WHEN NOT pass_exact THEN 'exact_dup'
         |       WHEN NOT pass_near THEN 'near_dup'
         |       WHEN NOT pass_quality THEN 'quality'
         |       WHEN NOT pass_balance THEN 'balance'
         |       WHEN NOT pass_classifier THEN 'classifier'
         |       WHEN NOT pass_dsir THEN 'dsir'
         |       ELSE 'none' END AS first_fail,
         |  pass_dsir AS kept
         |FROM mrow ORDER BY doc_id""".stripMargin,

    // the funnel over the same matrix: each n_out is q189's matching
    // stage count, the last is the v4 training-set size
    "q193_pipeline_funnel" ->
      s"""WITH $pipelineMatrixCtes,
         |f AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(count(CASE WHEN pass_length THEN 1 END) AS BIGINT) AS n1,
         |    CAST(count(CASE WHEN pass_exact THEN 1 END) AS BIGINT) AS n2,
         |    CAST(count(CASE WHEN pass_near THEN 1 END) AS BIGINT) AS n3,
         |    CAST(count(CASE WHEN pass_quality THEN 1 END) AS BIGINT) AS n4,
         |    CAST(count(CASE WHEN pass_balance THEN 1 END) AS BIGINT) AS n5,
         |    CAST(count(CASE WHEN pass_classifier THEN 1 END) AS BIGINT) AS n6,
         |    CAST(count(CASE WHEN pass_dsir THEN 1 END) AS BIGINT) AS n7
         |  FROM mrow
         |)
         |SELECT '1_length' AS stage, n0 AS n_in, n0 - n1 AS n_killed, n1 AS n_out FROM f
         |UNION ALL SELECT '2_exact_dup', n1, n1 - n2, n2 FROM f
         |UNION ALL SELECT '3_near_dup', n2, n2 - n3, n3 FROM f
         |UNION ALL SELECT '4_quality', n3, n3 - n4, n4 FROM f
         |UNION ALL SELECT '5_balance', n4, n4 - n5, n5 FROM f
         |UNION ALL SELECT '6_classifier', n5, n5 - n6, n6 FROM f
         |UNION ALL SELECT '7_dsir', n6, n6 - n7, n7 FROM f
         |ORDER BY stage""".stripMargin,

    "q109_trigram_backoff" -> trigramBackoffOracle,
    // the monolithic-fit oracle re-rooted at snapshot B: the incrementally
    // retired+appended store must be indistinguishable from a rebuild
    "q177_lm_delta_maintenance" ->
      trigramBackoffOracleOver("b", DataOracles.snapshotBSql + ",\n"),
    // The stored-LM scores must hash-match the in-memory fit — q109's
    // oracle verbatim.
    "q120_trigram_lm_store" -> trigramBackoffOracle,
    // Counts are additive: the batched-then-compacted store must score
    // exactly like the monolithic fit — q109's oracle verbatim.
    "q126_trigram_lm_lifecycle" -> trigramBackoffOracle,
    "q130_trigram_lm_streamed" -> trigramBackoffOracle,
    "q95_unigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |vc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |corpus AS (SELECT CAST(sum(cf) AS BIGINT) AS n_tokens, count(*) AS v_size FROM vc),
        |scored AS (
        |  SELECT t.doc_id, t.tf,
        |    CAST(floor(-ln((v.cf + 1.0) / (c.n_tokens + c.v_size)) * 1000000.0 + 0.5) AS BIGINT) AS nll6
        |  FROM tf t JOIN vc v USING (term) CROSS JOIN corpus c
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_tokens,
        |  round(CAST(sum(tf * nll6) AS DOUBLE) / sum(tf) / 1000000.0, 6) AS nll
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    "q96_dup_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |),
        |inst AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
        |),
        |dfx AS (
        |  SELECT shingle, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, shingle FROM inst) GROUP BY 1
        |),
        |per AS (
        |  SELECT i.doc_id, count(*) AS n_shingles,
        |         CAST(sum(CASE WHEN x.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM inst i JOIN dfx x USING (shingle) GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  coalesce(p.n_shingles, 0) AS n_shingles,
        |  coalesce(p.n_dup, 0) AS n_dup,
        |  coalesce(round(CAST(p.n_dup AS DOUBLE) / p.n_shingles, 6), 0.0) AS dup_frac
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q97_domain_rebalance" ->
      s"""WITH counts AS (
         |  SELECT source AS domain, count(*) AS n_docs FROM documents GROUP BY 1
         |),
         |rates AS (
         |  SELECT domain, n_docs,
         |         (SELECT min(n_docs) FROM counts) * 1000000 // n_docs AS rate_ppm
         |  FROM counts
         |),
         |gated AS (
         |  SELECT d.source AS domain, r.n_docs, r.rate_ppm,
         |         CASE WHEN ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 1000000 < r.rate_ppm
         |              THEN 1 ELSE 0 END AS kept
         |  FROM documents d JOIN rates r ON d.source = r.domain
         |)
         |SELECT domain, n_docs, rate_ppm, CAST(sum(kept) AS BIGINT) AS n_kept
         |FROM gated GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q98_length_trim" ->
      """WITH lens AS (
        |  SELECT doc_id, lang AS grp,
        |         len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |  FROM documents
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY n_tokens, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY grp) AS n
        |  FROM lens
        |),
        |k AS (
        |  SELECT *, (rk > floor(0.05 * n) AND rk <= floor(0.95 * n)) AS kept FROM ranked
        |)
        |SELECT grp, max(n) AS n_docs,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  min(CASE WHEN kept THEN n_tokens END) AS min_kept_tokens,
        |  max(CASE WHEN kept THEN n_tokens END) AS max_kept_tokens,
        |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "q99_semantic_dedup" ->
      s"""${DataOracles.kmeansAsgCtes(numCentroids = 8, iters = 3)},
         |pairs AS (
         |  SELECT q.vec_id, c.vec_id AS nid,
         |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
         |  FROM asg3 q JOIN asg3 c ON q.cell = c.cell AND q.vec_id <> c.vec_id
         |),
         |dups AS (
         |  SELECT vec_id, count(*) AS n_dups, min(nid) AS min_dup_id
         |  FROM pairs WHERE sim >= 0.4 GROUP BY 1
         |)
         |SELECT a.vec_id, a.cell,
         |  CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
         |  coalesce(d.min_dup_id, a.vec_id + 1) > a.vec_id AS kept
         |FROM asg3 a LEFT JOIN dups d USING (vec_id)
         |ORDER BY a.vec_id""".stripMargin,
    "q100_doc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |),
        |base AS (SELECT doc_id, w, len(w) AS n_tokens FROM toks),
        |chunks AS (
        |  SELECT doc_id, i AS chunk_id, i * 28 AS start_tok,
        |         w[i*28+1 : i*28+32] AS ctoks
        |  FROM base,
        |       unnest(generate_series(0, (greatest(n_tokens - 4, 1) + 27) // 28 - 1)) AS t(i)
        |)
        |SELECT doc_id, chunk_id, start_tok,
        |  CAST(len(ctoks) AS BIGINT) AS chunk_tokens,
        |  md5(array_to_string(ctoks, ' ')) AS chunk_md5
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    "q104_chunk_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |),
        |base AS (SELECT doc_id, w, len(w) AS n_tokens FROM toks),
        |chunks AS (
        |  SELECT doc_id, i * 28 AS start_tok,
        |         md5(array_to_string(w[i*28+1 : i*28+32], ' ')) AS chunk_md5
        |  FROM base,
        |       unnest(generate_series(0, (greatest(n_tokens - 4, 1) + 27) // 28 - 1)) AS t(i)
        |),
        |g AS (
        |  SELECT chunk_md5, count(*) AS n_occurrences,
        |         count(DISTINCT doc_id) AS n_docs,
        |         min(doc_id * 1048576 + start_tok) AS k
        |  FROM chunks GROUP BY 1
        |)
        |SELECT chunk_md5, n_occurrences, n_docs,
        |  k // 1048576 AS keep_doc, k % 1048576 AS keep_start
        |FROM g WHERE n_docs >= 2 ORDER BY chunk_md5""".stripMargin,
    "q101_bigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
        |),
        |inst AS (
        |  SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bg
        |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
        |),
        |tf AS (SELECT doc_id, w1, bg, count(*) AS tf FROM inst GROUP BY 1, 2, 3),
        |cf2 AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS cf2 FROM tf GROUP BY 1),
        |cf1 AS (SELECT w1, CAST(sum(tf) AS BIGINT) AS cf1 FROM tf GROUP BY 1),
        |vocab AS (
        |  SELECT count(DISTINCT t) AS v_size
        |  FROM (SELECT unnest(w) AS t FROM toks)
        |),
        |scored AS (
        |  SELECT t.doc_id, t.tf,
        |    CAST(floor(-ln((c2.cf2 + 1.0) / (c1.cf1 + v.v_size)) * 1000000.0 + 0.5) AS BIGINT) AS nll6
        |  FROM tf t JOIN cf2 c2 USING (bg) JOIN cf1 c1 USING (w1) CROSS JOIN vocab v
        |),
        |per AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |    round(CAST(sum(tf * nll6) AS DOUBLE) / sum(tf) / 1000000.0, 6) AS nll
        |  FROM scored GROUP BY 1
        |)
        |SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
        |  coalesce(p.nll, 0.0) AS nll
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q102_quality_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_words,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS stop_cnt
         |  FROM documents
         |),
         |q AS (
         |  SELECT doc_id,
         |    least(1.0, n_words / 100.0) * (1.0 - abs(CAST(stop_cnt AS DOUBLE) / n_words - 0.4)) AS qs
         |  FROM f
         |),
         |m AS (SELECT max(qs) AS q_max FROM q)
         |SELECT doc_id, round(qs, 6) AS quality_score,
         |  CAST(floor(exp((qs - m.q_max) / 0.25) * 1000000.0 + 0.5) AS BIGINT) AS rate_ppm,
         |  ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 1000000
         |    < CAST(floor(exp((qs - m.q_max) / 0.25) * 1000000.0 + 0.5) AS BIGINT) AS kept
         |FROM q CROSS JOIN m
         |ORDER BY doc_id""".stripMargin,
    "q128_span_removal" -> spanRemovalSql(5),
    "q129_span_removal_wide" -> spanRemovalSql(20),

    // The streaming-flagship oracle: the MONOLITHIC batch pipeline over the
    // same splits — q26's minhash pair mine (verbatim, over all docs),
    // q118's bloom decontamination (verbatim), q109's trigram backoff
    // scoring (verbatim, lm_-prefixed to dodge the shared tri/toks CTE
    // names), and the (lang, 50-char-bucket) histogram — joined per corpus
    // document. The stream side must be indistinguishable.
    "q163_streaming_flagship" ->
      s"""WITH $flagshipOracleCtes
         |${flagshipSelect()}""".stripMargin,
    // five concurrent maintainers, one hash: q163's monolith + the
    // ds_-namespaced DSIR replay joined per doc
    "q190_streaming_flagship_v2" ->
      s"""WITH $flagshipOracleCtes,
         |${DataOracles.dsirRatedBlock("ds")}
         |${flagshipSelect(
             extraCols = ",\n  r.dsir6 AS dsir6,\n  r.rate_ppm AS rate_ppm",
             extraJoin = "\nJOIN dsrated r ON r.doc_id = d.doc_id")}""".stripMargin,

    // six concurrent maintainers, one hash: q190's monolith + the
    // chunk→pack chain served at DOCUMENT grain (pkdoc/pkfirst) — the
    // stream-grown export store must place every unit exactly where the
    // monolithic pack over the full corpus does
    "q235_streaming_flagship_v3" ->
      s"""WITH $flagshipOracleCtes,
         |${DataOracles.dsirRatedBlock("ds")},
         |${DataOracles.packPlacementBlock}
         |${flagshipSelect(
             extraCols = ",\n  r.dsir6 AS dsir6,\n  r.rate_ppm AS rate_ppm," +
               "\n  pd.n_units AS n_units,\n  pd.tok_packed AS tok_packed," +
               "\n  pf.first_shard AS first_shard,\n  pf.first_bin AS first_bin," +
               "\n  pd.pack_sum AS pack_sum",
             extraJoin = "\nJOIN dsrated r ON r.doc_id = d.doc_id" +
               "\nJOIN pkdoc pd ON pd.doc_id = d.doc_id" +
               "\nJOIN pkfirst pf ON pf.doc_id = d.doc_id")}""".stripMargin
  )

  /** Span-removal oracle, parameterized on the span length — the same
    * gram/dup/coverage pipeline as [[TextOps.removeDuplicatedSpans]]
    * expressed in DuckDB SQL (list slice `w[i:i+span-1]` is 1-based
    * inclusive, so it yields exactly `span` tokens).
    */
  private def spanRemovalSql(span: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
       |),
       |inst AS (
       |  SELECT doc_id, i - 1 AS start,
       |         array_to_string(w[i:i+${span - 1}], ' ') AS gram
       |  FROM toks, unnest(generate_series(1, len(w) - ${span - 1})) AS t(i)
       |),
       |dup AS (
       |  SELECT gram FROM (SELECT gram, count(*) AS occ FROM inst GROUP BY 1) WHERE occ >= 2
       |),
       |starts AS (
       |  SELECT i.doc_id, i.start FROM inst i JOIN dup USING (gram)
       |),
       |pos AS (
       |  SELECT doc_id, i - 1 AS pos, w[i] AS word
       |  FROM toks, unnest(generate_series(1, len(w))) AS t(i)
       |),
       |cov AS (
       |  SELECT p.doc_id, p.pos, p.word,
       |         max(CASE WHEN s.start IS NOT NULL THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY p.doc_id ORDER BY p.pos
       |                 ROWS BETWEEN ${span - 1} PRECEDING AND CURRENT ROW) AS c
       |  FROM pos p LEFT JOIN starts s ON p.doc_id = s.doc_id AND p.pos = s.start
       |)
       |SELECT doc_id, count(*) AS n_words, CAST(sum(c) AS BIGINT) AS n_removed,
       |  coalesce(string_agg(CASE WHEN c = 0 THEN word END, ' ' ORDER BY pos), '') AS clean_text,
       |  coalesce(string_agg(CASE WHEN c = 0 THEN CAST(pos AS VARCHAR) END, ',' ORDER BY pos), '') AS kept_offsets
       |FROM cov GROUP BY 1 ORDER BY 1""".stripMargin
}
