package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot distribution drift: the Population Stability Index
  * (PSI) per feature between two crawls of the same corpus — the monitor a
  * training pipeline runs BEFORE retraining on a new snapshot, so a sudden
  * shift in language mix / source mix / length profile is a report row, not
  * a silent model regression three stages later.
  *
  * The reference has no distribution monitor (its quality surface stops at
  * ingest row warnings, `backend/app/services/ingest.py:82` — SURVEY.md §2.1
  * C6); PSI is the standard population-shift metric (Karakoulas 2004 credit
  * scoring practice; widely republished) and the natural drift layer over
  * [[Profile]]'s single-snapshot statistics.
  *
  *   PSI(f) = Σ_buckets (pB − pA) · ln(pB / pA)
  *
  * with add-one smoothing over the UNION of observed buckets (pX =
  * (cX+1)/(NX+K)), so a bucket present in one snapshot only contributes a
  * finite term instead of ±∞. Verdicts use the conventional thresholds:
  * < 0.1 stable, < 0.2 moderate, else drifted.
  *
  * Exactness discipline (the q95/q101 micro-nat convention): the only
  * transcendental, ln(pB/pA), is computed on a double ratio derived from
  * integer counts by the IDENTICAL op sequence in both engines and
  * quantized to an integer micro-nat; the (pB − pA) factor is carried as
  * the exact integer numerator (cB+1)(NA+K) − (cA+1)(NB+K) in 128-bit
  * arithmetic (decimal(38,0) here, HUGEINT in the oracle), so the per-
  * feature sum is an order-free integer sum and the final PSI is one
  * double division — bit-identical across engines.
  *
  * Scale shape: one projection per input row explodes the m features into
  * (feature, bucket) pairs map-side (`explode(map(...))`, a generator — no
  * shuffle), then ONE hash aggregate over (feature, bucket) keys — partial
  * map-side combine means the shuffle carries at most m × |buckets| rows
  * per task, not m × N. Everything after the aggregate operates on the
  * m × K report frame (tiny at any corpus size: the totals re-aggregate
  * and the broadcast join never touch the corpus again). No driver state,
  * no collect.
  */
object Drift {

  /** Per-feature PSI between snapshots `a` and `b`.
    *
    * `features` maps a report name to its bucket expression (any type —
    * cast to string internally; nulls become the reserved `" null"`
    * bucket — space-prefixed, unreachable from any trimmed categorical —
    * so they are compared as a population of their own). Numeric
    * features should be pre-bucketed by the caller (e.g.
    * `floor(col("n_chars") / 50)`) — PSI is defined over discrete bins.
    *
    * Output: (feature, n_buckets, n_a, n_b, psi, verdict), one row per
    * feature, psi quantized at 1e-6.
    */
  def psiReport(a: DataFrame, b: DataFrame,
                features: Seq[(String, Column)]): DataFrame =
    psiFromCounts(bucketCounts(a, features), bucketCounts(b, features))

  /** One snapshot's per-(feature, bucket) population — the additive half
    * of the monitor (counts are longs, so disjoint batches sum exactly;
    * the store below rests on that). One map-side explode + one hash
    * aggregate with partial combine: the shuffle carries at most
    * m × |buckets| rows per task, never m × N.
    */
  def bucketCounts(df: DataFrame, features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(features.map(_._1).distinct.size == features.size,
      "feature names must be distinct")
    val pairs = features.flatMap { case (n, c) =>
      Seq(lit(n), coalesce(c.cast("string"), lit(" null")))
    }
    df.select(explode(map(pairs: _*)).as(Seq("feature", "bucket")))
      .groupBy("feature", "bucket").agg(count(lit(1)).as("c"))
  }

  /** The PSI arithmetic over two [[bucketCounts]] frames — shared verbatim
    * by the in-memory report and the store-served one ([[psiFromStore]]),
    * so they can never skew. Inputs are count-frame-sized (m × K rows);
    * everything below the join is cheap at any corpus size.
    */
  def psiFromCounts(ac: DataFrame, bc: DataFrame): DataFrame = {
    val counts = ac.select(col("feature"), col("bucket"), col("c").as("ca"))
      .join(bc.select(col("feature"), col("bucket"), col("c").as("cb")),
        Seq("feature", "bucket"), "full_outer")
      .select(col("feature"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))

    // per-feature totals re-derive from the already-aggregated report frame
    // (every row lands in exactly one bucket per feature, so NA = Σ ca) —
    // no second corpus scan, and the join back is a broadcast of m rows
    val tot = counts.groupBy("feature")
      .agg(count(lit(1)).as("k"), sum("ca").as("na"), sum("cb").as("nb"))

    val dec = "decimal(38,0)"
    val terms = counts.join(broadcast(tot), Seq("feature"))
      .withColumn("dnum",
        (col("cb") + lit(1L)).cast(dec) * (col("na") + col("k")).cast(dec)
          - (col("ca") + lit(1L)).cast(dec) * (col("nb") + col("k")).cast(dec))
      .withColumn("l6",
        floor(log(((col("cb") + lit(1.0)) * (col("na") + col("k")))
            / ((col("ca") + lit(1.0)) * (col("nb") + col("k")))) * 1e6 + 0.5)
          .cast("long"))

    // dnum and l6 always share a sign ((pB−pA) and ln(pB/pA) do), so every
    // product is ≥ 0 and the floor(x+0.5) quantization below never straddles
    // a negative boundary
    terms.groupBy("feature")
      .agg(first("k").as("n_buckets"), first("na").as("n_a"),
           first("nb").as("n_b"),
           sum(col("dnum") * col("l6").cast(dec)).as("s"))
      // s is PSI in micro-units times the smoothed denominators, so one
      // double division + floor lands the 1e-6-quantized PSI directly
      .withColumn("psi",
        floor(col("s").cast("double")
            / ((col("n_a") + col("n_buckets")).cast("double")
               * (col("n_b") + col("n_buckets")).cast("double")) + 0.5) / 1e6)
      .select(col("feature"), col("n_buckets"), col("n_a"), col("n_b"),
        col("psi"),
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.2, "moderate")
          .otherwise("drifted").as("verdict"))
  }

  /** The report's drill-down: per-(feature, bucket) populations and the
    * bucket's own PSI contribution (`psi_part`, quantized at 1e-6 by the
    * report's exact arithmetic) — the row an operator acts on: WHICH
    * language/source/length band moved, and by how much of the feature's
    * PSI. Same count-frame-sized math as [[psiFromCounts]], just not
    * summed over buckets.
    */
  def psiContributions(a: DataFrame, b: DataFrame,
                       features: Seq[(String, Column)]): DataFrame = {
    val counts = bucketCounts(a, features)
      .select(col("feature"), col("bucket"), col("c").as("ca"))
      .join(bucketCounts(b, features)
          .select(col("feature"), col("bucket"), col("c").as("cb")),
        Seq("feature", "bucket"), "full_outer")
      .select(col("feature"), col("bucket"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = counts.groupBy("feature")
      .agg(count(lit(1)).as("k"), sum("ca").as("na"), sum("cb").as("nb"))
    val dec = "decimal(38,0)"
    counts.join(broadcast(tot), Seq("feature"))
      .withColumn("dnum",
        (col("cb") + lit(1L)).cast(dec) * (col("na") + col("k")).cast(dec)
          - (col("ca") + lit(1L)).cast(dec) * (col("nb") + col("k")).cast(dec))
      .withColumn("l6",
        floor(log(((col("cb") + lit(1.0)) * (col("na") + col("k")))
            / ((col("ca") + lit(1.0)) * (col("nb") + col("k")))) * 1e6 + 0.5)
          .cast("long"))
      .select(col("feature"), col("bucket"), col("ca"), col("cb"),
        (floor((col("dnum") * col("l6").cast(dec)).cast("double")
            / ((col("na") + col("k")).cast("double")
               * (col("nb") + col("k")).cast("double")) + 0.5) / 1e6).as("psi_part"))
  }

  // ---------------------------------------------------------------------
  // The drift STORE: the monitor as a maintained artifact. `base/batch=0`
  // freezes the reference snapshot's bucket counts; `cur/batch=<id>` grows
  // the live snapshot's counts by ledgered additive deltas (retire =
  // negated counts, the retireLm pattern — bucket populations are longs,
  // so disjoint batches sum exactly and the served report equals the
  // monolithic psiReport over the same pair of snapshots). Exactly-once
  // via the directory-existence ledger; single-maintainer via
  // MaintenanceLock; compaction merges batches behind the .prev swap.
  // ---------------------------------------------------------------------

  private def fsOf(df: DataFrame, path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      df.sparkSession.sparkContext.hadoopConfiguration)

  /** Build semantics (replaces the whole store): freeze `a`'s bucket
    * counts as the baseline AND as the live counts' initial batch — the
    * live snapshot IS the baseline until deltas arrive.
    */
  def buildDriftStore(a: DataFrame, features: Seq[(String, Column)],
                      path: String): Unit = {
    val fs = fsOf(a, path)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    // materialize once so both halves are written from identical rows,
    // not two independent corpus passes
    val counts = bucketCounts(a, features).localCheckpoint(true)
    counts.write.mode("overwrite").parquet(s"$path/cur/batch=0")
    counts.write.mode("overwrite").parquet(s"$path/base/batch=0")
  }

  /** Ledgered live-count advance for documents ENTERING the live snapshot
    * (added + the new text of changed, from a corpusDelta cycle). Returns
    * false untouched when `appendId` already landed — replay-safe.
    *
    * DELTA CONTRACT (r14 ADVICE): the retire/append cycle keeps the store
    * equal to the monolithic report ONLY if every bucket feature is a
    * function of the columns the driving delta HASHES. `Dedup.corpusDelta`
    * hashes the text alone — a document whose lang/source/n_chars change
    * while its text doesn't would classify 'unchanged', skip the cycle,
    * and silently skew the served PSI. Drive drift maintenance from
    * [[graft.dedup.Dedup.corpusDeltaOn]] over text PLUS every feature
    * source column (DriftShardSpec's store test is the pinned example).
    */
  def appendDriftCounts(docs: DataFrame, features: Seq[(String, Column)],
                        path: String, appendId: Long): Boolean =
    landDriftDelta(docs, features, path, appendId, negate = false)

  /** The un-learn half for documents LEAVING the live snapshot (removed +
    * the old text of changed): the same ledgered batch with negated
    * counts. Store-sum-per-bucket after retire(old)+append(new) equals
    * the fresh count over the new snapshot exactly.
    */
  def retireDriftCounts(docs: DataFrame, features: Seq[(String, Column)],
                        path: String, appendId: Long): Boolean =
    landDriftDelta(docs, features, path, appendId, negate = true)

  private def landDriftDelta(docs: DataFrame, features: Seq[(String, Column)],
                             path: String, appendId: Long,
                             negate: Boolean): Boolean = {
    require(appendId != 0L, "appendId 0 is reserved for the initial build")
    val fs = fsOf(docs, path)
    graft.store.MaintenanceLock.withLock(fs, path,
      if (negate) "drift-retire" else "drift-append") {
      graft.similarity.Similarity.recoverDir(fs, s"$path/cur")
      if (graft.store.Ledger.landed(fs, s"$path/cur", appendId)) false
      else {
        val d = bucketCounts(docs, features)
        val delta = if (negate) d.withColumn("c", -col("c")) else d
        delta.write.mode("overwrite").parquet(s"$path/cur/batch=$appendId")
        true
      }
    }
  }

  /** Merge the live-count batches back to one `batch=0` (exact long sums;
    * buckets whose population reached zero drop outright — a fresh count
    * never has non-positive rows). Published ids stay as tombstone dirs so
    * the ledger survives; the swap is the two-rename `.prev` window every
    * store shares. Returns true when anything merged.
    */
  def compactDriftStore(spark: org.apache.spark.sql.SparkSession,
                        path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    graft.store.MaintenanceLock.withLock(fs, path, "drift-compact") {
      val dir = s"$path/cur"
      graft.similarity.Similarity.recoverDir(fs, dir)
      val main = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(main)) false
      else {
        val batchDirs = fs.listStatus(main)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        if (batchDirs.count(s => fs.listFiles(s.getPath, true).hasNext) <= 1) false
        else {
          val merged = spark.read.parquet(dir)
            .groupBy("feature", "bucket").agg(sum(col("c")).as("c"))
            .filter(col("c") > 0L)
          val staging = new org.apache.hadoop.fs.Path(s"$path/.cur-compact")
          fs.delete(staging, true)
          merged.write.mode("overwrite").parquet(s"$staging/batch=0")
          // self-running vacuum: one watermark marker instead of a
          // tombstone dir per merged id (carries any prior watermark)
          graft.store.Ledger.stampCompactionWatermark(fs, dir, staging.toString,
            batchDirs.map(_.getPath.getName.stripPrefix("batch=").toLong).toSeq)
          graft.similarity.Similarity.swapDir(fs, staging, dir)
          true
        }
      }
    }
  }

  /** Accept the drift: the monitor's loop step. After the pipeline
    * retrains on the live snapshot, that snapshot becomes the new
    * reference — the summed live counts replace the baseline (written
    * through the same `.prev` swap every store half uses), and the live
    * half is compacted to the identical single batch, so the next cycle
    * starts from PSI exactly 0 and measures only movement SINCE the
    * retrain. Count-frame-sized work only.
    */
  def rebaseDriftBaseline(spark: org.apache.spark.sql.SparkSession,
                          path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    graft.store.MaintenanceLock.withLock(fs, path, "drift-rebase") {
      Seq("base", "cur").foreach(h =>
        graft.similarity.Similarity.recoverDir(fs, s"$path/$h"))
      val live = spark.read.parquet(s"$path/cur")
        .groupBy("feature", "bucket").agg(sum(col("c")).as("c"))
        .filter(col("c") > 0L).localCheckpoint(true)
      val curBatches = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/cur"))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(_.getPath.getName.stripPrefix("batch=").toLong)
      for (half <- Seq("base", "cur")) {
        val staging = new org.apache.hadoop.fs.Path(s"$path/.$half-rebase")
        fs.delete(staging, true)
        live.write.mode("overwrite").parquet(s"$staging/batch=0")
        // the live half keeps its append ledger (tombstones) so a replay
        // of a pre-rebase batch stays a no-op
        if (half == "cur") {
          // self-running vacuum: one watermark marker instead of a
          // tombstone dir per replayed-refusable id
          graft.store.Ledger.stampCompactionWatermark(fs, s"$path/cur",
            staging.toString, curBatches.toSeq)
        }
        graft.similarity.Similarity.swapDir(fs, staging, s"$path/$half")
      }
    }
  }

  /** Serve the report FROM the store: baseline vs the summed live counts —
    * no corpus pass at all, and indifferent to whether compaction has
    * merged the batches yet (longs sum to the same longs in any grouping).
    * Equals [[psiReport]] over (baseline snapshot, live snapshot) exactly.
    */
  def psiFromStore(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    // activeDir serves through compaction's two-rename window (.prev)
    def half(name: String) =
      spark.read.parquet(graft.similarity.Similarity.activeDir(fs, s"$path/$name"))
        .groupBy("feature", "bucket").agg(sum(col("c")).as("c"))
        .filter(col("c") > 0L)
    psiFromCounts(half("base"), half("cur"))
  }

  // ---------------------------------------------------------------------
  // The TIME-axis drift store (the r14 verdict's item 3): the day-pair
  // monitor a scheduler polls should never re-scan the event history —
  // each day's bucket counts land ONCE as a ledgered batch whose
  // directory key IS the day (days since epoch), and the served report
  // recomputes every day-vs-previous-day PSI from the count ledger alone
  // (count-frame-sized — days × buckets rows — at any corpus size). No
  // compaction: the day batches ARE the time axis; merging them would
  // destroy the keys the monitor serves by.
  // ---------------------------------------------------------------------

  /** One-pass history backfill: per-(day, bucket) counts for the whole
    * event history, written as one `days/batch=<epochDay>` partition per
    * day (replacing any existing store). `day` must be a DATE-typed
    * column; buckets keep their raw values (nulls stay null and, as in
    * the direct q220 aggregation, never join — pre-clean them upstream
    * if they must count).
    */
  def buildDailyDriftStore(events: DataFrame, day: Column, bucket: Column,
                           path: String): Unit = {
    val fs = fsOf(events, path)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    events.select(day.as("__day"), bucket.as("bucket"))
      .groupBy("__day", "bucket").agg(count(lit(1)).as("c"))
      .select(datediff(col("__day"), to_date(lit("1970-01-01"))).cast("long")
          .as("batch"), col("bucket"), col("c"))
      .write.partitionBy("batch").mode("overwrite").parquet(s"$path/days")
  }

  /** The daily job's append: ONE day's bucket counts, ledgered by the
    * epoch-day key — a replayed day is a no-op (returns false untouched),
    * so at-least-once schedulers converge. `dayEvents` must carry only
    * the day's rows (the caller's daily partition); the scan is
    * day-sized, never history-sized.
    */
  def appendDailyDriftCounts(dayEvents: DataFrame, bucket: Column,
                             path: String, epochDay: Long): Boolean = {
    val fs = fsOf(dayEvents, path)
    graft.store.MaintenanceLock.withLock(fs, path, "drift-daily-append") {
      graft.similarity.Similarity.recoverDir(fs, s"$path/days")
      // maintenance entry: finish any truncation a crashed retire left
      // mid-children before consulting the ledger (the healed day's
      // tombstone then refuses the replay exactly as a completed retire
      // would)
      healRetiringDays(fs, new org.apache.hadoop.fs.Path(s"$path/days"))
      if (graft.store.Ledger.landed(fs, s"$path/days", epochDay))
        false
      else {
        dayEvents.select(bucket.as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("c"))
          .write.mode("overwrite").parquet(s"$path/days/batch=$epochDay")
        true
      }
    }
  }

  /** Serve every day-vs-previous-day PSI from the ledgered counts — zero
    * event scans, and exactly the q220 in-memory arithmetic: the stored
    * (day, bucket, c) frame plays both sides of [[psiFromCounts]], the
    * A side shifted forward one day, and days without a populated
    * predecessor drop out. Output: (day, n_buckets, n_a, n_b, psi,
    * verdict), day as the string key.
    */
  def dailyDriftFromStore(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame = {
    // a fully-retired store (every day truncated to a tombstone) has no
    // parquet files left — schema inference would throw, but the correct
    // report is simply empty (r15 ADVICE 2)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$path/days")
    // a day carrying a `_retiring=` marker is mid-truncation (a retire
    // crashed between its first and last child delete): its surviving
    // files are PARTIAL counts, and serving them would hand the monitor a
    // silently wrong PSI pair — exclude marked days until the next
    // maintenance entry heals them (r16 verdict finding 2)
    val retiring = retiringDays(fs, dir)
    val hasLive = fs.exists(dir) && fs.listStatus(dir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch=") && {
        val s = st.getPath.getName.drop(6)
        !(s.matches("-?\\d+") && retiring.contains(s.toLong))
      } && fs.listFiles(st.getPath, true).hasNext)
    val counts =
      if (!hasLive)
        spark.range(0).select(to_date(lit("1970-01-01")).as("day"),
          lit("").as("bucket"), lit(0L).as("c"))
      else {
        val stored = spark.read.parquet(s"$path/days")
        if (retiring.isEmpty) stored
        else stored.filter(!col("batch")
          .isin(retiring.toSeq.map(java.lang.Long.valueOf): _*))
      }.select(date_add(to_date(lit("1970-01-01")), col("batch").cast("int"))
          .as("day"), col("bucket"), col("c"))
    dayPairPsi(counts)
  }

  private val RetiringMarker = "_retiring="

  private def retiringDays(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Set[Long] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(RetiringMarker) &&
        n.stripPrefix(RetiringMarker).matches("-?\\d+"))
      .map(_.stripPrefix(RetiringMarker).toLong).toSet

  /** Finish any truncation a crashed retire left mid-children: a
    * `_retiring=<day>` marker means the day was committed to retire —
    * delete its remaining children, then the marker. Idempotent; runs at
    * every daily-store maintenance entry so a marked day cannot outlive
    * the next maintenance pass. Callers hold the store lock.
    */
  private def healRetiringDays(fs: org.apache.hadoop.fs.FileSystem,
                               dir: org.apache.hadoop.fs.Path): Unit =
    retiringDays(fs, dir).foreach { d =>
      val day = new org.apache.hadoop.fs.Path(dir, s"batch=$d")
      if (fs.exists(day))
        fs.listStatus(day).foreach(f => fs.delete(f.getPath, true))
      fs.delete(new org.apache.hadoop.fs.Path(dir, RetiringMarker + d), true)
    }

  /** Retention — the daily store's un-learn path: truncate every day
    * batch strictly BEFORE `beforeEpochDay` to an empty TOMBSTONE dir
    * (never a delete: the dir is the append ledger, and deleting it
    * would let an at-least-once scheduler re-land a retired day). The
    * served report simply loses the retired days — and the first
    * surviving day too if its predecessor retired, exactly as if history
    * started at the horizon. Returns the number of days truncated.
    */
  def retireDailyDriftDays(spark: org.apache.spark.sql.SparkSession,
                           path: String, beforeEpochDay: Long): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    graft.store.MaintenanceLock.withLock(fs, path, "drift-daily-retire") {
      val dir = new org.apache.hadoop.fs.Path(s"$path/days")
      if (!fs.exists(dir)) 0
      else {
        // finish any day a crashed retire left mid-children first (not
        // counted: its truncation was committed by the earlier call)
        healRetiringDays(fs, dir)
        fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
          // skip non-numeric partition dirs (e.g. __HIVE_DEFAULT_PARTITION__
          // from a null event day) instead of throwing on toLong
          .filter(_.getPath.getName.drop(6).matches("-?\\d+"))
          .filter(_.getPath.getName.drop(6).toLong < beforeEpochDay)
          .count { st =>
            // truncate IN PLACE by deleting the children, never the dir
            // itself: the dir is the append ledger, and the old
            // delete+mkdirs pair had an instant with no ledger entry — a
            // crash there let an at-least-once scheduler resurrect the
            // retired day (r15 verdict finding 1). The children-delete in
            // turn gets a `_retiring=<day>` marker around it: a crash
            // mid-children would otherwise leave a day serving PARTIAL
            // counts — a silently wrong PSI pair — until someone happened
            // to re-run retire (r16 verdict finding 2). With the marker,
            // serving excludes the day and every maintenance entry heals
            // it, so the partial state is never visible.
            val had = fs.listFiles(st.getPath, true).hasNext
            if (had) {
              val day = st.getPath.getName.drop(6).toLong
              val marker = new org.apache.hadoop.fs.Path(dir, RetiringMarker + day)
              fs.mkdirs(marker)
              fs.listStatus(st.getPath).foreach(f => fs.delete(f.getPath, true))
              fs.delete(marker, true)
            }
            had
          }
      }
    }
  }

  /** The day-pair monitor over ANY (day DATE, bucket, c) count frame —
    * the q220 arithmetic, shared by the day-keyed ledger
    * ([[dailyDriftFromStore]]) and the stream-grown delta store
    * ([[dailyDriftFromCountDeltas]]) so the three serving paths can
    * never skew. Days without a populated predecessor drop out.
    */
  def dayPairPsi(counts: DataFrame): DataFrame = {
    val bc = counts.select(col("day").cast("string").as("feature"),
      col("bucket"), col("c"))
    val ac = counts.select(date_add(col("day"), 1).cast("string").as("feature"),
      col("bucket"), col("c"))
    psiFromCounts(ac, bc)
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumnRenamed("feature", "day")
  }

  /** Serve the day-pair monitor from a STREAM-grown count-delta store (a
    * [[graft.streaming.StreamingPipeline.frameAppendBatch]] store whose
    * per-batch rows are (day, bucket, c) counts of that micro-batch
    * alone): micro-batches may split a day arbitrarily — counts are
    * additive longs, so summing across batches recovers the exact
    * per-day populations however the stream chopped them. This is the
    * ingestion-mode complement of the day-keyed ledger
    * ([[appendDailyDriftCounts]]), whose one-batch-per-day contract a
    * stream cannot honor.
    */
  def dailyDriftFromCountDeltas(spark: org.apache.spark.sql.SparkSession,
                                path: String): DataFrame =
    dayPairPsi(spark.read.parquet(path)
      .groupBy("day", "bucket").agg(sum(col("c")).as("c")))
}
