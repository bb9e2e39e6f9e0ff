package graft.sketch

import graft.dedup.Dedup.hex60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, mergeable sketches for corpus-scale statistics —
  * approximate distinct counting (HyperLogLog), approximate frequency /
  * heavy hitters (count-min), fixed-bin quantile histograms, and
  * approximate membership (Bloom). Spark ships its own HLL++
  * (`approx_count_distinct`), but its register layout and bias tables are
  * engine-private, so its estimates can never be checked against another
  * engine. These sketches instead fix every bit of the computation — the
  * [[graft.expressions.Hex60]] md5-derived hash, register width, and an
  * estimator built only from integer shifts and exact dyadic arithmetic — so
  * DuckDB replays the identical sketch and the driver's hash-compare gate
  * applies to an *approximate* algorithm. That reproducibility is the
  * production property too: a 100 TB sketch computed twice (or incrementally
  * merged) must not wobble with partition order.
  *
  * Scale shape: both sketches reduce to fixed-size state per group
  * (2^b registers / d×w cells), built by map-side partial aggregation —
  * the shuffle carries sketch cells, never raw rows.
  */
object Sketches {

  /** HyperLogLog distinct-count estimate per key group.
    *
    * Register index = top `b` bits of the 60-bit hash; rank = position of the
    * highest set bit in the remaining `60-b` bits, computed as
    * `(60-b) - length(bin(w)) + 1` (both engines print minimal binary
    * strings, so the string length IS the bit length — no `log2`, whose
    * libm rounding differs across engines). Ranks are capped at `rhoCap` so
    * every denominator term `2^-M` stays a multiple of `2^-rhoCap`: a sum of
    * ≤ 2^b such terms then fits exactly in a double mantissa, making the
    * estimator independent of Spark's partial-agg order. The raw HLL
    * estimator `alpha_m * m^2 / (empty + Σ 2^-M_j)` is used without the
    * small/large-range corrections — those need `ln`, which is libm again.
    * Empty registers contribute `2^0 = 1` via the `(m - nonempty)` term.
    *
    * One aggregation keyed by (group, register): the shuffle after partial
    * agg carries at most m rows per group regardless of input size.
    */
  def hllDistinct(df: DataFrame, keys: Seq[String], item: Column,
                  b: Int = 8, rhoCap: Int = 30): DataFrame =
    hllEstimate(hllRegisters(df, keys, item, b, rhoCap), keys, b)

  /** The sketch STATE: one (group, register, max-rank) row per touched
    * register — at most 2^b rows per group regardless of input size. This is
    * the unit of merge: registers from disjoint slices combine with a plain
    * `max`, which is commutative, associative, and idempotent, so any merge
    * tree (micro-batches, partial re-ingests, cross-cluster union) yields
    * the bit-identical sketch the single-pass batch build would.
    */
  def hllRegisters(df: DataFrame, keys: Seq[String], item: Column,
                   b: Int = 8, rhoCap: Int = 30): DataFrame = {
    require(b >= 4 && b <= 16, s"register-index width out of range: $b")
    val wBits = 60 - b
    val h = hex60(item.cast("string"))
    val w = h.bitwiseAND(lit((1L << wBits) - 1))
    val rho = (lit(wBits) - length(bin(w)) + lit(1)).cast("int")
    val k = keys.map(col)
    df.select(k ++ Seq(shiftright(h, wBits).as("reg"), least(rho, lit(rhoCap)).as("rank")): _*)
      .groupBy(k :+ col("reg"): _*)
      .agg(max(col("rank")).as("rank"))
  }

  /** Merge two register tables (same keys/b): union + per-register max. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col) :+ col("reg"): _*)
      .agg(max(col("rank")).as("rank"))

  /** Estimator over a register table (see [[hllDistinct]]'s scaladoc for the
    * exact-dyadic design that keeps it engine- and order-independent).
    */
  def hllEstimate(regs: DataFrame, keys: Seq[String], b: Int = 8): DataFrame = {
    val m = 1 << b
    val k = keys.map(col)
    // 2^-rank via integer shift + exact division — no pow(), no libm
    val powNeg = lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), rank)").cast("double")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    regs.groupBy(k: _*)
      .agg(count(lit(1)).as("nonempty"), sum(powNeg).as("sum_pow"))
      .select(k ++ Seq(
        col("nonempty"),
        (alpha * lit(m.toDouble * m) /
          ((lit(m) - col("nonempty")).cast("double") + col("sum_pow"))).as("estimate")): _*)
  }

  /** Count-min sketch STATE: the d×w cell-total table for a term stream.
    * Cells from disjoint slices merge with cell-wise SUM — commutative and
    * associative but NOT idempotent, so an incremental maintainer must
    * deduplicate replayed batches (see
    * [[graft.streaming.StreamingPipeline.cmsMergeBatch]]'s batch-id ledger),
    * where the HLL max-merge could simply re-apply them.
    */
  def cmsCells(terms: DataFrame, termCol: String = "term",
               d: Int = 3, w: Int = 1024): DataFrame = {
    val counts = terms.groupBy(col(termCol)).agg(count(lit(1)).as("cnt"))
    counts.select(col(termCol), col("cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("seed"))
      .withColumn("cell", hex60(concat_ws(":", col("seed"), col(termCol))) % w)
      .groupBy(col("seed"), col("cell")).agg(sum(col("cnt")).as("cell_total"))
  }

  /** Merge two cell tables (same d/w): union + cell-wise sum. */
  def cmsMergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("seed"), col("cell")).agg(sum(col("cell_total")).as("cell_total"))

  /** Merge two histogram sketch tables (same keys/binWidth/numBins): union +
    * bucket-wise SUM — commutative and associative but NOT idempotent, the
    * same replay caveat as [[cmsMergeCells]] (see the `_batches` ledger in
    * [[graft.streaming.StreamingPipeline.histMergeBatch]]).
    */
  def histogramMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum(col("n")).as("n"))

  /** Point-estimate term frequencies from a cell table: min over the d rows
    * of each term's cells (never undercounts). The cell table is fixed-size,
    * so it broadcasts.
    */
  def cmsEstimate(terms: DataFrame, cells: DataFrame, termCol: String = "term",
                  d: Int = 3, w: Int = 1024): DataFrame =
    terms.select(col(termCol)).distinct()
      .select(col(termCol), explode(sequence(lit(0), lit(d - 1))).as("seed"))
      .withColumn("cell", hex60(concat_ws(":", col("seed"), col(termCol))) % w)
      .join(broadcast(cells), Seq("seed", "cell"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cell_total"), lit(0L))).as("est"))

  /** Fixed-bin histogram sketch: the third mergeable-state family —
    * (group, bucket, n) rows, at most `numBins` per group, merged by
    * cell-wise sum (same transactional replay caveat as count-min). This is
    * the no-sort quantile path at scale: a global exact quantile needs a
    * sort or a rank pass over all rows, the sketch needs one hash
    * aggregation and answers any quantile from bounded state with
    * one-bin-width error.
    *
    * DOMAIN: the one-bin-width error bound holds only for values in
    * `[0, binWidth * numBins)`. Out-of-range values are CLAMPED into the
    * edge buckets (bucket 0 / bucket numBins-1), so a quantile that lands
    * in a clamped bucket is only bounded by the true data range, not by
    * binWidth — size `numBins`/`binWidth` from a known domain (or a prior
    * bounds pass) when the guarantee matters.
    */
  def histogramSketch(df: DataFrame, keys: Seq[String], value: Column,
                      binWidth: Double, numBins: Int): DataFrame =
    df.select(keys.map(col) :+
        least(greatest(floor(value / binWidth), lit(0.0)), lit(numBins - 1.0))
          .cast("int").as("bucket"): _*)
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  /** [[histogramSketchAuto]]'s result: the bucket table plus the derived
    * geometry a reader needs ([[histogramQuantiles]]' binWidth and origin).
    */
  case class AutoHistogram(sketch: DataFrame, binWidth: Double, origin: Double)

  /** Bounds-pass variant of [[histogramSketch]] for callers who can afford
    * one extra job: a global min/max pre-pass derives `origin = min` and
    * `binWidth = (max - min) / numBins`, so EVERY value lands in a real
    * bucket and the one-bin-width quantile guarantee holds with no domain
    * caveat — the [[histogramSketch]] DOMAIN note exists precisely because
    * the fixed-geometry sketch clamps out-of-range values into edge
    * buckets. The bounds are GLOBAL, not per group: per-group geometry
    * would make bucket edges group-dependent, and two sketches could no
    * longer merge cell-wise — which is the property the streaming
    * maintainer and slice-merge tests rely on. Sketches built by this
    * method merge with each other only when built from the same
    * (origin, binWidth) — persist the two numbers with the bucket table.
    * Degenerate inputs (empty, or all values equal) get binWidth 1.0 and a
    * single occupied bucket.
    */
  def histogramSketchAuto(df: DataFrame, keys: Seq[String], value: Column,
                          numBins: Int): AutoHistogram = {
    val b = df.agg(min(value).cast("double").as("lo"), max(value).cast("double").as("hi")).head()
    val (lo, hi) = if (b.isNullAt(0)) (0.0, 0.0) else (b.getDouble(0), b.getDouble(1))
    val width = if (hi > lo) (hi - lo) / numBins else 1.0
    AutoHistogram(histogramSketch(df, keys, value - lit(lo), width, numBins), width, lo)
  }

  /** Quantile estimates from a histogram sketch: for each requested q, the
    * UPPER edge of the first bucket whose cumulative count reaches
    * ceil(q * total) — deterministic integer/IEEE arithmetic, exact to one
    * bin width. One partitioned cumulative window over ≤ numBins rows per
    * group, then a single aggregation; qs become columns `p<100q>`.
    * `origin` shifts the edges for sketches built over offset values
    * ([[histogramSketchAuto]]).
    */
  def histogramQuantiles(sketch: DataFrame, keys: Seq[String], binWidth: Double,
                         qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                         origin: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = keys.map(col)
    val cum = sketch
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(k: _*).orderBy(col("bucket"))))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(k: _*)))
    val qCols = qs.map { q =>
      ((min(when(col("cum") >= ceil(lit(q) * col("total")), col("bucket"))) + 1).cast("double")
        * binWidth + origin).as(s"p${(q * 100).round}")
    }
    cum.groupBy(k: _*)
      .agg(max(col("total")).as("n_rows"), qCols: _*)
  }

  /** Bloom-filter sketch STATE: the packed word table — `(word_idx, word)`
    * rows where bit `i` of the filter lives at
    * `word_idx = i >> 5, mask = 1 << (i & 31)` (32 bits per BIGINT word, so
    * every mask and every OR stays inside non-negative int64 range on both
    * engines — a 64-bit packing would need `1 << 63`, whose sign semantics
    * DuckDB and the JVM disagree on). An item sets `k` bits,
    * `hex60(seed:item) mod m` for seeds `0..k-1` — the same seeded-hash
    * scheme as [[cmsCells]]. At most `m/32` rows regardless of input size,
    * and words from disjoint slices merge with bitwise OR — commutative,
    * associative, and IDEMPOTENT, so like the HLL register table (and unlike
    * the SUM-merged count-min/histogram families) replayed batches re-apply
    * harmlessly and any merge tree yields the bit-identical filter.
    *
    * This is the membership prefilter at 100 TB: a set of n keys becomes
    * `m` BITS (not rows — 2^21 bits is 256 KB), the filter broadcasts to
    * every probe task, and a definite-NO answer skips the expensive exact
    * join entirely. False positives are resolved by running the exact check
    * on just the bloom-positive survivors; false negatives are impossible
    * by construction, which is what keeps the composed result EXACT (see
    * the q118 gate).
    */
  def bloomWords(items: DataFrame, itemCol: String,
                 k: Int = 4, m: Int = 1 << 21): DataFrame = {
    require(Integer.bitCount(m) == 1 && m >= 32, s"m must be a power of two >= 32: $m")
    require(k >= 1 && k <= 16, s"hash count out of range: $k")
    items.select(col(itemCol), explode(sequence(lit(0), lit(k - 1))).as("seed"))
      .withColumn("__bit", hex60(concat_ws(":", col("seed"), col(itemCol))) % m)
      .select(shiftright(col("__bit"), 5).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit & 31 AS INT))").as("__mask"))
      .groupBy(col("word_idx")).agg(expr("bit_or(__mask)").as("word"))
  }

  /** Merge two word tables (same k/m): union + per-word bitwise OR. */
  def bloomMergeWords(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("word_idx")).agg(expr("bit_or(word)").as("word"))

  /** Membership probe: every input row (any columns) gains `might_contain` —
    * true iff all `k` of `itemCol`'s bits are set in the filter. The word
    * table joins BROADCAST (it is at most `m/32` rows by construction), so
    * probing is map-side: no shuffle of the probe stream beyond the per-row
    * regroup, and at scale the definite-NO rows never reach the exact join
    * this filter fronts. `k`/`m` must match the build call.
    *
    * Duplicate probe rows are safe but COLLAPSE: the regroup keys on all
    * original columns, so g identical rows come back as ONE output row
    * (whose verdict is correct — the test compares hit count against the
    * group's own seed-row count, not against a bare k, so duplicates can
    * never fabricate a false negative).
    */
  def bloomMightContain(items: DataFrame, words: DataFrame, itemCol: String,
                        k: Int = 4, m: Int = 1 << 21): DataFrame = {
    val orig = items.columns.map(col)
    items.select(orig :+ explode(sequence(lit(0), lit(k - 1))).as("seed"): _*)
      .withColumn("__bit", hex60(concat_ws(":", col("seed"), col(itemCol))) % m)
      .withColumn("word_idx", shiftright(col("__bit"), 5))
      .join(broadcast(words), Seq("word_idx"), "left")
      .withColumn("__hit",
        when(coalesce(col("word"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit & 31 AS INT))")) =!= 0L,
          1).otherwise(0))
      .groupBy(orig: _*)
      // === count(*), not === k: duplicate input rows group together, so a
      // group holds g*k seed rows — requiring exactly k hits would turn
      // every all-bits-set duplicate pair into a bogus false negative
      .agg((sum(col("__hit")) === count(lit(1))).as("might_contain"))
  }

  /** Count-min frequency estimates with a top-k heavy-hitter report.
    *
    * `d` rows × `w` buckets; row `s` hashes a term to
    * `hex60(s || ':' || term) mod w`. True term counts are aggregated FIRST
    * (one shuffle on term — needed anyway to enumerate candidates), then the
    * d×w cell totals are built from those counts (at most |vocab|×d rows in,
    * d×w out) and joined back broadcast — so the estimate = min over rows of
    * the term's cell totals costs one broadcast of a fixed-size sketch, not a
    * second pass over the corpus. Reports the k largest estimates
    * (ties broken by term) with the true count alongside, which makes the
    * collision inflation `est − cnt` directly visible.
    */
  /** Misra-Gries heavy-hitters summary over one partition's items: at most
    * `k` counters; an incoming item either increments its counter, claims a
    * free slot, or decrements EVERY counter (dropping zeros) — the classic
    * frequent-items stream algorithm. Guarantee per summary: estimates
    * undercount, and by at most n_partition / (k+1).
    */
  private[graft] def mgReduce(items: Iterator[String], k: Int): collection.mutable.HashMap[String, Long] = {
    val m = collection.mutable.HashMap.empty[String, Long]
    items.foreach { it =>
      m.get(it) match {
        case Some(c) => m(it) = c + 1
        case None if m.size < k => m(it) = 1L
        case None =>
          var dropped = List.empty[String]
          m.keysIterator.foreach { key =>
            val c = m(key) - 1
            if (c == 0) dropped ::= key else m(key) = c
          }
          dropped.foreach(m.remove)
      }
    }
    m
  }

  /** Mergeable-summaries merge (Agarwal et al. 2013): sum both counter
    * sets, then if more than `k` survive, subtract the (k+1)-th largest
    * count from every counter and drop the non-positive — the combined
    * summary keeps the MG guarantee (error ≤ n_total / (k+1)) at size ≤ k.
    * Tie-break on (count desc, item asc) keeps the cut deterministic.
    */
  private[graft] def mgMerge(a: collection.Map[String, Long],
                             b: collection.Map[String, Long],
                             k: Int): Map[String, Long] = {
    val sum = collection.mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (i, c) =>
      sum(i) = sum.getOrElse(i, 0L) + c
    }
    if (sum.size <= k) sum.toMap
    else {
      val cut = sum.toSeq.sortBy { case (i, c) => (-c, i) }.apply(k)._2
      sum.iterator.map { case (i, c) => (i, c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Distributed Misra-Gries: one MG pass per partition (map-only over the
    * raw rows — the shuffle-free half), then a deterministic driver fold of
    * the ≤ numPartitions bounded summaries in partition order. State is
    * ≤ k counters per partition BY CONSTRUCTION — the same bounded-collect
    * discipline as the k-means centroid and BPE-histogram collects. At
    * 100 TB this is the cheap first pass that finds candidate hot keys
    * (for salting decisions, cache admission, skew diagnostics) without
    * paying the exact groupBy shuffle; the exact pass then runs ONLY for
    * the surfaced candidates if true counts are needed.
    */
  def mgSummary(items: DataFrame, itemCol: String, k: Int): Map[String, Long] = {
    val spark = items.sparkSession
    import spark.implicits._
    // nulls are dropped (the count(col) convention) BEFORE the per-partition
    // reduce: a null surviving the cast-to-string would become a null map
    // key, and the streaming maintainer's sortBy/toDF over summary keys
    // NPEs on null String ordering — a poisoned stream must not take down
    // the whole summary store
    val partials = items.select(col(itemCol).cast("string").as("i"))
      .filter(col("i").isNotNull).as[String]
      .mapPartitions(it => Iterator.single(mgReduce(it, k).toMap))
      .collect()
    partials.foldLeft(Map.empty[String, Long])((acc, p) => mgMerge(acc, p, k))
  }

  /** q144 gate (the invariant-counter pattern): every TRUE heavy hitter —
    * item with exact count > n/k, which DuckDB derives exactly — must
    * appear in the merged MG summary (found_viol), with an estimate that
    * undercounts (under_viol) by at most n/k (err_viol). The exact
    * aggregation also anchors the row shape; the MG summary itself rides
    * along only through the pinned-zero counters, so partition-order
    * freedom inside the sketch cannot wobble the gate.
    */
  def heavyHittersGate(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    heavyHittersGateFrom(items, itemCol,
      mgSummary(items, itemCol, k).toSeq.toDF("item", "__est"), k)
  }

  /** [[heavyHittersGate]] with the MG summary supplied externally — the
    * stream-grown / retirement-rebuilt summary store's gate (q200): the
    * mergeable-summaries bound holds over whatever total the summary
    * covers, so `items` must be exactly the rows the summary merged
    * (post-retirement: the surviving slices).
    */
  def heavyHittersGateFrom(items: DataFrame, itemCol: String,
                           summary: DataFrame, k: Int): DataFrame = {
    val mgDf = summary.toDF("item", "__est") // positional: (item, count)
    val exact = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull) // mirror mgSummary's null-drop
      .groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
    val n = exact.agg(sum(col("exact_cnt")).as("n"))
    exact.crossJoin(broadcast(n))
      .filter(col("exact_cnt") > col("n") / k.toDouble)
      .join(broadcast(mgDf), Seq("item"), "left") // ≤ k summary rows
      .select(col("item"), col("exact_cnt"),
        when(col("__est").isNull, 1L).otherwise(0L).as("found_viol"),
        when(col("__est") > col("exact_cnt"), 1L).otherwise(0L).as("under_viol"),
        when(col("exact_cnt") - coalesce(col("__est"), lit(0L)) > col("n") / k.toDouble, 1L)
          .otherwise(0L).as("err_viol"))
      .orderBy("item")
  }

  def countMinTopK(terms: DataFrame, termCol: String = "term",
                   d: Int = 3, w: Int = 1024, k: Int = 20): DataFrame =
    cmsTopKFromCells(terms, cmsCells(terms, termCol, d, w), termCol, d, w, k)

  /** The heavy-hitter ranking tail over ANY cell table — in-query sketch
    * ([[countMinTopK]]) or a stream-grown store (q158): exact counts from
    * `terms`, per-term estimate = min over the d seeded cells, top-k by
    * (est desc, term asc). Shared so the two paths can never copy-drift.
    */
  def cmsTopKFromCells(terms: DataFrame, cells: DataFrame, termCol: String = "term",
                       d: Int = 3, w: Int = 1024, k: Int = 20): DataFrame =
    terms.groupBy(col(termCol)).agg(count(lit(1)).as("cnt"))
      .select(col(termCol), col("cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("seed"))
      .withColumn("cell", hex60(concat_ws(":", col("seed"), col(termCol))) % w)
      .join(broadcast(cells), Seq("seed", "cell"))
      .groupBy(col(termCol), col("cnt"))
      .agg(min(col("cell_total")).as("est"))
      .orderBy(col("est").desc, col(termCol).asc)
      .limit(k)
      .select(col(termCol), col("est"), col("cnt"))
}
