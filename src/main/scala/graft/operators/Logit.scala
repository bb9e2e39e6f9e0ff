package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed binary classifier — the quality-FILTER member of the
  * fit-on-aggregates family ([[Ridge]] is the regressor): a training-data
  * pipeline's canonical use is the learned quality gate (fastText-style
  * "does this document look like reference text?"), where the label is a
  * curated 0/1 signal and the score thresholds the corpus. Same scale
  * shape as ridge: the data-sized work is bounded aggregation passes
  * (2 moment passes + one gradient pass per iteration over a materialized
  * (z, y) frame), the state is d weights + a bias on the driver, and
  * prediction is map-only — n never touches the driver, d never shuffles.
  * Unlike ridge the loss is not moment-reducible, so each gradient round
  * IS a data pass; `iters` bounds the passes (the L-BFGS/IRLS tradeoff at
  * 100 TB: fewer, heavier passes — this keeps the cross-engine-exact GD
  * shape the repo's oracles replay).
  *
  * CROSS-ENGINE EXACTNESS is why the link is the ALGEBRAIC sigmoid
  * `p = 0.5 + 0.5 * t / (1 + |t|)` rather than the logistic
  * `1/(1+exp(-t))`: exp's last ulp differs across libm builds (the same
  * reason TF-IDF ranks on a quantized score), so a hash gate over a
  * 30-round fit could drift at a quantization boundary. The algebraic
  * sigmoid is +,*,/,abs only — exact-rounded IEEE ops on identical
  * inputs, bit-identical in Spark and DuckDB. It keeps the logistic's
  * shape (monotone, symmetric, p(0)=0.5, saturating) and trains with the
  * logistic-form gradient z·(p−y); the fitted scorer is a calibrated-
  * enough ranking/thresholding model, which is the pipeline contract.
  * House quantization rules throughout: `floor(x*1e8)` integer partials
  * for every data-sized sum (DECIMAL(38,0) accumulation — the billions-
  * of-rows envelope), per-row dot products as summed BIGINT terms, and
  * the iterate re-rounded to 6 decimals each step so both engines walk
  * the identical trajectory.
  */
object Logit {

  private val Q = 1e8

  private def r6(x: Double): Double = graft.core.Num.round6(x)

  /** A fitted classifier: per-feature standardization (mu, sd) +
    * standardized-space weights and bias. sd of 0 (constant column)
    * zeroes the feature instead of dividing by it.
    */
  final case class LogitFit(features: Seq[String], mu: Seq[Double], sd: Seq[Double],
                            weights: Seq[Double], bias: Double)

  /** Quantized-partial sum as DECIMAL(38,0) — see [[Ridge]]'s envelope
    * note; DuckDB's BIGINT sums accumulate in HUGEINT, so the engines
    * agree wherever either is in range.
    */
  private def qsum(c: Column) = sum(floor(c * Q).cast("decimal(38,0)"))

  private def qget(row: Row, name: String): Double =
    row.getAs[java.math.BigDecimal](name).doubleValue

  private def zCol(c: Column, mu: Double, sd: Double): Column =
    if (sd == 0.0) lit(0.0) else (c - lit(mu)) / lit(sd)

  /** The algebraic sigmoid over a (already quantized) margin column. */
  private def sigmoid(t: Column): Column =
    lit(0.5) + lit(0.5) * t / (lit(1.0) + abs(t))

  /** Quantized per-row margin t = sum_i floor(z_i * w_i * Q) / Q + b. */
  private def marginCol(zs: Seq[Column], w: Seq[Double], b: Double): Column =
    zs.indices.map(i => floor(zs(i) * w(i) * Q).cast("long"))
      .reduce(_ + _).cast("double") / Q + lit(b)

  /** Fit: two moment passes + `iters` gradient passes over a materialized
    * (z, y) frame (localCheckpoint — n rows x (d+1) doubles; at larger
    * scale persist to storage or accept per-pass recompute, the knob is
    * orthogonal to the math). Labels must be 0.0/1.0.
    *
    * The input is PROJECTED to (features, label) and checkpointed FIRST
    * (r18, guide §1.2): count, the two moment passes, and the z transform
    * previously each recomputed the caller's frame — for the q164-q170
    * family that frame is a full text-feature pass over the corpus, so the
    * fit paid the corpus cost four times before the first gradient step.
    * The aggregations themselves are unchanged, so the learned weights are
    * bit-identical.
    */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          lr: Double = 0.5, lambda: Double = 0.001, iters: Int = 30): LogitFit = {
    val d = featureCols.size
    require(d >= 1, "need at least one feature")
    val ckpt = df.select((featureCols :+ labelCol).map(col): _*)
      .localCheckpoint(true)
    val n = ckpt.count().toDouble
    require(n > 0, "need a non-empty training set")
    // size-derived partition view for the repeated passes (guide §2; see
    // [[graft.core.Par.sizeCoalesced]] — exact sums, so bit-identical)
    val base = graft.core.Par.sizeCoalesced(ckpt, n.toLong, 8L * (d + 1))

    val meanRow = base.agg(qsum(col(featureCols.head)).as("q0"),
      featureCols.tail.zipWithIndex.map { case (c, i) => qsum(col(c)).as(s"q${i + 1}") }: _*)
      .head()
    val mus = featureCols.indices.map(i => qget(meanRow, s"q$i") / n / Q)
    def sq(c: Column) = c * c // x*x is IEEE-pinned; pow's libm rounding is not
    val varRow = base.agg(
      qsum(sq(col(featureCols.head) - mus.head)).as("q0"),
      featureCols.tail.zipWithIndex.map { case (c, i) =>
        qsum(sq(col(c) - mus(i + 1))).as(s"q${i + 1}")
      }: _*).head()
    val sds = featureCols.indices.map(i => math.sqrt(qget(varRow, s"q$i") / n / Q))

    // no second checkpoint: base IS materialized, and the z transform is a
    // cheap deterministic map that fuses into each gradient pass's codegen
    // — materializing it again only paid one more write of the frame
    val zdf = base.select(featureCols.indices.map(i =>
        zCol(col(featureCols(i)), mus(i), sds(i)).as(s"z$i")) :+
        col(labelCol).cast("double").as("y"): _*)
    val zs = featureCols.indices.map(i => col(s"z$i"))

    var w = Array.fill(d)(0.0)
    var b = 0.0
    for (_ <- 1 to iters) {
      val r = sigmoid(marginCol(zs, w.toSeq, b)) - col("y")
      val aggs = featureCols.indices.map(i => qsum(zs(i) * r).as(s"g$i")) :+
        qsum(r).as("gb")
      val row = zdf.agg(aggs.head, aggs.tail: _*).head()
      val g = Array.tabulate(d)(i => qget(row, s"g$i") / n / Q)
      val gb = qget(row, "gb") / n / Q
      w = Array.tabulate(d)(i => r6(w(i) - lr * (g(i) + lambda * w(i))))
      b = r6(b - lr * gb)
    }
    LogitFit(featureCols, mus, sds, w.toSeq, b)
  }

  /** The fitted model as a table — one row per feature
    * (i, feature, w, mu, sd) with the bias repeated; the shape the oracle
    * replays and [[saveModel]] persists.
    */
  def weightsDf(spark: SparkSession, fit: LogitFit): DataFrame = {
    val rows = fit.features.indices.map(i =>
      Row(i, fit.features(i), fit.weights(i), fit.mu(i), fit.sd(i), fit.bias))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("i", IntegerType, nullable = false),
        StructField("feature", StringType, nullable = false),
        StructField("w", DoubleType, nullable = false),
        StructField("mu", DoubleType, nullable = false),
        StructField("sd", DoubleType, nullable = false),
        StructField("bias", DoubleType, nullable = false))))
  }

  /** Persist / load / score-from-store — the [[Ridge.saveModel]] treatment:
    * train once on the big corpus, gate any table from the d-row artifact.
    */
  def saveModel(spark: SparkSession, fit: LogitFit, path: String): Unit =
    weightsDf(spark, fit).coalesce(1).write.mode("overwrite").parquet(path)

  def loadModel(spark: SparkSession, path: String): LogitFit = {
    val rows = spark.read.parquet(path).orderBy("i").collect()
    require(rows.nonEmpty, s"no logit model at $path")
    LogitFit(
      rows.map(_.getAs[String]("feature")).toSeq,
      rows.map(_.getAs[Double]("mu")).toSeq,
      rows.map(_.getAs[Double]("sd")).toSeq,
      rows.map(_.getAs[Double]("w")).toSeq,
      rows.head.getAs[Double]("bias"))
  }

  def predictFromStore(df: DataFrame, path: String, idCol: String): DataFrame =
    predict(df, loadModel(df.sparkSession, path), idCol)

  /** Map-only scoring: (id, p, pred) with p quantized to 6 decimals
    * (`floor(p*1e6+0.5)/1e6` — the cross-engine rounding) and the 0.5
    * threshold applied to the QUANTIZED p, so the verdict can never differ
    * between engines at a sub-quantum boundary.
    */
  def predict(df: DataFrame, fit: LogitFit, idCol: String): DataFrame = {
    val zs = fit.features.indices.map(i =>
      zCol(col(fit.features(i)), fit.mu(i), fit.sd(i)))
    val p6 = floor(sigmoid(marginCol(zs, fit.weights, fit.bias)) * 1e6 + 0.5) / 1e6
    df.select(col(idCol), p6.as("p"), (p6 >= 0.5).as("pred"))
  }

  /** Exact Mann-Whitney AUC from a grouped-count table (p, np, nn) — one
    * row per DISTINCT quantized score with its positive/negative counts,
    * which quantization bounds at <= 1e6+1 rows regardless of corpus size,
    * so the unpartitioned cumulative window is safe at any scale. Returns
    * one row (n_pos, n_neg, auc) with ties at half credit and auc rounded
    * to 6 decimals.
    *
    * ENVELOPE: the pairwise products `neg_below*np` and `nn*np` sum to at
    * most n_pos*n_neg, which crosses Long.MaxValue at ~3e9 docs per class —
    * so the products accumulate as DECIMAL(38,0) (the house rule every
    * data-sized sum follows; DuckDB's BIGINT sums widen to HUGEINT, so the
    * engines agree wherever either is in range). The per-group counts and
    * their plain sums stay LONG: those are bounded by n itself.
    */
  def aucFromGroupedCounts(grp: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // unpartitioned window — BENIGN: <= 1e6+1 rows by the quantization
    // bound above. WindowExec's single-partition WARN is suppressed in the
    // session factories (Graft.quietNoisyLogs) — a constant partitionBy
    // key does NOT silence it, Catalyst folds the key away (measured r15).
    val w = Window.orderBy(col("p")).rowsBetween(Window.unboundedPreceding, -1)
    val dec = "decimal(38,0)"
    grp.select(col("np"), col("nn"),
        coalesce(sum(col("nn")).over(w), lit(0L)).as("neg_below"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("neg_below").cast(dec) * col("np")).as("full"),
        sum(col("nn").cast(dec) * col("np")).as("ties"))
      .select(col("n_pos"), col("n_neg"),
        (floor((col("full").cast("double") + lit(0.5) * col("ties").cast("double"))
          / (col("n_pos").cast(dec) * col("n_neg")).cast("double") * 1e6 + 0.5) / 1e6)
          .as("auc"))
  }

  /** Reliability-diagram bins over a scored+labeled frame (columns `p`,
    * `y`): decile-bin the quantized scores; per bin the exact count, the
    * quantized mean score, the empirical positive rate, and their gap.
    * Means derive from integer partial sums (exact: p is a 1e-6 multiple,
    * y is 0/1), so every row is engine-exact. `avg_y` IS the calibrated
    * probability [[calibratedPredict]] samples through.
    */
  def calibrationBins(scored: DataFrame): DataFrame =
    scored.select(least(floor(col("p") * 10), lit(9.0)).cast("int").as("bin"),
        col("p"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        // score partials accumulate DECIMAL(38,0) (the q168 envelope rule:
        // a LONG sum of 1e8-quantized scores wraps at ~9e10 docs per bin)
        (sum(floor(col("p") * 1e8).cast("decimal(38,0)")).cast("double")
          / count(lit(1)) / 1e8).as("pr"),
        (sum(col("y").cast("long")).cast("double") / count(lit(1))).as("yr"))
      .select(col("bin"), col("n"),
        (floor(col("pr") * 1e6 + 0.5) / 1e6).as("avg_p"),
        (floor(col("yr") * 1e6 + 0.5) / 1e6).as("avg_y"),
        (floor(abs(col("pr") - col("yr")) * 1e6 + 0.5) / 1e6).as("gap"))

  /** Calibrated scoring — the operator q167's own measurement demands: the
    * raw algebraic-sigmoid p is MONOTONE with the label but not calibrated
    * as a probability (the sigmoid squashes less than the logistic), so a
    * pipeline that samples documents by quality must sample through the
    * calibration map, not raw p. Each score joins its decile bin and takes
    * the bin's empirical positive rate `avg_y` as `p_cal` (histogram
    * calibration — exact, engine-stable arithmetic: avg_y is already a
    * quantized 6-decimal multiple). The bin table is <= 10 rows and joins
    * broadcast; scoring stays map-shaped at any corpus size.
    *
    * Total over the scored frame: a bin ABSENT from `bins` (possible when
    * new data is scored against training-time bins whose deciles it never
    * populated) falls back to the raw p rather than silently dropping the
    * document — calibration degrades, coverage never does. With bins
    * derived from the same scored frame (every current caller) the left
    * join matches every row and the fallback is inert.
    */
  def calibratedPredict(scored: DataFrame, bins: DataFrame, idCol: String): DataFrame =
    scored.select(col(idCol), col("p"),
        least(floor(col("p") * 10), lit(9.0)).cast("int").as("bin"))
      .join(broadcast(bins.select(col("bin"), col("avg_y").as("cal"))), Seq("bin"), "left")
      .select(col(idCol), col("p"), col("bin"),
        coalesce(col("cal"), col("p")).as("p_cal"))
}
