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
    */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          lr: Double = 0.5, lambda: Double = 0.001, iters: Int = 30): LogitFit = {
    val d = featureCols.size
    require(d >= 1, "need at least one feature")
    val n = df.count().toDouble
    require(n > 0, "need a non-empty training set")

    val meanRow = df.agg(qsum(col(featureCols.head)).as("q0"),
      featureCols.tail.zipWithIndex.map { case (c, i) => qsum(col(c)).as(s"q${i + 1}") }: _*)
      .head()
    val mus = featureCols.indices.map(i => qget(meanRow, s"q$i") / n / Q)
    def sq(c: Column) = c * c // x*x is IEEE-pinned; pow's libm rounding is not
    val varRow = df.agg(
      qsum(sq(col(featureCols.head) - mus.head)).as("q0"),
      featureCols.tail.zipWithIndex.map { case (c, i) =>
        qsum(sq(col(c) - mus(i + 1))).as(s"q${i + 1}")
      }: _*).head()
    val sds = featureCols.indices.map(i => math.sqrt(qget(varRow, s"q$i") / n / Q))

    val zdf = df.select(featureCols.indices.map(i =>
        zCol(col(featureCols(i)), mus(i), sds(i)).as(s"z$i")) :+
        col(labelCol).cast("double").as("y"): _*)
      .localCheckpoint(true)
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
}
