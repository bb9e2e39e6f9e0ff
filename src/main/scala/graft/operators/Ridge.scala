package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed ridge regression — the supervised member of the
  * fit-on-aggregates family ([[graft.similarity.Pca]]'s discipline applied
  * to a labeled problem): the data-sized work is THREE bounded aggregation
  * passes (quantized means, variances, then the d x d standardized moment
  * matrix + moment vector), the solve is a fixed-count gradient iteration
  * on the driver over d x d numbers, and prediction is map-only. A
  * training-data pipeline uses exactly this shape for quality scorers and
  * length/cost models where d is tens of features and n is billions of
  * rows — n never touches the driver, d never touches a shuffle.
  *
  * Cross-engine exactness (the PCA/PQ house rule): every data-sized sum is
  * `floor(x * 1e8)` BIGINT partials; standardization divides by
  * sqrt(quantized variance) — scalar, deterministic; the gradient loop
  * quantizes its matvec and re-rounds the iterate to 6 decimals each step;
  * and features standardize to ~unit scale FIRST, so the normal-equations
  * matrix is near-correlation (eigenvalues ~1) and 30 rounds at lr 0.9
  * land on the closed-form solution to 4+ decimals (measured R2 equals the
  * exact solve's at 1e-4). DuckDB replays the whole fit.
  */
object Ridge {

  private val Q = 1e8

  private def r6(x: Double): Double = graft.core.Num.round6(x)

  /** A fitted model: per-feature standardization (mu, sd) + standardized-
    * space weights, and the label's (mu, sd). sd of 0 (constant column)
    * zeroes the feature instead of dividing by it.
    */
  final case class RidgeFit(features: Seq[String], mu: Seq[Double], sd: Seq[Double],
                            yMu: Double, ySd: Double, weights: Seq[Double])

  /** Quantized-partial sum, accumulated as DECIMAL(38,0): per-term values
    * are exact integers (|x| < 2^53/1e8 per term — the floor-on-double
    * envelope), and a 38-digit accumulator keeps the advertised
    * "n is billions of rows" honest — a BIGINT accumulator silently wraps
    * once sum(|x|) exceeds ~9.2e10 (raw labels like n_chars hit that at
    * ~1e7 rows). DuckDB's oracle side already accumulates BIGINT sums in
    * HUGEINT, so the engines agree wherever either is in range.
    */
  private def qsum(c: org.apache.spark.sql.Column) =
    sum(floor(c * Q).cast("decimal(38,0)"))

  /** Read a qsum cell back as the exact integer it holds, as Double. */
  private def qget(row: Row, name: String): Double =
    row.getAs[java.math.BigDecimal](name).doubleValue

  /** Standardized column for feature i under the fitted moments. */
  private def zCol(c: org.apache.spark.sql.Column, mu: Double, sd: Double) =
    if (sd == 0.0) lit(0.0) else (c - lit(mu)) / lit(sd)

  /** Fit: three aggregation passes + a driver gradient loop.
    *
    * The input is PROJECTED to (features, label) and checkpointed FIRST
    * (r18, guide §1.2 — the [[Logit.fit]] treatment): count, the mean/var
    * passes, and the moment pass previously each recomputed the caller's
    * frame, which for the pipeline queries is a full text-feature pass
    * over the corpus — so one fit paid the corpus four times. The three
    * aggregation passes then run over a size-coalesced view of the
    * checkpoint (partition count derived from n x row width, so tiny
    * frames stop scheduling one task per original partition while a
    * 100 TB frame keeps its parallelism). Quantized partials are exact
    * integers summed in DECIMAL(38,0) — commutative and associative — so
    * neither the checkpoint nor the coalesce can move a learned weight.
    */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          lambda: Double = 0.001, lr: Double = 0.9, iters: Int = 30): RidgeFit = {
    val d = featureCols.size
    require(d >= 1, "need at least one feature")
    val cols = featureCols :+ labelCol
    val ckpt = df.select(cols.map(col): _*).localCheckpoint(true)
    val n = ckpt.count().toDouble
    require(n > 0, "need a non-empty training set")
    val base = graft.core.Par.sizeCoalesced(ckpt, n.toLong, 8L * (d + 1))

    val meanRow = base.agg(qsum(col(cols.head)).as("q0"),
      cols.tail.zipWithIndex.map { case (c, i) => qsum(col(c)).as(s"q${i + 1}") }: _*).head()
    val mus = cols.indices.map(i => qget(meanRow, s"q$i") / n / Q)

    // squared via explicit multiply, not pow(): x*x is pinned by IEEE 754,
    // pow's libm rounding is not
    def sq(c: org.apache.spark.sql.Column) = c * c
    val varRow = base.agg(
      qsum(sq(col(cols.head) - mus.head)).as("q0"),
      cols.tail.zipWithIndex.map { case (c, i) =>
        qsum(sq(col(c) - mus(i + 1))).as(s"q${i + 1}")
      }: _*).head()
    val sds = cols.indices.map(i => math.sqrt(qget(varRow, s"q$i") / n / Q))

    val zs = featureCols.indices.map(i => zCol(col(featureCols(i)), mus(i), sds(i)))
    val zy = zCol(col(labelCol), mus(d), sds(d))
    val momentAggs =
      (for (i <- 0 until d; j <- i until d)
        yield qsum(zs(i) * zs(j)).as(s"a_${i}_$j")) ++
      (0 until d).map(i => qsum(zs(i) * zy).as(s"b_$i"))
    val mRow = base.agg(momentAggs.head, momentAggs.tail: _*).head()
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val v = qget(mRow, s"a_${i}_$j") / n / Q
      a(i)(j) = v; a(j)(i) = v
    }
    val b = Array.tabulate(d)(i => qget(mRow, s"b_$i") / n / Q)

    var w = Array.fill(d)(0.0)
    for (_ <- 0 until iters) {
      val aw = Array.tabulate(d) { i =>
        var acc = 0L; var j = 0
        while (j < d) { acc += math.floor(a(i)(j) * w(j) * Q).toLong; j += 1 }
        acc.toDouble / Q
      }
      w = Array.tabulate(d)(i => r6(w(i) - lr * (aw(i) - b(i) + lambda * w(i))))
    }
    RidgeFit(featureCols, mus.take(d), sds.take(d), mus(d), sds(d), w.toSeq)
  }

  /** The fitted model as a table: one row per feature
    * (i, feature, w, mu, sd) plus the label stats repeated — the shape the
    * oracle replays and [[graft.similarity.Pca.savePca]]-style persistence
    * would land.
    */
  def weightsDf(spark: SparkSession, fit: RidgeFit): DataFrame = {
    val rows = fit.features.indices.map(i =>
      Row(i, fit.features(i), fit.weights(i), fit.mu(i), fit.sd(i), fit.yMu, fit.ySd))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("i", IntegerType, nullable = false),
        StructField("feature", StringType, nullable = false),
        StructField("w", DoubleType, nullable = false),
        StructField("mu", DoubleType, nullable = false),
        StructField("sd", DoubleType, nullable = false),
        StructField("y_mu", DoubleType, nullable = false),
        StructField("y_sd", DoubleType, nullable = false))))
  }

  /** Persist the fitted model ([[weightsDf]]'s table IS the artifact —
    * one row per feature carries everything needed to score: w, mu, sd and
    * the label stats). The [[graft.similarity.Pca.savePca]] treatment:
    * train once on the big corpus, score any table from the store.
    */
  def saveModel(spark: SparkSession, fit: RidgeFit, path: String): Unit =
    weightsDf(spark, fit).coalesce(1).write.mode("overwrite").parquet(path)

  /** Load the stored model (bounded collect: d rows). */
  def loadModel(spark: SparkSession, path: String): RidgeFit = {
    val rows = spark.read.parquet(path).orderBy("i").collect()
    require(rows.nonEmpty, s"no ridge model at $path")
    RidgeFit(
      rows.map(_.getAs[String]("feature")).toSeq,
      rows.map(_.getAs[Double]("mu")).toSeq,
      rows.map(_.getAs[Double]("sd")).toSeq,
      rows.head.getAs[Double]("y_mu"), rows.head.getAs[Double]("y_sd"),
      rows.map(_.getAs[Double]("w")).toSeq)
  }

  /** Score from the stored model — bit-identical to [[predict]] with the
    * in-memory fit (the q150 gate's contract).
    */
  def predictFromStore(df: DataFrame, path: String, idCol: String): DataFrame =
    predict(df, loadModel(df.sparkSession, path), idCol)

  /** Map-only prediction: yhat = y_mu + y_sd * sum_i(w_i * z_i), the inner
    * sum as quantized integer partials so both engines land on the same
    * double.
    */
  def predict(df: DataFrame, fit: RidgeFit, idCol: String): DataFrame = {
    val terms = fit.features.indices.map { i =>
      floor(zCol(col(fit.features(i)), fit.mu(i), fit.sd(i)) * fit.weights(i) * Q)
        .cast("long")
    }
    val s = terms.reduce(_ + _).cast("double") / Q
    df.select(col(idCol), (lit(fit.yMu) + lit(fit.ySd) * s).as("yhat"))
  }
}
