package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA over an embedding column — the linear-projection half of
  * the embedding-compression toolbox (alongside [[Similarity.quantizeInt8]]
  * and the PQ family): fit once, then every vector maps through a d x p
  * matrix to a p-dim representation for cheaper storage, search, and
  * clustering. Classic pipeline usage is PCA-then-quantize (the OPQ/IVF-PQ
  * literature's preprocessing step) and embedding whitening.
  *
  * Scale shape — the only data-sized passes are embarrassingly parallel:
  *
  *  1. per-dimension means: one posexplode + 64-group aggregate;
  *  2. Gram/covariance matrix: one n x d^2 flat-map into a d^2-group
  *     aggregate (map-side partial combine, ONE shuffle of 32 x 4096 tiny
  *     rows) — the only superlinear term, and it is the textbook
  *     data-parallel Gram reduction;
  *  3. eigensolve: on the DRIVER over the collected d x d matrix (4096
  *     doubles — bounded by construction, the [[Similarity.kmeansCentroids]]
  *     centroid-collect discipline), via power iteration with deflation;
  *  4. projection: map-only broadcast matrix multiply.
  *
  * Cross-engine exactness discipline (the house rule the k-means/PQ family
  * established): every sum whose addition order Spark cannot pin is summed
  * as `floor(x * 1e8)` BIGINT partials — means, Gram cells, every
  * matrix-vector product inside the power iteration, eigenvalues, and
  * projections — so DuckDB replays the whole fit bit-for-bit. Nonlinear
  * steps (normalize, round) happen on scalars AFTER the quantized sum.
  * Power iteration runs a FIXED iteration count: both engines execute the
  * same arithmetic whether or not the subspace has numerically converged,
  * so the oracle gate is exact even on worst-case spectra.
  */
object Pca {

  private val Q = 1e8

  /** One fitted principal component. `weights` is the signed, 6-round unit
    * vector; `eigval` the (quantized) Rayleigh quotient = variance along
    * the component; `varRatio` = eigval / trace(covariance).
    */
  final case class PcaComponent(comp: Int, weights: Seq[Double], eigval: Double,
                                varRatio: Double)

  private def r6(x: Double): Double = graft.core.Num.round6(x)

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Distributed pass 1+2: quantized per-dimension means and the centered
    * covariance matrix, collected to the driver. Returns (n, mu, cov) with
    * cov(i)(j) = sum_rows(floor((x_i - mu_i)(x_j - mu_j) * 1e8)) / n / 1e8.
    */
  private[graft] def covariance(vectors: DataFrame, dim: Int, idCol: String,
                                vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    // per-row width check, same fail-loudly rule as momentSums: the
    // distinct-dimension require below only catches a corpus whose WIDEST
    // vector mismatches `dim` — a mix of short vectors with one full-width
    // row would pass it and silently skew means/covariance (short rows
    // count in n but contribute nothing to their missing dims)
    val b = vectors.select(col(idCol),
      when(size(col(vecCol)) === dim, asDouble(col(vecCol)))
        .otherwise(raise_error(concat(
          lit(s"covariance: expected $dim-dim vector, got "),
          size(col(vecCol)).cast("string")))).as("v"))
    val n = b.count()
    require(n > 0, "PCA needs a non-empty vector set")
    val nD = n.toDouble
    // DECIMAL(38,0) accumulation (Ridge.qsum's rationale): per-term values
    // are exact integers, and the 38-digit accumulator removes the BIGINT
    // wrap at sum(|x|) ~ 9.2e10 — for unit-scale embeddings that bound was
    // ~9e10 rows, close enough to the "billions of vectors" envelope to
    // fix rather than document. DuckDB accumulates BIGINT sums in HUGEINT,
    // so the engines agree wherever either is in range. momentSums stays
    // BIGINT deliberately: its `q` column is the persisted/streamed store
    // contract (see its scaladoc envelope).
    val muRows = b.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(floor(col("x") * Q).cast("decimal(38,0)")).as("sq"))
      .collect()
    // one group per ACTUAL dimension: a mismatched `dim` would otherwise
    // crash on the fill (longer vectors) or silently pad the basis with
    // zero rows/columns (shorter) — fail loudly instead
    require(muRows.length == dim,
      s"vectors have ${muRows.length} dimensions, caller said $dim")
    val mu = Array.ofDim[Double](dim)
    muRows.foreach(r =>
      mu(r.getAs[Int]("i")) = r.getAs[java.math.BigDecimal]("sq").doubleValue / nD / Q)
    val muLit = array(mu.map(lit): _*)
    // centered array: the lambda reads the scan column + a literal — both
    // O(1) per element, no computed-child recompute risk (LambdaRecomputeSpec
    // pattern notes; contrast TextOps.removeDuplicatedSpans' r8 pathology)
    val cb = b.select(transform(col("v"),
      (x, i) => x - element_at(muLit, (i + 1).cast("int"))).as("cv"))
    val gRows = cb.select(col("cv"), posexplode(col("cv")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("cv")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(floor(col("xi") * col("xj") * Q).cast("decimal(38,0)")).as("gq"))
      .collect()
    val g = Array.ofDim[Double](dim, dim)
    gRows.foreach { r =>
      g(r.getAs[Int]("i"))(r.getAs[Int]("j")) =
        r.getAs[java.math.BigDecimal]("gq").doubleValue / nD / Q
    }
    (n, mu, g)
  }

  /** Driver-side eigensolve: `p` rounds of fixed-`iters` power iteration,
    * each followed by Hotelling deflation of the found component. All inner
    * sums quantize to the 1e-8 grid; iterate vectors are re-rounded to 6
    * decimals each step so the growing expression stays engine-mirrorable.
    * The returned weights carry a deterministic sign: the largest-|w|
    * coordinate (ties -> lowest index) is made positive.
    */
  private[graft] def powerIteration(g0: Array[Array[Double]], p: Int,
                                    iters: Int): Seq[PcaComponent] = {
    val dim = g0.length
    val traceQ = (0 until dim).map(i => math.floor(g0(i)(i) * Q).toLong).sum
    val trace = traceQ.toDouble / Q
    var g = g0.map(_.clone())
    (0 until p).map { c =>
      // one-hot start e_{c mod d}: an all-ones start collapses after the
      // first deflation kills the ones-aligned direction (measured: the
      // iterate's quantized norm hits 0 at sf0.1), while distinct axis
      // starts keep every component's iteration well-conditioned
      var x = Array.tabulate(dim)(i => if (i == c % dim) 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val y = Array.tabulate(dim) { i =>
          var acc = 0L
          var j = 0
          while (j < dim) { acc += math.floor(g(i)(j) * x(j) * Q).toLong; j += 1 }
          acc.toDouble / Q
        }
        val nq = y.map(v => math.floor(v * v * Q).toLong).sum
        val nrm = math.sqrt(nq.toDouble / Q)
        // degenerate-subspace guard (engine-mirrored): a zero quantized
        // norm keeps the previous iterate instead of dividing by zero
        if (nrm != 0.0) x = y.map(v => r6(v / nrm))
      }
      var lamQ = 0L
      for (i <- 0 until dim; j <- 0 until dim)
        lamQ += math.floor(g(i)(j) * x(i) * x(j) * Q).toLong
      val lam = lamQ.toDouble / Q
      // deflate with the UNSIGNED iterate (x x^T is sign-invariant anyway)
      g = Array.tabulate(dim, dim) { (i, j) =>
        g(i)(j) - math.floor(lam * x(i) * x(j) * Q).toLong / Q
      }
      val anchor = (0 until dim).maxBy(i => (math.abs(x(i)), -i))
      val sgn = if (x(anchor) < 0) -1.0 else 1.0
      // constant input -> zero covariance -> trace 0: report 0 explained
      // variance instead of propagating 0/0 NaN into the rounding
      val vr = if (trace == 0.0) 0.0 else r6(lam / trace)
      PcaComponent(c, x.map(_ * sgn).toSeq, r6(lam), vr)
    }
  }

  /** Fit `p` principal components of the embedding column. Output one row
    * per (comp, dim): the long-form loading matrix plus per-component
    * eigenvalue and explained-variance ratio.
    */
  def fitComponents(vectors: DataFrame, p: Int, iters: Int, dim: Int = 64,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val (_, _, g) = covariance(vectors, dim, idCol, vecCol)
    val comps = powerIteration(g, p, iters)
    val rows = for (cp <- comps; i <- 0 until dim)
      yield Row(cp.comp, i, cp.weights(i), cp.eigval, cp.varRatio)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("comp", IntegerType, nullable = false),
        StructField("dim", IntegerType, nullable = false),
        StructField("w", DoubleType, nullable = false),
        StructField("eigval", DoubleType, nullable = false),
        StructField("var_ratio", DoubleType, nullable = false))))
  }

  /** Map-only projection of every vector onto the fitted components:
    * center, then per (vector, component) a quantized dot product. Long
    * form (idCol, comp, proj); the loading matrix broadcasts.
    */
  def project(vectors: DataFrame, dim: Int, p: Int, iters: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val (_, mu, g) = covariance(vectors, dim, idCol, vecCol)
    val comps = powerIteration(g, p, iters)
    projectWith(vectors, mu, comps, idCol, vecCol)
  }

  private[graft] def projectWith(vectors: DataFrame, mu: Array[Double],
                                 comps: Seq[PcaComponent], idCol: String,
                                 vecCol: String): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val muLit = array(mu.map(lit): _*)
    val compDf = broadcast(
      comps.flatMap(cp => cp.weights.zipWithIndex.map { case (w, i) => (cp.comp, i, w) })
        .toDF("comp", "i", "w"))
    vectors.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .select(col(idCol), posexplode(col("v")).as(Seq("i", "x")))
      .withColumn("cx", col("x") - element_at(muLit, (col("i") + 1).cast("int")))
      .join(compDf, "i")
      .groupBy(col(idCol), col("comp"))
      .agg(sum(floor(col("cx") * col("w") * Q).cast("long")).as("pq"))
      // no round(): the quantized sum already lands both engines on the
      // same double, and round-half edges at 1e-6 are where they disagree
      .select(col(idCol), col("comp"), (col("pq") / Q).as("proj"))
  }

  /** The projected corpus in vector form: (idCol, pv array<double>, pn norm)
    * — ready for cosine search in the compressed space.
    */
  def projectedVectors(vectors: DataFrame, dim: Int, p: Int, iters: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    project(vectors, dim, p, iters, idCol, vecCol)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("comp"), col("proj")))).as("ps"))
      .select(col(idCol), col("ps.proj").as("pv"))
      .withColumn("pn", sqrt(graft.expressions.DotProduct(col("pv"), col("pv"))))

  /** Raw (uncentered) quantized moment sums — the STREAMABLE fit state:
    * count, per-dim first moments, and the d x d second-moment matrix, all
    * plain BIGINT sums, so any partition of the corpus accumulates to the
    * identical table (the LM-count additivity argument) and a streaming
    * maintainer can grow the state with ledgered SUM-merges. Long form:
    * (i, j, q) — (i, -1) rows are first moments, (-1, -1) is the count.
    *
    * ACCUMULATOR ENVELOPE: `q` stays BIGINT because it is the persisted /
    * stream-merged store schema (q152/q153 and the streaming maintainer
    * read and SUM-merge it). That bounds the valid corpus at
    * n * E[|x_i|] < ~9.2e10 for first moments and n * E[x_i x_j] < ~9.2e10
    * for second moments — for unit-scale embeddings, ~1e10-1e11 vectors
    * per store generation. Beyond that, shard the store (the moments are
    * additive by construction, so per-shard tables merge in a wider type
    * at fit time); covariance()/Ridge, which have no persistence contract,
    * already accumulate DECIMAL(38,0). The accumulation HERE lands as
    * BIGINT only behind [[guardedLand]]'s envelope check (a parallel
    * double check-sum — exact enough for the 4x guard headroom at
    * native-sum cost), so a single oversized micro-batch raises loudly
    * instead of handing the store or [[mergeMoments]] a silently-wrapped
    * cell.
    */
  def momentSums(vectors: DataFrame, dim: Int = 64,
                 vecCol: String = "embedding"): DataFrame = {
    // per-row dimensionality check AT SCAN TIME: a mixed-width feed would
    // otherwise accumulate silently-skewed moments (short vectors count in
    // n but contribute nothing to their missing dims) — the covariance
    // path's fail-loudly rule, enforced row-by-row here because the
    // moments are lazy and streamed
    val b = vectors.select(
      when(size(col(vecCol)) === dim, asDouble(col(vecCol)))
        .otherwise(raise_error(concat(
          lit(s"momentSums: expected $dim-dim vector, got "),
          size(col(vecCol)).cast("string")))).as("v"))
    // the LONG sums land BEHIND an envelope guard driven by a PARALLEL
    // DOUBLE check-sum of the same terms (see [[guardedLand]]): the landed
    // value stays the codegen'd native LONG accumulation (this aggregation
    // is n x d^2 rows — the engine's hottest moment path; a DECIMAL(38,0)
    // accumulator here measured ~7x slower on q152's 8M-row aggregate),
    // while the double twin detects envelope proximity far more precisely
    // than the 4x guard headroom needs, so a single oversized micro-batch
    // raises loudly and no under-guard wrapped value can ever land — the
    // sketch ledgeredSumMerge writes as a first store generation included
    val ex = b.select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
    val m2 = ex.select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(floor(col("xi") * col("xj") * Q).cast("long")).as("ql"),
        sum(floor(col("xi") * col("xj") * Q).cast("double")).as("qd"))
      .select(col("i"), col("j"), guardedLand(col("ql"), col("qd"), col("i"), col("j")).as("q"))
    val m1 = b.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(floor(col("x") * Q).cast("long")).as("ql"),
        sum(floor(col("x") * Q).cast("double")).as("qd"))
      .select(col("i"), lit(-1).as("j"),
        guardedLand(col("ql"), col("qd"), col("i"), lit(-1)).as("q"))
    val cnt = b.agg(count(lit(1)).as("q"))
      .select(lit(-1).as("i"), lit(-1).as("j"), col("q"))
    m2.select(col("i"), col("j"), col("q")).unionByName(m1).unionByName(cnt)
  }

  /** Merge-time envelope guard threshold: Long.MaxValue/4 leaves 4x
    * headroom, so two stores EACH at the guard still SUM-merge without
    * wrapping (2 x 2.3e18 < 9.2e18) — the raise always fires before any
    * silent wraparound is arithmetically possible.
    */
  private[graft] val momentGuardQ: Long = Long.MaxValue / 4

  /** Envelope-guarded BIGINT landing for an exact DECIMAL(38,0) moment
    * accumulation: a value under [[momentGuardQ]] passes through unchanged
    * (decimal -> long is exact there, so store hashes are unaffected); at
    * or above it the cell raises with the sharding remedy. Used by
    * [[mergeMoments]] (store merges are d^2-row tables, where the decimal
    * accumulator's cost is irrelevant and its exactness is free).
    */
  private def guardedQ(qm: Column, i: Column, j: Column): Column =
    when(abs(qm) < lit(momentGuardQ), qm)
      .otherwise(raiseEnvelope(i, j).cast("decimal(38,0)"))
      .cast("long")

  /** Envelope-guarded BIGINT landing for the DATA-SIZED accumulation in
    * [[momentSums]]: the landed value is the codegen'd native LONG sum
    * `ql`; the gate compares a PARALLEL DOUBLE sum `qd` of the same terms
    * against [[momentGuardQ]]. The double twin cannot wrap and tracks the
    * true total to ~1 ulp per term (relative error <= n*2^-52 — even at
    * 1e12 rows that is ~2e-4, orders of magnitude finer than the 4x
    * headroom the guard threshold leaves before a LONG can actually
    * wrap at ~9.2e18), so the raise always fires before any silent
    * wraparound is arithmetically possible, at native-sum cost — a
    * DECIMAL(38,0) accumulator here measured ~7x slower on the n x d^2
    * hot path.
    */
  private def guardedLand(ql: Column, qd: Column, i: Column, j: Column): Column =
    when(abs(qd) < lit(momentGuardQ.toDouble), ql)
      .otherwise(raiseEnvelope(i, j).cast("long"))

  private def raiseEnvelope(i: Column, j: Column): Column =
    raise_error(concat(
      lit("momentSums envelope exceeded at cell ("),
      i.cast("string"), lit(","), j.cast("string"),
      lit("): |q| >= Long.MaxValue/4 — shard the moment store and "
        + "merge shards in a wider type at fit time (moments are "
        + "additive by construction)")))

  /** SUM-merge two moment tables (the streaming maintainer's combine).
    *
    * LOUD ENVELOPE GUARD: `q` is BIGINT by persisted-store contract (see
    * [[momentSums]]' ACCUMULATOR ENVELOPE), and the streaming maintainer
    * ([[graft.streaming.StreamingPipeline.pcaMomentsBatch]]) accumulates
    * it unboundedly — at 100 TB a store generation can genuinely approach
    * the ~9.2e18 Long range. Any merged cell whose |q| crosses
    * [[momentGuardQ]] raises AT MERGE TIME with the remedy in the message
    * (shard the store; moments are additive, shards merge in a wider type
    * at fit time), so a long-running stream fails loudly instead of
    * wrapping silently. Values under the guard pass through unchanged, so
    * the q153 oracle hash is unaffected.
    */
  def mergeMoments(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("i"), col("j"))
      // the merge sum itself runs in DECIMAL(38,0): with a LONG sum an
      // input cell already past the envelope (possible only for a store
      // written before the momentSums guard existed) could wrap before the
      // guard evaluates — in decimal the guard always sees the true value
      .agg(sum(col("q").cast("decimal(38,0)")).as("qm"))
      .select(col("i"), col("j"), guardedQ(col("qm"), col("i"), col("j")).as("q"))

  /** Fit components FROM accumulated moments: mu_i = S1_i/n/1e8 and
    * cov_ij = M2_ij/n/1e8 - mu_i*mu_j — a different (but equally pinned)
    * derivation than [[covariance]]'s centered floor-sums, chosen because
    * it is ADDITIVE; the q152 oracle replays exactly this formula. The
    * eigensolve and output shape are [[fitComponents]]'.
    */
  def fitFromMoments(spark: SparkSession, moments: DataFrame, p: Int, iters: Int,
                     dim: Int = 64): DataFrame = {
    val rows = moments.collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Long]("q")).toMap
    val n = rows.getOrElse((-1, -1),
      throw new IllegalArgumentException("moments table has no count row")).toDouble
    require(n > 0, "PCA needs a non-empty vector set")
    // clear mismatch error instead of a bare key-not-found on the fill
    val dims = rows.keysIterator.collect { case (i, -1) if i >= 0 => i }.toSet
    require(dims == (0 until dim).toSet,
      s"moments cover dimensions ${dims.toSeq.sorted.mkString(",")}, caller said $dim")
    val mu = Array.tabulate(dim)(i => rows((i, -1)).toDouble / n / Q)
    val g = Array.tabulate(dim, dim) { (i, j) =>
      rows((i, j)).toDouble / n / Q - mu(i) * mu(j)
    }
    val comps = powerIteration(g, p, iters)
    val out = for (cp <- comps; i <- 0 until dim)
      yield Row(cp.comp, i, cp.weights(i), cp.eigval, cp.varRatio)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField("comp", IntegerType, nullable = false),
        StructField("dim", IntegerType, nullable = false),
        StructField("w", DoubleType, nullable = false),
        StructField("eigval", DoubleType, nullable = false),
        StructField("var_ratio", DoubleType, nullable = false))))
  }

  /** Fit-once half of the PCA artifact (the persisted-index treatment the
    * IVF/LSH/PQ/LM/vocab families get): land the centering means and the
    * loading matrix as parquet under `path` —
    *
    *  - `means/` — (i, m), dim rows;
    *  - `components/` — (comp, dim, w, eigval, var_ratio), p x dim rows.
    *
    * The expensive pass (the n x d^2 Gram reduction) is paid here once;
    * [[projectFromStore]] is then a pure map over any vector set — new
    * arrivals project against the frozen basis without refitting, exactly
    * how production embedding-compression runs (and the precondition for
    * composing PCA with the PQ family, whose codebooks would be fit in the
    * projected space). Writes are tiny (dim + p*dim rows, coalesce(1)).
    */
  def savePca(vectors: DataFrame, dim: Int, p: Int, iters: Int, path: String,
              idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val (_, mu, g) = covariance(vectors, dim, idCol, vecCol)
    val comps = powerIteration(g, p, iters)
    mu.toSeq.zipWithIndex.map { case (m, i) => (i, m) }.toDF("i", "m")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/means")
    comps.flatMap(cp => cp.weights.zipWithIndex.map { case (w, i) =>
        (cp.comp, i, w, cp.eigval, cp.varRatio)
      }).toDF("comp", "dim", "w", "eigval", "var_ratio")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/components")
  }

  /** Load the stored basis (bounded: dim + p*dim rows). */
  def loadPca(spark: SparkSession, path: String): (Array[Double], Seq[PcaComponent]) = {
    val muRows = spark.read.parquet(s"$path/means").collect()
    val mu = Array.ofDim[Double](muRows.length)
    muRows.foreach(r => mu(r.getAs[Int]("i")) = r.getAs[Double]("m"))
    val comps = spark.read.parquet(s"$path/components").collect()
      .groupBy(_.getAs[Int]("comp")).toSeq.sortBy(_._1)
      .map { case (c, rows) =>
        val sorted = rows.sortBy(_.getAs[Int]("dim"))
        PcaComponent(c, sorted.map(_.getAs[Double]("w")).toSeq,
          sorted.head.getAs[Double]("eigval"), sorted.head.getAs[Double]("var_ratio"))
      }
    (mu, comps)
  }

  /** Apply-many half: project any vector set against the stored basis —
    * map-only, no refit, bit-identical to [[project]] over the fit corpus
    * (the q143 gate's contract).
    */
  def projectFromStore(vectors: DataFrame, path: String,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (mu, comps) = loadPca(vectors.sparkSession, path)
    projectWith(vectors, mu, comps, idCol, vecCol)
  }
}
