package graft

import graft.operators.Ridge

class RidgeSpec extends SparkSpec {
  import spark.implicits._

  // y = 3 + 2*x1 - x2 exactly; x3 is constant (sd = 0, must be zeroed out)
  private def data = (1 to 200).map { i =>
    val x1 = (i % 17).toDouble
    val x2 = ((i * 7) % 11).toDouble
    (i.toLong, x1, x2, 5.0, 3.0 + 2.0 * x1 - x2)
  }.toDF("id", "x1", "x2", "x3", "y")

  test("recovers an exact linear relationship (R2 ~ 1) and is deterministic") {
    val fit1 = Ridge.fit(data, Seq("x1", "x2", "x3"), "y")
    val fit2 = Ridge.fit(data, Seq("x1", "x2", "x3"), "y")
    assert(fit1 == fit2, "two fits of the same data must be bit-identical")
    val pred = Ridge.predict(data, fit1, "id")
      .join(data.select($"id", $"y"), "id")
      .collect().map(r => (r.getAs[Double]("y"), r.getAs[Double]("yhat")))
    val sse = pred.map { case (y, yh) => (y - yh) * (y - yh) }.sum
    val mean = pred.map(_._1).sum / pred.length
    val sst = pred.map { case (y, _) => (y - mean) * (y - mean) }.sum
    assert(1.0 - sse / sst > 0.999, s"R2 = ${1.0 - sse / sst}")
  }

  test("constant feature gets weight through zeroed z, not a division by zero") {
    val fit = Ridge.fit(data, Seq("x1", "x2", "x3"), "y")
    assert(fit.sd(2) == 0.0)
    assert(!fit.weights.exists(_.isNaN))
    // x3 contributes nothing: its standardized column is identically zero
    assert(fit.weights(2) == 0.0, s"got ${fit.weights(2)}")
  }

  test("weightsDf carries the full model in rank order") {
    val fit = Ridge.fit(data, Seq("x1", "x2", "x3"), "y")
    val rows = Ridge.weightsDf(spark, fit).orderBy("i").collect()
    assert(rows.map(_.getAs[String]("feature")).toSeq == Seq("x1", "x2", "x3"))
    assert(rows.forall(r => r.getAs[Double]("y_sd") == fit.ySd))
  }

  // ---- Logit (the classifier twin) ---------------------------------------

  import graft.operators.Logit

  // linearly separable with margin: y = 1 iff 2*x1 - x2 > 10; x3 constant
  private def cls = (1 to 400).map { i =>
    val x1 = (i % 19).toDouble
    val x2 = ((i * 5) % 13).toDouble
    (i.toLong, x1, x2, 5.0, if (2.0 * x1 - x2 > 10.0) 1.0 else 0.0)
  }.toDF("id", "x1", "x2", "x3", "y")

  test("logit separates a margin-separable labeling, deterministically, order-free") {
    val fit1 = Logit.fit(cls, Seq("x1", "x2", "x3"), "y")
    val fit2 = Logit.fit(cls.repartition(7, $"x2"), Seq("x1", "x2", "x3"), "y")
    assert(fit1 == fit2, "the fit must be bit-identical under repartitioning")
    assert(fit1.sd(2) == 0.0 && fit1.weights(2) == 0.0,
      "constant feature must zero out, not NaN")
    val pred = Logit.predict(cls, fit1, "id")
      .join(cls.select($"id", $"y"), "id").collect()
    val acc = pred.count(r =>
      r.getAs[Boolean]("pred") == (r.getAs[Double]("y") == 1.0)).toDouble / pred.length
    assert(acc >= 0.95, s"separable data should classify cleanly, got $acc")
    // scores are valid probabilities under the algebraic sigmoid
    assert(pred.forall { r =>
      val p = r.getAs[Double]("p"); p >= 0.0 && p <= 1.0 })
  }

  test("Mann-Whitney AUC survives pair-count sums past the LONG envelope") {
    // Planted grouped counts (p, np, nn) whose concordant-pair credit
    // totals 2.0e19 — past Long.MaxValue (~9.22e18), where the pre-r12
    // LONG product-sum wrapped silently. The DECIMAL(38,0) accumulation
    // must return the exact hand-computed AUC:
    //   full = 4e9*4e9 + 4e9*1e9 = 2.0e19, ties = 1e9*1e9 = 1e18
    //   auc  = (2.0e19 + 0.5*1e18) / (5e9 * 5e9) = 0.82
    val grp = Seq(
      (0.1, 0L, 4000000000L),
      (0.2, 4000000000L, 0L),
      (0.3, 1000000000L, 1000000000L)).toDF("p", "np", "nn")
    val r = Logit.aucFromGroupedCounts(grp).head()
    assert(r.getAs[Long]("n_pos") == 5000000000L)
    assert(r.getAs[Long]("n_neg") == 5000000000L)
    assert(r.getAs[Double]("auc") == 0.82, s"got ${r.getAs[Double]("auc")}")
  }

  test("calibration bins + calibrated predict: p_cal is the bin's empirical rate") {
    val fit = Logit.fit(cls, Seq("x1", "x2", "x3"), "y")
    val pred = Logit.predict(cls, fit, "id")
      .join(cls.select($"id", $"y"), "id")
    val bins = Logit.calibrationBins(pred)
    val binRows = bins.collect().map(r =>
      r.getAs[Int]("bin") -> (r.getAs[Long]("n"), r.getAs[Double]("avg_y"))).toMap
    assert(binRows.values.map(_._1).sum == 400L, "bins partition the corpus")
    val cal = Logit.calibratedPredict(pred, bins, "id").collect()
    assert(cal.length == 400)
    cal.foreach { r =>
      val bin = math.min(math.floor(r.getAs[Double]("p") * 10).toInt, 9)
      assert(r.getAs[Int]("bin") == bin)
      assert(r.getAs[Double]("p_cal") == binRows(bin)._2,
        s"p_cal must be bin $bin's empirical positive rate")
    }
  }

  test("logit store round-trip scores bit-identically to the in-memory fit") {
    val path = java.nio.file.Files.createTempDirectory("graft_logit").toString + "/m"
    val fit = Logit.fit(cls, Seq("x1", "x2", "x3"), "y")
    Logit.saveModel(spark, fit, path)
    assert(Logit.loadModel(spark, path) == fit, "model must round-trip exactly")
    val direct = Logit.predict(cls, fit, "id").collect().map(_.toString).sorted.toSeq
    val stored = Logit.predictFromStore(cls, path, "id")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == direct)
  }
}
