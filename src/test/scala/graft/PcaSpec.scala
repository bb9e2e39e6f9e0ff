package graft

import graft.similarity.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors in 8 dims whose variance is concentrated on axis 0 (spread
  // +/-10) with small structured wiggle on axis 1 and constant elsewhere:
  // the dominant component is unambiguously e0.
  private def axisData = (0 until 40).map { i =>
    val a = if (i % 2 == 0) 10.0 + i * 0.01 else -10.0 - i * 0.01
    val b = if (i % 4 < 2) 0.5 else -0.5
    (i.toLong, Seq(a, b, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
  }.toDF("vec_id", "embedding")

  test("dominant component aligns with the max-variance axis, sign fixed positive") {
    val comps = Pca.fitComponents(axisData, p = 2, iters = 8, dim = 8)
      .collect().map(r => (r.getAs[Int]("comp"), r.getAs[Int]("dim")) ->
        (r.getAs[Double]("w"), r.getAs[Double]("eigval"), r.getAs[Double]("var_ratio"))).toMap
    assert(comps.size == 16)
    val (w00, eig0, vr0) = comps((0, 0))
    assert(math.abs(w00) > 0.999, s"expected |w| ~ 1 on axis 0, got $w00")
    assert(w00 > 0, "sign convention: the anchor coordinate is positive")
    assert(eig0 > 0 && vr0 > 0.99, s"axis 0 carries ~all variance, got ratio $vr0")
    // second component is orthogonal to the first: its axis-0 loading ~ 0
    assert(math.abs(comps((1, 0))._1) < 0.01)
  }

  test("fitted components are unit-norm and mutually near-orthogonal") {
    val comps = Pca.fitComponents(axisData, p = 3, iters = 8, dim = 8).collect()
      .groupBy(_.getAs[Int]("comp"))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("w"))
      }
    for (c <- comps.keys) {
      val n = math.sqrt(comps(c).map(w => w * w).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"component $c norm $n")
    }
    for (a <- comps.keys; b <- comps.keys if a < b) {
      val d = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d) < 0.02, s"components $a,$b dot $d")
    }
  }

  test("projection matches a driver-side quantized dot product") {
    val df = axisData
    val comps = Pca.fitComponents(df, p = 2, iters = 8, dim = 8).collect()
      .groupBy(_.getAs[Int]("comp"))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("w"))
      }
    val vecs = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val n = vecs.size.toDouble
    val mu = Array.tabulate(8)(i =>
      vecs.values.map(v => math.floor(v(i) * 1e8).toLong).sum.toDouble / n / 1e8)
    val got = Pca.project(df, dim = 8, p = 2, iters = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("comp")) ->
        r.getAs[Double]("proj")).toMap
    for (((id, c), proj) <- got) {
      val v = vecs(id)
      val want = (0 until 8).map(i =>
        math.floor((v(i) - mu(i)) * comps(c)(i) * 1e8).toLong).sum.toDouble / 1e8
      assert(proj == want, s"vec $id comp $c: $proj != $want")
    }
  }

  test("constant input degenerates safely: zero eigenvalues, no NaN, no throw") {
    val const = (0 until 10).map(i => (i.toLong, Seq.fill(8)(3.5))).toDF("vec_id", "embedding")
    val comps = Pca.fitComponents(const, p = 2, iters = 4, dim = 8).collect()
    assert(comps.length == 16)
    assert(comps.forall(r => r.getAs[Double]("eigval") == 0.0))
    assert(comps.forall(r => r.getAs[Double]("var_ratio") == 0.0))
    assert(comps.forall(r => !r.getAs[Double]("w").isNaN))
  }

  test("stored basis projects bit-identically, including unseen vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString + "/b"
    Pca.savePca(axisData, dim = 8, p = 2, iters = 8, dir)
    val fromStore = Pca.projectFromStore(axisData, dir)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("comp")) ->
        r.getAs[Double]("proj")).toMap
    val inMem = Pca.project(axisData, dim = 8, p = 2, iters = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("comp")) ->
        r.getAs[Double]("proj")).toMap
    assert(fromStore == inMem)
    // a vector the fit never saw projects against the FROZEN basis (no
    // refit): its axis-0 projection reflects its centered axis-0 value
    val unseen = Seq((999L, Seq(50.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val pu = Pca.projectFromStore(unseen, dir)
      .collect().map(r => r.getAs[Int]("comp") -> r.getAs[Double]("proj")).toMap
    assert(math.abs(math.abs(pu(0)) - 50.0) < 1.0, s"got ${pu(0)}")
  }

  test("momentSums fails loudly on a mixed-width feed instead of skewing the fit") {
    val mixed = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      (2L, Seq(1.0, 2.0, 3.0)) // wrong width
    ).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.momentSums(mixed, dim = 8).collect()
    }
    assert(e.getMessage.contains("expected 8-dim vector") ||
      Option(e.getCause).exists(_.getMessage.contains("expected 8-dim vector")),
      s"got: ${e.getMessage}")
    // and fitFromMoments names the mismatch when handed foreign moments
    val ok = Pca.momentSums(axisData, dim = 8)
    val e2 = intercept[IllegalArgumentException] {
      Pca.fitFromMoments(spark, ok, p = 2, iters = 4, dim = 16)
    }
    assert(e2.getMessage.contains("caller said 16"))
  }

  test("projectedVectors emits comp-ordered arrays with norms") {
    val pv = Pca.projectedVectors(axisData, dim = 8, p = 2, iters = 8)
    val row = pv.filter($"vec_id" === 0L).collect().head
    val arr = row.getSeq[Double](row.fieldIndex("pv"))
    assert(arr.length == 2)
    val pn = row.getAs[Double]("pn")
    assert(math.abs(pn - math.sqrt(arr.map(x => x * x).sum)) < 1e-12)
    assert(pv.count() == 40)
  }
}
