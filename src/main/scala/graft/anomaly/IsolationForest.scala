package graft.anomaly

import scala.util.Random

/** Deterministic isolation forest (SURVEY.md M4).
  *
  * The reference scores per-series feature matrices with sklearn's
  * IsolationForest (`backend/app/services/anomaly_iforest.py:8-47`,
  * n_estimators=100, contamination=0.05, random_state=42). sklearn bit-parity
  * is not attainable, so this implements the original iForest algorithm
  * (Liu/Ting/Zhou 2008: random feature, random split, path-length scoring)
  * with a fixed seed; tests assert behavior (spike flagged, contamination
  * honored, determinism), not sklearn's exact scores — the reference's own
  * tests do the same.
  *
  * Scale design: series are tiny (the reference caps at 10k points,
  * `routers/anomaly_iforest.py:60`), so one model fits per (source, metric)
  * group inside `flatMapGroups` — thousands of series train in parallel
  * across executors, no driver loop.
  */
class IsolationForest(numTrees: Int = 100, sampleSize: Int = 256, seed: Long = 42L) {

  private sealed trait Node
  private case class Leaf(size: Int) extends Node
  private case class Split(feature: Int, value: Double, lo: Node, hi: Node) extends Node

  private var trees: Seq[Node] = Nil
  private var cN: Double = 1.0

  /** Average unsuccessful-search path length in a BST of n nodes. */
  private def c(n: Int): Double =
    if (n <= 1) 0.0 else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  /** Builds over idx[from, until) with in-place two-pointer partitioning —
    * zero allocation per node (the old per-node `rows.partition` dominated
    * fit time across 100 trees x thousands of series). Partitioning draws no
    * randomness and splits depend only on value SETS, so trees (and scores)
    * are bit-identical to the allocating version.
    */
  private def build(x: Array[Array[Double]], idx: Array[Int], from: Int, until: Int,
                    depth: Int, maxDepth: Int, rng: Random): Node = {
    val len = until - from
    if (len <= 1 || depth >= maxDepth) Leaf(len)
    else {
      val d = x(idx(from)).length
      // one min/max pass over all features; features with spread only —
      // a constant matrix isolates nothing
      val mins = new Array[Double](d)
      val maxs = new Array[Double](d)
      var f = 0
      while (f < d) { mins(f) = x(idx(from))(f); maxs(f) = mins(f); f += 1 }
      var i = from + 1
      while (i < until) {
        val r = x(idx(i))
        f = 0
        while (f < d) {
          if (r(f) < mins(f)) mins(f) = r(f)
          if (r(f) > maxs(f)) maxs(f) = r(f)
          f += 1
        }
        i += 1
      }
      val candidates = (0 until d).filter(f => maxs(f) > mins(f))
      if (candidates.isEmpty) Leaf(len)
      else {
        val feat = candidates(rng.nextInt(candidates.length))
        val v = mins(feat) + rng.nextDouble() * (maxs(feat) - mins(feat))
        var lo = from
        var hi = until - 1
        while (lo <= hi) {
          if (x(idx(lo))(feat) < v) lo += 1
          else { val t = idx(lo); idx(lo) = idx(hi); idx(hi) = t; hi -= 1 }
        }
        if (lo == from || lo == until) Leaf(len)
        else Split(feat, v, build(x, idx, from, lo, depth + 1, maxDepth, rng),
          build(x, idx, lo, until, depth + 1, maxDepth, rng))
      }
    }
  }

  def fit(x: Array[Array[Double]]): this.type = {
    val rng = new Random(seed)
    val n = math.min(sampleSize, x.length)
    cN = c(n)
    val maxDepth = math.ceil(math.log(math.max(n, 2)) / math.log(2)).toInt
    trees = (0 until numTrees).map { _ =>
      // seeded Fisher-Yates over an index array (no boxed Vector shuffle)
      val idx = Array.tabulate(x.length)(identity)
      var j = x.length - 1
      while (j > 0) {
        val k = rng.nextInt(j + 1)
        val t = idx(j); idx(j) = idx(k); idx(k) = t
        j -= 1
      }
      build(x, idx, 0, n, 0, maxDepth, rng)
    }
    this
  }

  private def pathLength(row: Array[Double], node: Node, depth: Int): Double = node match {
    case Leaf(size) => depth + c(size)
    case Split(f, v, lo, hi) =>
      if (row(f) < v) pathLength(row, lo, depth + 1) else pathLength(row, hi, depth + 1)
  }

  /** Anomaly score in (0, 1]; higher = more anomalous (2^(-E[h]/c(n))). */
  def anomalyScore(row: Array[Double]): Double = {
    val eh = trees.map(t => pathLength(row, t, 0)).sum / trees.length
    math.pow(2.0, -eh / math.max(cN, 1e-12))
  }

  /** sklearn-like decision surface: higher = more normal (0.5 - anomaly). */
  def decisionScore(row: Array[Double]): Double = 0.5 - anomalyScore(row)
}

object IsolationForest {

  /** Score a feature matrix and flag the top `contamination` fraction as
    * outliers (ties broken by row order, matching a stable argsort).
    * Returns (score, isOutlier) per row; < 5 rows => all inliers
    * (`routers/anomaly_iforest.py` small-sample bail).
    */
  def scoreMatrix(x: Array[Array[Double]], contamination: Double = 0.05,
                  numTrees: Int = 100, seed: Long = 42L): Array[(Double, Boolean)] =
    scoreMatrixMulti(x, Seq(contamination), numTrees, seed) match {
      case (scores, flags) => scores.zip(flags.head)
    }

  /** One fit, many contamination cuts: scores depend only on the forest, so
    * flagging at several contamination levels needs no refit. Returns the
    * shared score vector plus one flag vector per requested contamination
    * (same order). < 5 rows => the small-sample bail for every cut.
    */
  def scoreMatrixMulti(x: Array[Array[Double]], contaminations: Seq[Double],
                       numTrees: Int = 100, seed: Long = 42L)
      : (Array[Double], Seq[Array[Boolean]]) = {
    if (x.length < 5)
      return (x.map(_ => 0.5), contaminations.map(_ => x.map(_ => false)))
    val forest = new IsolationForest(numTrees = numTrees, seed = seed).fit(x)
    val scores = x.map(forest.decisionScore)
    val order = scores.zipWithIndex.sortBy { case (s, i) => (s, i) }.map(_._2)
    val flagSets = contaminations.map { c =>
      val nOut = math.max(0, math.round(c * x.length).toInt)
      val flags = new Array[Boolean](x.length)
      order.take(nOut).foreach(flags(_) = true)
      flags
    }
    (scores, flagSets)
  }
}
