package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Trainable quality classifier — logistic regression by DISTRIBUTED
  * batch gradient descent over the cheap per-doc text features, the
  * "distill the heuristic gate into a model" pattern a curation
  * pipeline uses when the gold rule is too slow (an LLM judge, a human
  * sample) or should generalize past its exact inputs. Here the gate
  * being distilled is [[TextOps.qualityScore]] ≥ threshold, which makes
  * the whole exercise verifiable: labels are deterministic, and the
  * learned separator must recover them almost exactly.
  *
  * 100 TB shape: the featurized corpus (label + 5 standardized doubles
  * per doc) is computed in ONE scan and cached; each GD iteration is
  * one map-side-combined aggregate over it (6 partial sums), with the
  * weight vector living driver-side as control-plane data — k
  * iterations = k cheap aggregate jobs over a narrow cached frame,
  * never k scans of the raw corpus. Scoring is a pure broadcast
  * expression (weights are literals in the plan), zero-shuffle.
  */
object QualityClassifier {

  /** Learned model: weights over STANDARDIZED features + the
    * standardization constants, so scoring bakes the whole chain into
    * one expression.
    */
  final case class Model(featureNames: Seq[String], weights: Seq[Double],
                         bias: Double, means: Seq[Double],
                         scales: Seq[Double])

  private def rawFeatures(text: Column): Seq[(String, Column)] = {
    val base = TextOps.qualityFeatures(text).map { case (n, c) =>
      // degenerate docs (no tokens): Spark's non-ANSI x/0 is NULL (not
      // NaN — nanvl alone never fires), so guard BOTH or the row is
      // silently dropped from training and predict returns NULL
      n -> coalesce(nanvl(c.cast("double"), lit(0.0)), lit(0.0))
    }
    val m = base.toMap
    // the gate's own basis functions: with these the heuristic threshold
    // is LINEAR in feature space, so GD must converge to (near-)exact
    // recovery — which is what makes the distillation verifiable with a
    // tight accuracy gate instead of a loose one
    base ++ Seq(
      "len_score" -> least(m("n_tokens") / lit(64.0), lit(1.0)),
      "stop_dev" -> abs(m("stopword_ratio") - lit(0.4)))
  }

  /** Feature names, aligned with [[featurize]]'s f0..fN columns. */
  val FeatureNames: Seq[String] =
    TextOps.qualityFeatures(lit("")).map(_._1) ++ Seq("len_score", "stop_dev")

  /** One corpus scan → (y, f0..f4) with label as 0/1. */
  def featurize(docs: DataFrame, textCol: Column,
                label: Column): DataFrame = {
    val feats = rawFeatures(textCol)
    docs.select(
      (label.cast("int").cast("double").as("y") +:
        feats.zipWithIndex.map { case ((_, c), i) => c.as(s"f$i") }): _*)
  }

  /** Train on a featurized frame ([[featurize]] output) by DISTRIBUTED
    * Newton/IRLS: each iteration is ONE map-side-combined aggregate
    * computing the gradient and the (d+1)×(d+1) Hessian upper triangle
    * (d features + intercept — 44 partial sums for d=7), and the driver
    * solves the tiny normal system. Second order converges in a
    * handful of iterations where plain GD needs hundreds — iteration
    * count is the number of PASSES over the corpus, so at 100 TB this
    * is the difference that matters. The frame is lazily checkpointed:
    * the standardization pass and every iteration read the same
    * materialized narrow rows; the raw corpus is scanned exactly once.
    * A small ridge keeps the system conditioned when the classes are
    * separable (true for a distilled threshold, where the MLE diverges).
    */
  def train(feats: DataFrame, iters: Int = 8,
            ridge: Double = 1e-6): Model = {
    val names = FeatureNames
    val n = names.length
    val d = n + 1 // + intercept, as slot n
    val cached = graft.plans.LazyCheckpoint.shared(feats)
    val statAggs = (0 until n).flatMap(i =>
      Seq(avg(col(s"f$i")), stddev_pop(col(s"f$i"))))
    val statRow = cached.agg(statAggs.head, statAggs.tail: _*).head()
    val means = Array.tabulate(n)(i => statRow.getDouble(i * 2))
    val scales = Array.tabulate(n) { i =>
      val s = statRow.getDouble(i * 2 + 1)
      if (s < 1e-12) 1.0 else s // constant feature: contributes nothing
    }
    def x(i: Int): Column =
      if (i == n) lit(1.0)
      else (col(s"f$i") - lit(means(i))) / lit(scales(i))

    val theta = new Array[Double](d)
    var it = 0
    while (it < iters) {
      val z = (0 until d).map(i => x(i) * lit(theta(i))).reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val err = p - col("y")
      val s = p * (lit(1.0) - p)
      val gradAggs = (0 until d).map(i => avg(err * x(i)))
      val hessAggs = for { i <- 0 until d; j <- i until d }
        yield avg(s * x(i) * x(j))
      val aggs = gradAggs ++ hessAggs
      val row = cached.agg(aggs.head, aggs.tail: _*).head()
      val g = Array.tabulate(d)(i => row.getDouble(i) + ridge * theta(i))
      val h = Array.ofDim[Double](d, d)
      var at = d
      for (i <- 0 until d; j <- i until d) {
        h(i)(j) = row.getDouble(at); h(j)(i) = h(i)(j); at += 1
      }
      var i = 0
      while (i < d) { h(i)(i) += ridge; i += 1 }
      val step = solve(h, g)
      i = 0
      while (i < d) { theta(i) -= step(i); i += 1 }
      it += 1
    }
    Model(names, theta.take(n).toSeq, theta(n), means.toSeq, scales.toSeq)
  }

  /** Gaussian elimination with partial pivoting — the normal system is
    * (d+1)² driver-side doubles, control-plane by construction.
    */
  private def solve(a: Array[Array[Double]],
                    b: Array[Double]): Array[Double] = {
    val d = b.length
    val m = Array.tabulate(d)(i => a(i) :+ b(i))
    var col0 = 0
    while (col0 < d) {
      var piv = col0
      var r = col0 + 1
      while (r < d) {
        if (math.abs(m(r)(col0)) > math.abs(m(piv)(col0))) piv = r
        r += 1
      }
      val t = m(col0); m(col0) = m(piv); m(piv) = t
      val pv = m(col0)(col0)
      if (math.abs(pv) < 1e-300)
        throw new ArithmeticException("singular normal system")
      r = col0 + 1
      while (r < d) {
        val f = m(r)(col0) / pv
        var c = col0
        while (c <= d) { m(r)(c) -= f * m(col0)(c); c += 1 }
        r += 1
      }
      col0 += 1
    }
    val out = new Array[Double](d)
    var i = d - 1
    while (i >= 0) {
      var s = m(i)(d)
      var j = i + 1
      while (j < d) { s -= m(i)(j) * out(j); j += 1 }
      out(i) = s / m(i)(i)
      i -= 1
    }
    out
  }

  /** The model as a scan expression over raw text: P(quality) ≥ 0.5.
    * Weights/standardization ride as literals — broadcast-free,
    * shuffle-free, codegen-friendly.
    */
  def predict(model: Model, text: Column): Column = {
    val feats = rawFeatures(text)
    val z = feats.zipWithIndex.map { case ((_, c), i) =>
      ((c - lit(model.means(i))) / lit(model.scales(i))) *
        lit(model.weights(i))
    }.foldLeft(lit(model.bias): Column)(_ + _)
    z >= 0.0 // σ(z) ≥ 0.5 ⇔ z ≥ 0
  }
}
