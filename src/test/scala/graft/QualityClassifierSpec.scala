package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.QualityClassifier

/** Distributed Newton/IRLS logistic training: recovers a known linear
  * separator from synthetic data, distills the real quality gate at
  * high accuracy on a held-out split, and survives degenerate
  * (constant) features.
  */
class QualityClassifierSpec extends SparkSpec {

  test("recovers a planted linear separator on synthetic features") {
    import spark.implicits._
    // deterministic pseudo-random features; the planted rule is linear
    // in f0/f1 — IRLS must reach near-perfect accuracy in 8 passes
    val rows = (0 until 400).map { i =>
      val f0 = (i * 37 % 100) / 100.0
      val f1 = (i * 61 % 100) / 100.0
      val y = if (2.0 * f0 - f1 > 0.5) 1.0 else 0.0
      (y, f0, f1, 0.0, 0.0, 0.0, 0.0, 0.0)
    }
    val feats = rows.toDF("y", "f0", "f1", "f2", "f3", "f4", "f5", "f6")
    val m = QualityClassifier.train(feats)
    // score through the same standardization the model carries
    val z = (0 until 7).map(i =>
      ((col(s"f$i") - lit(m.means(i))) / lit(m.scales(i))) *
        lit(m.weights(i))).foldLeft(lit(m.bias): org.apache.spark.sql.Column)(_ + _)
    val acc = feats.select(avg(((z >= 0.0) === (col("y") === 1.0))
      .cast("int").cast("double"))).head().getDouble(0)
    assert(acc >= 0.98, s"synthetic separator accuracy $acc")
  }

  test("distills the quality gate: >= 0.95 accuracy incl. held-out split") {
    val docs = Tables.documents(spark, sf())
    val label = TextOps.qualityScore(col("text")) >= 0.6
    val m = QualityClassifier.train(QualityClassifier.featurize(
      docs.filter(col("doc_id") % 5 =!= 0), col("text"), label))
    def acc(df: org.apache.spark.sql.DataFrame): Double =
      df.select(avg((QualityClassifier.predict(m, col("text")) === label)
        .cast("int").cast("double"))).head().getDouble(0)
    val trainAcc = acc(docs.filter(col("doc_id") % 5 =!= 0))
    val testAcc = acc(docs.filter(col("doc_id") % 5 === 0))
    assert(trainAcc >= 0.95, s"train accuracy $trainAcc")
    assert(testAcc >= 0.95, s"held-out accuracy $testAcc")
  }

  test("constant features do not destabilize the solve") {
    import spark.implicits._
    val rows = (0 until 100).map { i =>
      val f0 = (i % 10) / 10.0
      (if (f0 > 0.5) 1.0 else 0.0, f0, 7.7, 7.7, 7.7, 7.7, 7.7, 7.7)
    }
    val m = QualityClassifier.train(
      rows.toDF("y", "f0", "f1", "f2", "f3", "f4", "f5", "f6"))
    // the constant features standardize to zero and carry ~zero weight;
    // the informative one dominates
    assert(math.abs(m.weights.head) > 1.0)
    (1 until 7).foreach(i => assert(math.abs(m.weights(i)) < 1e-6,
      s"constant feature $i got weight ${m.weights(i)}"))
  }

  test("degenerate zero-token docs get a real feature row and a real " +
      "prediction (Spark x/0 is NULL, not NaN)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
        (i, if (i % 10 == 0) "   " else s"some words here $i more words"))
      .toDF("doc_id", "text")
    val label = length(col("text")) > 10
    val model = graft.operators.QualityClassifier.train(
      graft.operators.QualityClassifier.featurize(docs, col("text"), label))
    val preds = docs.select(col("doc_id"),
      graft.operators.QualityClassifier.predict(model, col("text"))
        .as("pred"))
    assert(preds.filter(col("pred").isNull).count() == 0,
      "whitespace-only docs must classify (features coalesce to 0), " +
        "never NULL out")
  }
}
