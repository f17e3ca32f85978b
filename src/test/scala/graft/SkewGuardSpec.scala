package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewGuard

/** Salted two-stage aggregation/join: identical results to the direct
  * forms on skewed data (one hot key dominating).
  */
class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 10k rows of "hot", sprinkle of others
  private def skewed = spark.range(10500).select(
    when(col("id") < 10000, "hot").otherwise(concat(lit("k"), col("id") % 50))
      .as("k"),
    (col("id") % 7).cast("double").as("v"))

  test("saltedCount == direct groupBy count") {
    val direct = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val salted = SkewGuard.saltedCount(skewed, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    assert(salted("hot") == 10000L)
  }

  test("saltedSum == direct groupBy sum") {
    val direct = skewed.groupBy("k").agg(sum("v").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = SkewGuard.saltedSum(skewed, Seq("k"), "v")
      .as[(String, Double)].collect().toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-9) }
  }

  test("saltJoin == direct join on skewed key") {
    val small = Seq(("hot", 1), ("k3", 3)).toDF("k", "tag")
    val direct = skewed.join(small, "k").groupBy("k")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val (big, rep, cols) = SkewGuard.saltJoin(skewed, small, Seq("k"))
    val salted = big.join(rep, cols).groupBy("k")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(salted == direct)
  }
}
