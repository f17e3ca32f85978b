package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling: same rows under any partitioning, fraction
  * accuracy, per-stratum quotas.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(10000).select(col("id"))

  test("byFraction is deterministic and partition-invariant") {
    val a = Sampling.byFraction(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.byFraction(ids.repartition(13), "id", 0.3)
      .as[Long].collect().toSet
    assert(a == b)
    // within 3% of the requested fraction on 10k rows
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.03, s"got ${a.size}")
  }

  test("byFraction is monotone: a smaller fraction is a subset") {
    val small = Sampling.byFraction(ids, "id", 0.1).as[Long].collect().toSet
    val big = Sampling.byFraction(ids, "id", 0.4).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("mixture keeps ~the per-stratum fraction; unknown strata use default") {
    val df = spark.range(30000).select(col("id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("src"))
    val weights = Map("s0" -> 0.8, "s1" -> 0.2) // s2 falls to defaultFrac=0
    val out = Sampling.mixture(df, "src", weights, "id")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("s0") / 10000.0 - 0.8) < 0.03, s"s0 got ${out("s0")}")
    assert(math.abs(out("s1") / 10000.0 - 0.2) < 0.03, s"s1 got ${out("s1")}")
    assert(!out.contains("s2"))
    // per-stratum draw equals byFraction on that stratum (same hash order)
    val s1direct = Sampling.byFraction(df.filter(col("src") === "s1"), "id", 0.2)
      .select("id").as[Long].collect().toSet
    val s1mix = Sampling.mixture(df, "src", weights, "id")
      .filter(col("src") === "s1").select("id").as[Long].collect().toSet
    assert(s1mix == s1direct)
  }

  test("stratified takes exactly n per stratum (or all when smaller)") {
    val df = Tables.documents(spark, sf())
    val out = Sampling.stratified(df, "source", 7, "doc_id")
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val full = df.groupBy("source").count().as[(String, Long)].collect().toMap
    full.foreach { case (src, n) =>
      assert(counts(src) == math.min(7L, n), s"stratum $src")
    }
    // deterministic across invocations
    val again = Sampling.stratified(df, "source", 7, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }
}
