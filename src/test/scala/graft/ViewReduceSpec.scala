package graft

import org.apache.spark.sql.functions._

import graft.operators.ViewReduce

/** Couchbase-style view reduces: declarative _count/_sum/_stats and the
  * typed Aggregator form agree with each other.
  */
class ViewReduceSpec extends SparkSpec {
  import spark.implicits._

  private def emitted = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)).toDF("key", "value")

  test("_count and _sum reduces") {
    assert(ViewReduce.count_(emitted).as[(String, Long)].collect().toMap ==
      Map("a" -> 3L, "b" -> 1L))
    assert(ViewReduce.sum_(emitted).as[(String, Double)].collect().toMap ==
      Map("a" -> 6.0, "b" -> 10.0))
  }

  test("_stats reduce: full field set") {
    val s = ViewReduce.stats(emitted).filter(col("key") === "a")
      .select("vsum", "vcount", "vmin", "vmax", "sumsqr")
      .as[(Double, Long, Double, Double, Double)].head()
    assert(s == ((6.0, 3L, 1.0, 3.0, 14.0)))
  }

  test("typed StatsAgg (Aggregator) agrees with the declarative form") {
    val typed = emitted.as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(ViewReduce.StatsAgg.toColumn)
      .collect().toMap
    val decl = ViewReduce.stats(emitted)
      .select("key", "vsum", "vcount", "vmin", "vmax", "sumsqr")
      .as[(String, Double, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> ViewReduce.Stats(r._2, r._3, r._4, r._5, r._6))
      .toMap
    assert(typed == decl)
  }
}
