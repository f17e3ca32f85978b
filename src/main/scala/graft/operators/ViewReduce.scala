package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Couchbase-views-style reduce functions over map-emitted (key, value)
  * pairs. The reference implements only the MAP side (no reduce exists
  * anywhere in it — the V8 template registers only `emit`, reference
  * `CGOTRY/v8Instance.cpp:90-91`; SURVEY §2.2 flags reduces as extension),
  * but its lineage (couchbase views) defines `_count`, `_sum`, `_stats` as
  * the builtin reduces; this provides them Spark-first:
  *
  *  - declarative forms ([[count_]], [[sum_]], [[stats]]) — groupBy + agg,
  *    map-side partial, whole-stage codegen;
  *  - a typed `Aggregator[Double, _, _]` ([[StatsAgg]]) for the
  *    `Dataset.groupByKey` surface — the UDAF extension point
  *    (SURVEY §2.3: `Aggregator[IN, BUF, OUT]`).
  */
object ViewReduce {

  /** `_count` reduce: rows per key. */
  def count_(emitted: DataFrame): DataFrame =
    emitted.groupBy("key").agg(count(lit(1)).as("cnt"))

  /** `_sum` reduce: value sum per key. */
  def sum_(emitted: DataFrame): DataFrame =
    emitted.groupBy("key").agg(sum("value").as("total"))

  /** `_stats` reduce: {sum, count, min, max, sumsqr} per key — the exact
    * field set couchbase's builtin `_stats` returns.
    */
  def stats(emitted: DataFrame): DataFrame =
    emitted.groupBy("key").agg(
      sum("value").as("vsum"),
      count(lit(1)).as("vcount"),
      min("value").as("vmin"),
      max("value").as("vmax"),
      sum(col("value") * col("value")).as("sumsqr"))

  /** `_stats` buffer: algebraic, so partial aggregates merge associatively
    * (the property that makes the reduce distributable).
    */
  final case class Stats(vsum: Double, vcount: Long, vmin: Double,
                         vmax: Double, sumsqr: Double)

  /** Typed `_stats` as an Aggregator — usable with
    * `ds.groupByKey(...).agg(ViewReduce.statsAgg.toColumn)`.
    */
  object StatsAgg extends Aggregator[Double, Stats, Stats] {
    def zero: Stats =
      Stats(0.0, 0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0)
    def reduce(b: Stats, v: Double): Stats =
      Stats(b.vsum + v, b.vcount + 1, math.min(b.vmin, v),
        math.max(b.vmax, v), b.sumsqr + v * v)
    def merge(a: Stats, b: Stats): Stats =
      Stats(a.vsum + b.vsum, a.vcount + b.vcount, math.min(a.vmin, b.vmin),
        math.max(a.vmax, b.vmax), a.sumsqr + b.sumsqr)
    def finish(r: Stats): Stats = r
    def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
