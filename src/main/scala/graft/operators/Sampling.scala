package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — reproducible across engines, runs, and
  * partitionings, which `rand()` sampling is not. The order key is
  * `md5(key)` (hex string; fixed-length lowercase, so lexicographic
  * comparison == numeric comparison on the 128-bit value). Any engine with
  * md5 draws the SAME sample — resumable pipelines, auditable holdouts.
  *
  * Scale shape: [[byFraction]] is a pure filter in the scan (no shuffle,
  * no sort); [[stratified]] shuffles only on the stratum key and keeps
  * top-n per stratum via window rank.
  */
object Sampling {

  /** Pseudo-random but deterministic order key for a row key column. */
  def hashKey(c: Column): Column = md5(c.cast("string"))

  /** Hex threshold whose prefix encodes `frac` of the 32-bit space. */
  def fracThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, "fraction in [0,1]")
    f"${math.round(frac * 0xffffffffL)}%08x" + "0" * 24
  }

  /** Keep ~`frac` of rows, chosen by hash of `keyCol` — a scan-level
    * filter, deterministic under any parallelism.
    */
  def byFraction(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(hashKey(col(keyCol)) < lit(fracThreshold(frac)))

  /** Top-`n` rows per stratum in hash order — equal-sized deterministic
    * quotas per group (e.g. per source) regardless of group skew.
    */
  def stratified(df: DataFrame, strataCol: String, n: Int,
                 keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Weighted mixture sampling: keep a per-stratum fraction of rows —
    * the domain-mixing step of a pretraining run (upweight curated
    * sources, downweight crawl), expressed as a pure scan-level filter:
    * each stratum's keep-fraction becomes a hash threshold, the CASE over
    * strata compiles into the scan projection, and NO shuffle or
    * per-stratum pass happens regardless of how many strata there are.
    * Rows whose stratum is not in `weights` keep `defaultFrac`.
    */
  def mixture(df: DataFrame, strataCol: String, weights: Map[String, Double],
              keyCol: String, defaultFrac: Double = 0.0): DataFrame = {
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(
      lit(fracThreshold(defaultFrac))) { case (acc, (stratum, frac)) =>
      when(col(strataCol) === stratum, lit(fracThreshold(frac))).otherwise(acc)
    }
    df.filter(hashKey(col(keyCol)) < threshold)
  }
}
