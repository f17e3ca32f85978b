package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the change feed + multi-batch incremental index merge
    * (the reference's core capability, SURVEY §2.1 O1/O5/O6).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.idxMergeUpserts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. As of round 6 EVERY query has one — the
    * last rows-only residue (dynamic-map collation) closed via
    * key-sorted-entry canonicalization; engine-internal hash choices
    * (xxhash64 LSH internals) are oracled through their hash-independent
    * observable results or the cross-engine md5 family.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
