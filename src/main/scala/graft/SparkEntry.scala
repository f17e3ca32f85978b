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
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (collation encoding, xxhash64-based LSH internals) → rows-only check;
    * those are covered by ScalaTest suites instead.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
