package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full control of
  * column pruning and filter pushdown — callers `.select(...)`/`.filter(...)`
  * and the scan narrows (check `.explain` → `ReadSchema`/`PushedFilters`).
  * At 100 TB the same call pattern works: parquet footers prune row groups,
  * `spark.sql.files.maxPartitionBytes` splits the scan across executors.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table $name")
    // Some generations of the testdata write events.ts as TIMESTAMP(NANOS)
    // parquet, which Spark only reads as long; current data is plain
    // timestamp[us]. Keep the conf so either vintage loads — consumers
    // normalize via EventWindows.eventTimeOf, which branches on the
    // resolved type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def events(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
