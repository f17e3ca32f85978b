package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.{HashPartition, IndexDef, SinglePartition}
import graft.operators.{IndexBuilder, IndexScan, IndexStore}

/** Persisted index layout: sorted range-partitioned parquet with pushdown
  * range scans; hash scheme writes partition directories for pruning.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def builtIndex = IndexBuilder.build(
    Tables.customer(spark, sf()),
    IndexDef("i", "customer", "c_custkey", secExprs = Seq("c_acctbal")))

  test("bucketed tables join on the bucket key with NO exchange") {
    IndexStore.writeBucketed(builtIndex, "gb_idx", buckets = 4)
    IndexStore.writeBucketed(
      builtIndex.select(col("docid"), (col("key") * 2).as("k2")),
      "gb_probe", buckets = 4)
    try {
      val joined = IndexStore.readTable(spark, "gb_idx")
        .join(IndexStore.readTable(spark, "gb_probe"), "docid")
      // co-located: sort-merge join straight off the bucketed scans
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should be exchange-free:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == builtIndex.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS gb_idx")
      spark.sql("DROP TABLE IF EXISTS gb_probe")
    }
  }

  test("write + range scan round-trips and pushes the predicate to parquet") {
    val dir = Files.createTempDirectory("gstore").toString
    val defn = IndexDef("i", "customer", "c_custkey", secExprs = Seq("c_acctbal"))
    IndexStore.write(builtIndex, s"$dir/idx", defn)
    val scan = IndexScan.range(IndexStore.read(spark, s"$dir/idx"),
      Some(0.0), Some(1000.0))
    val expected = builtIndex.filter(col("key") >= 0.0 && col("key") < 1000.0)
      .select("key", "docid").as[(Double, Long)].collect().toSet
    assert(scan.select("key", "docid").as[(Double, Long)].collect().toSet == expected)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(key), GreaterThanOrEqual(key,0.0), LessThan(key,1000.0)]"),
      s"range predicate not pushed to the scan:\n$plan")
  }

  test("hash scheme writes part= directories; partition filter prunes") {
    val dir = Files.createTempDirectory("gstore2").toString
    val defn = IndexDef("i", "customer", "c_custkey",
      secExprs = Seq("c_acctbal"), partition = HashPartition(Seq("docid"), 4))
    IndexStore.write(builtIndex, s"$dir/idx", defn)
    assert(new java.io.File(s"$dir/idx").list().count(_.startsWith("part=")) == 4)
    val one = IndexStore.read(spark, s"$dir/idx").filter(col("part") === 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part#") ||
      plan.contains("(part"), s"partition filter missing:\n$plan")
    // all rows round-trip across partitions
    assert(IndexStore.read(spark, s"$dir/idx").count() == builtIndex.count())
  }

  test("files in range layout cover disjoint key ranges (sorted write)") {
    val dir = Files.createTempDirectory("gstore3").toString
    IndexStore.write(builtIndex, s"$dir/idx",
      IndexDef("i", "customer", "c_custkey", secExprs = Seq("c_acctbal")),
      numFiles = 4)
    val perFile = spark.read.parquet(s"$dir/idx")
      .select(input_file_name().as("f"), col("key"))
      .groupBy("f").agg(min("key").as("lo"), max("key").as("hi"))
      .orderBy("lo").as[(String, Double, Double)].collect()
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ =>
    }
  }
}
