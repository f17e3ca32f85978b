package graft

import org.apache.spark.sql.functions._

import graft.model.IndexDef
import graft.operators.{IndexBuilder, IndexScan}

/** Scan layer: range/point semantics and bloom-accelerated membership. */
class IndexScanSpec extends SparkSpec {
  import spark.implicits._

  private def idx = IndexBuilder.build(Tables.customer(spark, sf()),
    IndexDef("i", "customer", "c_custkey", secExprs = Seq("c_acctbal")))

  test("range and point scans") {
    val r = IndexScan.range(idx, Some(0.0), Some(100.0))
    assert(r.filter(col("key") < 0.0 || col("key") >= 100.0).count() == 0)
    val someKey = idx.select("key").as[Double].head()
    assert(IndexScan.point(idx, someKey).count() >= 1)
  }

  test("bloom membership: no false negatives, exact after semi-join") {
    val indexed = idx.select("docid").as[Long].collect().toSet
    // probes: half indexed, half definitely not (beyond key space)
    val probes = (indexed.take(40).toSeq ++ (1000000L to 1000039L)).toDF("docid")
    val got = IndexScan.probeMembership(idx, probes).as[Long].collect().toSet
    assert(got == indexed.take(40).toSet) // all hits, no phantom rows
  }

  test("bloom membership on a string column; unsupported type rejected") {
    val sIdx = Seq(("a", 1.0), ("b", 2.0)).toDF("docid", "key")
    val probes = Seq("a", "zzz").toDF("docid")
    val got = IndexScan.probeMembership(sIdx, probes).as[String].collect().toSeq
    assert(got == Seq("a"))
    intercept[IllegalArgumentException] {
      IndexScan.probeMembership(
        Seq((1.5, 1.0)).toDF("docid", "key"), Seq(1.5).toDF("docid"))
    }
  }

  test("bloom sketch alone has no false negatives on every indexed docid") {
    val bloom = IndexScan.membershipBloom(idx, expectedItems = 1024)
    idx.select("docid").as[Long].collect()
      .foreach(d => assert(bloom.mightContainLong(d)))
  }
}
