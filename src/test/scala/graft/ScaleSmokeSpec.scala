package graft

import org.apache.spark.sql.functions._

/** The 10× scale-smoke's corpus synthesizer: driver-table schema,
  * deterministic content, and the planted pressure the smoke relies on
  * (vocabulary growth with corpus size, near-dup families).
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize: documents-table schema, deterministic, scaled content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    ScaleSmoke.synthesize(spark, 200, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.columns.sorted.toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    assert(docs.count() == 200)
    // deterministic: a second synthesis writes identical content
    val dir2 = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    ScaleSmoke.synthesize(spark, 200, dir2)
    val a = docs.orderBy("doc_id").collect()
    val b = spark.read.parquet(s"$dir2/documents.parquet")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // distinct-word growth: more docs → more distinct tokens (the
    // vocabulary pressure the BPE trainer cap is exercised by)
    def vocab(n: Long): Long = {
      val d = java.nio.file.Files.createTempDirectory("graft_smoke").toString
      ScaleSmoke.synthesize(spark, n, d)
      spark.read.parquet(s"$d/documents.parquet")
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .distinct().count()
    }
    assert(vocab(400) > vocab(40))
    // planted near-dup family: ids 0 and 3 share their family stem
    val texts = docs.filter(col("doc_id").isin(0L, 3L, 10L))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def stem(s: String) = s.split(" ").takeWhile(!_.startsWith("unique"))
    assert(stem(texts(0L)).sameElements(stem(texts(3L)))) // family 0
    assert(!stem(texts(0L)).sameElements(stem(texts(10L)))) // family 1
  }

  test("annRetrainRecovery: staged distribution drift swells one " +
      "cluster; retrain recovers the skew signal and the probe cost") {
    val dir = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    ScaleSmoke.synthesize(spark, 5000, dir)
    assert(ScaleSmoke.annRetrainRecovery(spark, dir,
      x => math.round(x * 100) / 100.0))
  }

  test("routeDelta: the reprocess work-list stays distributed — id " +
      "frames derive from the diff plan, never a driver-materialized " +
      "LocalRelation; only the 3 status counts cross to the driver") {
    val diff = Tables.documents(spark, sf())
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, "added")
          .when(col("doc_id") % 11 === 3, "removed")
          .when(col("doc_id") % 5 === 0, "changed"))
      .toDF("doc_id", "status")
      .filter(col("status").isNotNull)
    val (ups, rem, counts) = Queries.routeDelta(diff)
    // the regression this guards: the pre-r11 implementation collected
    // the delta and rebuilt the id frames from driver rows, which plan
    // as LocalRelation/LocalTableScan leaves and scale ∝ the delta
    Seq(("upsertIds", ups), ("removedIds", rem)).foreach { case (n, df) =>
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          false
        case _ => true
      }, s"$n must stay a distributed plan over the diff, got leaves: " +
        leaves.map(_.getClass.getSimpleName).mkString(","))
    }
    // counts ARE the driver's entire view of the delta: <= 3 rows
    assert(counts.keySet.subsetOf(Set("added", "changed", "removed")))
    // and the frames agree with the counts
    assert(ups.count() == counts.getOrElse("added", 0L) +
      counts.getOrElse("changed", 0L))
    assert(rem.count() == counts.getOrElse("removed", 0L))
  }
}
