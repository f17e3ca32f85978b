package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.IndexDef
import graft.operators.IndexBuilder
import graft.sources.DocSources

/** JSON/CSV document ingestion: schema'd and schemaless paths, malformed-doc
  * tolerance, and an index build straight off a JSON corpus.
  */
class DocSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("gsrc")
    Files.writeString(dir.resolve(s"data$suffix"), lines.mkString("\n"))
    dir.toString
  }

  private val docSchema = StructType(Seq(
    StructField("docid", StringType), StructField("age", LongType),
    StructField("company", StringType)))

  test("json-lines read (inferred and explicit schema) drives an index build") {
    val path = writeLines(Seq(
      """{"docid": "d1", "age": 33, "company": "acme"}""",
      """{"docid": "d2", "age": 41, "company": "globex"}""",
      """{"docid": "d3", "company": "acme"}"""), ".json")
    val inferred = DocSources.readJson(spark, path)
    assert(inferred.count() == 3)
    val typed = DocSources.readJson(spark, path, docSchema)
    // the reference's canonical example: an index on `age` (SURVEY §7.2)
    val idx = IndexBuilder.build(typed,
      IndexDef("idx_age", "docs", "docid", secExprs = Seq("age")))
    assert(idx.as[(Long, String)].collect().toSeq ==
      Seq((33L, "d1"), (41L, "d2"))) // d3: no age => no entry
  }

  test("malformed JSON line yields nulls, not a failed read") {
    val path = writeLines(Seq(
      """{"docid": "ok", "age": 1}""",
      """this is not json at all"""), ".json")
    val df = DocSources.readJson(spark, path, docSchema)
    assert(df.count() == 2)
    assert(df.filter(col("docid").isNull).count() == 1)
  }

  test("late-bound field access on raw JSON strings") {
    val raw = Seq(
      """{"a": {"b": 7}, "tag": "x"}""",
      """{"tag": "y"}""").toDF("doc")
    val out = raw.select(
      DocSources.jsonField(col("doc"), "a.b").as("ab"),
      DocSources.jsonField(col("doc"), "tag").as("tag"))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("7", "x"), (null, "y")))
  }

  test("csv read with schema") {
    val path = writeLines(Seq("docid,age", "c1,10", "c2,20"), ".csv")
    val schema = StructType(Seq(
      StructField("docid", StringType), StructField("age", LongType)))
    val df = DocSources.readCsv(spark, path, schema)
    assert(df.as[(String, Long)].collect().toSeq == Seq(("c1", 10L), ("c2", 20L)))
  }

  test("orc write/read round-trips with footer-pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("gorc").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("docid", "s", "v")
    DocSources.writeOrc(df, s"$dir/docs")
    val back = DocSources.readOrc(spark, s"$dir/docs")
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    val plan = back.filter(col("v") > 15.0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(v,15.0)"),
      s"predicate not pushed to the ORC scan:\n$plan")
  }

  test("change feed from a JSON mutation log merges correctly") {
    val valueSchema = StructType(Seq(StructField("v", DoubleType)))
    val path = writeLines(Seq(
      """{"opcode": "MUTATION", "docid": 1, "seqno": 1, "partition": 0, "value": {"v": 5.0}}""",
      """{"opcode": "MUTATION", "docid": 1, "seqno": 2, "partition": 0, "value": {"v": 9.0}}""",
      """{"opcode": "DELETION", "docid": 2, "seqno": 3, "partition": 1}""",
      """{"opcode": "bogus", "docid": 3, "seqno": 4, "partition": 1, "value": {"v": 2.0}}"""),
      ".json")
    val feed = DocSources.changeFeedFromJson(spark, path, valueSchema)
      .select(col("opcode"), col("docid"), col("value.v").as("value"), col("seqno"))
    val emptyIdx = spark.range(0)
      .select(col("id").cast("double").as("key"), col("id").as("docid"))
    val idx = graft.operators.IndexMaintainer.merge(emptyIdx, feed,
      IndexDef("i", "log", "docid", secExprs = Seq("value")))
    assert(idx.select("key", "docid").as[(Double, Long)].collect().toSet ==
      Set((9.0, 1L), (2.0, 3L))) // unknown opcode coerced to MUTATION
  }
}
