package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{FunctionCatalog, LambdaMapFunction, ExprMapFunction}
import graft.model._
import graft.operators.IndexBuilder

/** M2 batch index build: key projection (O3), WHERE (O5), array index (O12),
  * primary (O13), desc ordering (O11), lambda multi-emit map functions (O2),
  * panic safety (O26).
  */
class IndexBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "alpha", 10.0, Seq("x", "y")),
    (2L, "beta", -5.0, Seq("y")),
    (3L, null.asInstanceOf[String], 20.0, Seq.empty[String]),
    (4L, "delta", 0.0, null.asInstanceOf[Seq[String]])
  ).toDF("id", "name", "score", "tags")

  test("single-key build: key+docid, null keys emit nothing, sorted") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("name")))
    assert(out.columns.toSeq == Seq("key", "docid"))
    assert(out.as[(String, Long)].collect().toSeq ==
      Seq(("alpha", 1L), ("beta", 2L), ("delta", 4L))) // id 3: null key dropped
  }

  test("composite key keeps row when ANY key part is non-null") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("name", "score")))
    assert(out.columns.toSeq == Seq("key1", "key2", "docid"))
    assert(out.count() == 4) // id 3 survives: score non-null
  }

  test("descending direction orders desc with nulls per Spark desc default") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("score"), desc = Seq(true)))
    assert(out.select("key").as[Double].collect().toSeq ==
      Seq(20.0, 10.0, 0.0, -5.0))
  }

  test("partial index applies WHERE before key derivation") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("name"),
        whereExpr = Some("score > 0")))
    assert(out.select("docid").as[Long].collect().toSeq == Seq(1L))
  }

  test("primary index is distinct docids") {
    val dup = docsDf.unionAll(docsDf)
    val out = IndexBuilder.build(dup, IndexDef("i", "docs", "id", isPrimary = true))
    assert(out.columns.toSeq == Seq("docid"))
    assert(out.as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("array index emits one entry per element, skips empty/null arrays") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("tags"), isArrayIndex = true))
    assert(out.as[(String, Long)].collect().toSeq ==
      Seq(("x", 1L), ("y", 1L), ("y", 2L)))
  }

  test("lambda map function: multi-emit (0..n keys per doc)") {
    val catalog = new FunctionCatalog
    catalog.register(LambdaMapFunction("twice",
      StructType(Seq(StructField("key", StringType))),
      (row: Row) => {
        val name = row.getAs[String]("name")
        if (name == null) Iterator.empty
        else Iterator(Row(s"a:$name"), Row(s"b:$name"))
      }))
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", funcName = Some("twice")), catalog)
    assert(out.count() == 6) // 3 non-null names x 2 emits
    assert(out.filter(col("docid") === 1L).select("key").as[String]
      .collect().toSet == Set("a:alpha", "b:alpha"))
  }

  test("throwing map function skips the doc instead of failing the build (O26)") {
    val catalog = new FunctionCatalog
    catalog.register(LambdaMapFunction("boom",
      StructType(Seq(StructField("key", StringType))),
      (row: Row) => {
        if (row.getLong(0) == 2L) throw new RuntimeException("boom")
        Iterator(Row("ok"))
      }))
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", funcName = Some("boom")), catalog)
    assert(out.select("docid").as[Long].collect().toSet == Set(1L, 3L, 4L))
  }

  test("expr map function from the catalog drives the key") {
    val catalog = new FunctionCatalog
    catalog.register(ExprMapFunction("upper_name", Seq(upper(col("name")))))
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", funcName = Some("upper_name")), catalog)
    assert(out.select("key").as[String].collect().toSeq ==
      Seq("ALPHA", "BETA", "DELTA"))
  }

  test("array index with multiple key exprs is rejected") {
    intercept[IllegalArgumentException] {
      IndexBuilder.build(docsDf,
        IndexDef("i", "docs", "id", secExprs = Seq("tags", "name"),
          isArrayIndex = true)).collect()
    }
  }

  test("unknown function name fails fast instead of silently falling back") {
    val err = intercept[IllegalArgumentException] {
      IndexBuilder.build(docsDf,
        IndexDef("i", "docs", "id", secExprs = Seq("name"),
          funcName = Some("no_such_fn")))
    }
    assert(err.getMessage.contains("no_such_fn"))
  }

  test("hash partition spec yields the requested partition count") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("name"),
        partition = HashPartition(Seq("docid"), 3)))
    assert(out.count() == 3) // still correct rows after repartition+sort
  }

  test("a partitioned build pays exactly ONE exchange (layout = " +
      "partition + sortWithinPartitions, no dead global sort)") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    for (scheme <- Seq[PartitionSpec](
        HashPartition(Seq("docid"), 3),
        RangePartition(Seq("key"), 3),
        KeyPartition(3))) {
      val out = IndexBuilder.build(docsDf,
        IndexDef("i", "docs", "id", secExprs = Seq("name"),
          partition = scheme))
      out.collect()
      val nodes = physicalNodes(out)
      val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.length == 1,
        s"$scheme: expected 1 exchange, got ${shuffles.length}:\n" +
          out.queryExecution.executedPlan)
      // the within-partition sort is still there (the index layout)
      assert(nodes.exists { case s: SortExec => !s.global; case _ => false },
        s"$scheme: expected a within-partition sort")
    }
    // SinglePartition needs NO exchange at all: coalesce + within-sort
    val single = IndexBuilder.build(docsDf,
      IndexDef("i", "docs", "id", secExprs = Seq("name")))
    single.collect()
    assert(physicalNodes(single)
      .collect { case e: ShuffleExchangeLike => e }.isEmpty,
      "SinglePartition build should be exchange-free")
  }

  test("a source already carrying __docid0 cannot shift the docid " +
      "read; wrong-arity emits skip the doc inside the recovery") {
    val catalog = new FunctionCatalog
    catalog.register(LambdaMapFunction("one",
      StructType(Seq(StructField("key", StringType))),
      (row: Row) => {
        val name = row.getAs[String]("name")
        if (name == null) Iterator.empty
        // doc 3 emits a WRONG-ARITY row: must skip that doc, not die
        // in the encoder
        else if (row.getAs[Long]("id") == 3L) Iterator(Row("x", "extra"))
        else Iterator(Row(s"k:$name"))
      }))
    val poisoned = docsDf.withColumn("__docid0",
      org.apache.spark.sql.functions.lit(-999L))
    val out = IndexBuilder.build(poisoned,
      IndexDef("i", "docs", "id", funcName = Some("one")), catalog)
      .select("docid", "key").as[(Long, String)].collect().toSet
    assert(out.forall(_._1 > 0L),
      s"docids must come from the id expression, never the planted " +
        s"__docid0 column: $out")
    assert(!out.exists(_._1 == 3L),
      "the wrong-arity emitter must skip its doc")
    assert(out.nonEmpty)
  }

  test("KeyPartition on a PRIMARY index partitions by docid instead " +
      "of crashing on zero key columns") {
    val out = IndexBuilder.build(docsDf,
      IndexDef("p", "docs", "id", isPrimary = true,
        partition = graft.model.KeyPartition(4)))
    assert(out.select("docid").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
  }
}
