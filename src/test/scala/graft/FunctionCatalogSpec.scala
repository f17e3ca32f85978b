package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{ExprMapFunction, FunctionCatalog, LambdaMapFunction}
import graft.model.{HashPartition, IndexDef}

/** O22/O23/O25 — the function library: register/lookup/drop, registration-time
  * validation (the V8-compile-check analog), equivalent-index dedup, and the
  * documented divergence from the reference's 20-token emit cap.
  */
class FunctionCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq((1L, "a"), (2L, "b")).toDF("id", "name")

  test("register / lookup / list / drop") {
    val cat = new FunctionCatalog
    cat.register(ExprMapFunction("f1", Seq(col("name"))))
    cat.register(ExprMapFunction("f2", Seq(col("id"))))
    assert(cat.lookup("f1").isDefined)
    assert(cat.list == Seq("f1", "f2"))
    assert(cat.drop("f1"))
    assert(cat.lookup("f1").isEmpty && !cat.drop("f1"))
  }

  test("validation rejects unresolvable expressions (O23)") {
    val cat = new FunctionCatalog
    val bad = ExprMapFunction("bad", Seq(col("no_such_column")))
    assert(cat.registerValidated(bad, sample).isLeft)
    assert(cat.lookup("bad").isEmpty)
    val good = ExprMapFunction("good", Seq(upper(col("name"))))
    assert(cat.registerValidated(good, sample).isRight)
    assert(cat.lookup("good").isDefined)
  }

  test("validation rejects lambda whose emit shape mismatches the schema") {
    val cat = new FunctionCatalog
    val bad = LambdaMapFunction("bad",
      StructType(Seq(StructField("k", StringType), StructField("k2", StringType))),
      (_: Row) => Iterator(Row("only-one-value")))
    assert(cat.registerValidated(bad, sample).isLeft)
    val boom = LambdaMapFunction("boom",
      StructType(Seq(StructField("k", StringType))),
      (_: Row) => throw new RuntimeException("nope"))
    assert(cat.registerValidated(boom, sample).isLeft)
  }

  test("emit is unbounded (documented divergence from the 20-token cap)") {
    // reference caps emitted tokens at 20 (CGOTRY/Messages.h:17-18);
    // this engine emits arbitrarily many keys per doc by design (SURVEY §7.4.5)
    val cat = new FunctionCatalog
    val many = LambdaMapFunction("many",
      StructType(Seq(StructField("k", LongType))),
      (_: Row) => (0L until 100L).map(Row(_)).iterator)
    assert(cat.registerValidated(many, sample).isRight)
  }

  test("equivalent index definitions dedup to the first registered (O25)") {
    val cat = new FunctionCatalog
    val a = IndexDef("idx_a", "customer", "c_custkey",
      secExprs = Seq("c_acctbal"), whereExpr = Some("c_acctbal > 0"))
    val b = a.copy(name = "idx_b", secExprs = Seq("C_ACCTBAL"),
      whereExpr = Some("  c_acctbal   > 0 ")) // whitespace/case canon
    val c = a.copy(name = "idx_c", partition = HashPartition(Seq("docid"), 4))
    assert(cat.registerIndex(a) == "idx_a")
    assert(cat.registerIndex(b) == "idx_a") // equivalent → dedup
    assert(cat.registerIndex(c) == "idx_c") // different partitioning → new
    assert(cat.lookupIndex("idx_b").isEmpty)
  }

  test("isEquivalent distinguishes semantic knobs") {
    val base = IndexDef("i", "t", "id", secExprs = Seq("x"))
    assert(IndexDef.isEquivalent(base, base.copy(name = "other")))
    assert(!IndexDef.isEquivalent(base, base.copy(desc = Seq(true))))
    assert(!IndexDef.isEquivalent(base, base.copy(isPrimary = true)))
    assert(!IndexDef.isEquivalent(base, base.copy(retainDeletedXattr = true)))
  }
}
