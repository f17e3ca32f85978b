package graft

import org.apache.spark.sql.functions._

import graft.model.IndexDef
import graft.operators.IndexBuilder
import graft.plans.PlanEquivalence

/** O25 at the plan level: canonicalized-plan equivalence catches index
  * pipelines the textual definition comparison cannot.
  */
class PlanEquivalenceSpec extends SparkSpec {

  private def build(defn: IndexDef) =
    IndexBuilder.build(Tables.customer(spark, sf()), defn)

  test("identical pipelines are sameResult with equal digests") {
    val a = build(IndexDef("a", "customer", "c_custkey", secExprs = Seq("c_acctbal")))
    val b = build(IndexDef("b", "customer", "c_custkey", secExprs = Seq("c_acctbal")))
    assert(PlanEquivalence.sameResult(a, b))
    assert(PlanEquivalence.planDigest(a) == PlanEquivalence.planDigest(b))
  }

  test("textually different but semantically equal predicates are sameResult") {
    val a = build(IndexDef("a", "customer", "c_custkey",
      secExprs = Seq("c_acctbal"), whereExpr = Some("c_acctbal > 1000.0")))
    // reordered conjunction + constant folding: 500 + 500
    val b = build(IndexDef("b", "customer", "c_custkey",
      secExprs = Seq("c_acctbal"), whereExpr = Some("c_acctbal > (500.0 + 500.0)")))
    assert(PlanEquivalence.sameResult(a, b))
  }

  test("different key or predicate is NOT sameResult") {
    val a = build(IndexDef("a", "customer", "c_custkey", secExprs = Seq("c_acctbal")))
    val b = build(IndexDef("b", "customer", "c_custkey", secExprs = Seq("c_name")))
    val c = build(IndexDef("c", "customer", "c_custkey",
      secExprs = Seq("c_acctbal"), whereExpr = Some("c_acctbal > 1.0")))
    assert(!PlanEquivalence.sameResult(a, b))
    assert(!PlanEquivalence.sameResult(a, c))
    assert(PlanEquivalence.planDigest(a) != PlanEquivalence.planDigest(b))
  }

  test("GraftSession config: AQE, broadcast threshold, SQL functions") {
    val s = GraftSession.create("local[2]", cores = 2)
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.sql("SELECT vec_dot(array(1.0D), array(3.0D)) AS d")
      .collect().head.getDouble(0) == 3.0)
  }
}
