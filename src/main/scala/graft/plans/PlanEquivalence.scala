package graft.plans

import org.apache.spark.sql.DataFrame

/** Semantic equivalence of index pipelines via Catalyst plan
  * canonicalization — the plan-level form of the reference's
  * `IsEquivalentIndex` (`Projector/index.go:529-572`, SURVEY §2.1 O25).
  *
  * `IndexDef.isEquivalent` compares definitions textually (canonicalized
  * expression strings); this compares the OPTIMIZED LOGICAL PLANS of two
  * built pipelines with Spark's `sameResult` (canonicalized: literal
  * normalization, attribute-id erasure, commutative reorder). It therefore
  * also detects equivalences the text can't — qualified vs bare column
  * references, reordered conjunctions, folded constants — and is the check
  * the catalog uses before scheduling a redundant multi-hour index build.
  */
object PlanEquivalence {

  def sameResult(a: DataFrame, b: DataFrame): Boolean =
    a.queryExecution.optimizedPlan.sameResult(b.queryExecution.optimizedPlan)

  /** Stable digest of a pipeline's canonicalized plan — catalog key for
    * "has an equivalent index already been built?".
    */
  def planDigest(df: DataFrame): String = {
    val canon = df.queryExecution.optimizedPlan.canonicalized
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canon.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
