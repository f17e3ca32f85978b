package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention self-arbitration
  * ([[Bench.contendedQueries]]), two rules:
  *  1. a query whose reported MIN pass overlaps a region where ≥ 3
  *     distinct queries simultaneously ran > 3× their own suite median
  *     (the r5/r8 driver-artifact pollution signature);
  *  2. a query any of whose NON-FIRST passes ran > 3× its own min with
  *     a > 0.5 s gap (the r12 signature: clean mins, poisoned passes —
  *     warm-up lives in pass 1, so a 3×-slower LATER pass of the same
  *     plan is external interference).
  */
class BenchContentionSpec extends AnyFunSuite {

  // three passes per query: (startOffsetSec, durationSec)
  private def q(name: String, ps: (Double, Double)*) = name -> ps.toSeq

  test("a min pass inside a multi-query slow region is flagged — and " +
      "so are the queries carrying the poisoned passes") {
    // a,b,c all blow up 3x+ in the window [100,140]; d's MIN pass (its
    // pass 2) sits inside that window -> d's min is untrustworthy.
    // a,b,c's own pass-2 blowups are poisoned passes (rule 2).
    val data = Seq(
      q("a", (0, 2), (100, 40), (200, 2)),
      q("b", (5, 2), (105, 30), (205, 2)),
      q("c", (8, 1), (110, 25), (210, 1)),
      q("d", (12, 5.0), (115, 4.0), (215, 5.5)))
    assert(Bench.contendedQueries(data).toSet == Set("a", "b", "c", "d"))
  }

  test("clean interleaved passes flag nothing") {
    val data = Seq(
      q("a", (0, 2), (100, 2.2), (200, 2.1)),
      q("b", (5, 3), (105, 3.1), (205, 3.0)),
      q("c", (8, 1), (108, 1.1), (208, 1.0)))
    assert(Bench.contendedQueries(data).isEmpty)
  }

  test("the r12 driver shapes: clean mins, poisoned later passes — " +
      "flagged by the spread rule alone") {
    // the literal r12 driver-artifact shapes that rule 1 missed
    // (every min was measured in a calm region, so "contended" came
    // back EMPTY on a 12x-spread artifact)
    val data = Seq(
      q("text_bpe_encode", (0, 5.889), (700, 16.663), (1400, 5.0)),
      q("dedup_semantic", (30, 2.95), (730, 2.29), (1430, 28.92)),
      q("quiet", (60, 1.0), (760, 1.05), (1460, 1.02)))
    assert(Bench.contendedQueries(data).toSet
      == Set("text_bpe_encode", "dedup_semantic"))
  }

  test("pass-1 warm-up is NOT contention; tiny absolute gaps are not " +
      "either") {
    val data = Seq(
      // 12x spread but the slow pass is pass 1 — JIT/codegen/footers
      q("warmup", (0, 12.0), (100, 1.5), (200, 1.4)),
      // >3x ratio on a later pass but the gap is immaterial (< 0.5 s)
      q("tiny", (5, 0.05), (105, 0.2), (205, 0.06)))
    assert(Bench.contendedQueries(data).isEmpty)
  }

  test("one query's slow later pass flags only that query") {
    val data = Seq(
      q("a", (0, 2.2), (100, 2.0), (200, 2.1)),
      q("b", (5, 2), (102, 40), (205, 2)),
      q("c", (300, 1), (400, 1.1), (500, 1.0)))
    // b's own artifact is poisoned (rule 2); a's min overlapping it
    // sees just one slow query (fewer than 3 distinct), so a stays
    // clean — rule 1 still requires the multi-query signature
    assert(Bench.contendedQueries(data) == Seq("b"))
  }

  test("every min inside the contended window is flagged") {
    // one load spike hits pass 2 of a whole region: a,b,c mark it slow
    // (and are themselves spread-poisoned); d and e both happened to
    // record their mins inside it
    val data = Seq(
      q("d", (112, 6.0), (12, 6.5), (212, 6.2)),
      q("a", (0, 2), (100, 40), (200, 2)),
      q("b", (5, 2), (105, 30), (205, 2)),
      q("e", (118, 3.0), (18, 3.3), (218, 3.1)),
      q("c", (8, 1), (110, 25), (210, 1)))
    assert(Bench.contendedQueries(data).toSet
      == Set("a", "b", "c", "d", "e"))
  }
}
