package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention self-arbitration
  * ([[Bench.contendedQueries]]): a query is flagged iff its reported min
  * pass overlaps a region where ≥ 3 distinct queries simultaneously ran
  * > 3× their own suite median — the r5/r8 driver-artifact pollution
  * signature, made machine-readable.
  */
class BenchContentionSpec extends AnyFunSuite {

  // three passes per query: (startOffsetSec, durationSec)
  private def q(name: String, ps: (Double, Double)*) = name -> ps.toSeq

  test("a min pass inside a multi-query slow region is flagged") {
    // a,b,c all blow up 3x+ in the window [100,140]; d's MIN pass (its
    // pass 2) sits inside that window -> d's min is untrustworthy
    val data = Seq(
      q("a", (0, 2), (100, 40), (200, 2)),
      q("b", (5, 2), (105, 30), (205, 2)),
      q("c", (8, 1), (110, 25), (210, 1)),
      q("d", (12, 5.0), (115, 4.0), (215, 5.5)))
    assert(Bench.contendedQueries(data) == Seq("d"))
  }

  test("clean interleaved passes flag nothing") {
    val data = Seq(
      q("a", (0, 2), (100, 2.2), (200, 2.1)),
      q("b", (5, 3), (105, 3.1), (205, 3.0)),
      q("c", (8, 1), (108, 1.1), (208, 1.0)))
    assert(Bench.contendedQueries(data).isEmpty)
  }

  test("one slow query alone is genuine cost, not contention") {
    // only b is slow in [100,140]: a's min overlapping it sees just one
    // slow query (fewer than 3 distinct) -> no flag
    val data = Seq(
      q("a", (0, 2.2), (100, 2.0), (200, 2.1)),
      q("b", (5, 2), (102, 40), (205, 2)),
      q("c", (300, 1), (400, 1.1), (500, 1.0)))
    assert(Bench.contendedQueries(data).isEmpty)
  }

  test("every min inside the contended window is flagged, in suite order") {
    // one load spike hits pass 2 of a whole region: a,b,c mark it slow;
    // d and e both happened to record their mins inside it
    val data = Seq(
      q("d", (112, 6.0), (12, 6.5), (212, 6.2)),
      q("a", (0, 2), (100, 40), (200, 2)),
      q("b", (5, 2), (105, 30), (205, 2)),
      q("e", (118, 3.0), (18, 3.3), (218, 3.1)),
      q("c", (8, 1), (110, 25), (210, 1)))
    assert(Bench.contendedQueries(data) == Seq("d", "e"))
  }
}
