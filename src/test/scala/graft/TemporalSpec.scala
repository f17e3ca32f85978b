package graft

import graft.operators.Temporal

/** As-of join semantics: visibility at equal times, tiebreak, atomic
  * payload carry, no-prior-state nulls.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), (2L, 15L, 100L), (3L, 20L, 100L), (4L, 5L, 200L)
  ).toDF("id", "t", "k")

  private def right = Seq(
    (100L, 10L, 7L, "a"), // same time as left id=1: visible (<=)
    (100L, 10L, 9L, "b"), // tie on (k, t): higher ord wins
    (100L, 18L, 1L, "c"),
    (300L, 1L, 1L, "z") // other key, never matched
  ).toDF("k", "rt", "ord", "v")

  test("asof: <= visibility, tiebreak by rightOrder, left-outer nulls") {
    val out = Temporal.asofJoin(left, right, key = "k",
      leftTime = "t", rightTime = "rt",
      payload = Seq("v", "ord"), rightOrder = "ord")
      .orderBy("id")
      .select("id", "v").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, Some("b")), // t=10: both t=10 rows visible, ord 9 wins
      (2L, Some("b")), // t=15: still the t=10 state
      (3L, Some("c")), // t=20: t=18 state
      (4L, None))) // key 200: no right rows at all
  }

  test("asof: payload fields never mix across right rows") {
    val out = Temporal.asofJoin(left, right, key = "k",
      leftTime = "t", rightTime = "rt",
      payload = Seq("v", "ord"), rightOrder = "ord")
      .filter($"id" === 3L).select("v", "ord")
      .as[(String, Long)].head()
    assert(out == (("c", 1L))) // both fields from the SAME (t=18) row
  }

  test("rangeJoinBinned: inclusive bounds, bin-boundary crossing, key isolation") {
    // lookback 10; a left row at t=25 must see right rows in [15, 25]
    val l = Seq((1L, "k", 25L), (2L, "k", 100L), (3L, "other", 25L))
      .toDF("lid", "key", "lt")
    val r = Seq(
      ("k", 15L, "at-lower-bound"),  // == lt - lookback → included
      ("k", 14L, "below"),           // just outside
      ("k", 19L, "prev-bin"),        // bin 1 while the left row sits in bin 2
      ("k", 25L, "at-upper-bound"),  // == lt → included
      ("k", 26L, "future"),
      ("other", 20L, "other-key"))
      .toDF("key", "rt", "tag")
    val out = Temporal.rangeJoinBinned(l, r, "key", "lt", "rt", 10L)
      .select("lid", "tag").as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "at-lower-bound"), (1L, "prev-bin"), (1L, "at-upper-bound"),
      (3L, "other-key")))
  }
}
