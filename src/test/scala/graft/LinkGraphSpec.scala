package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph
import graft.streaming.EpochStore

/** [[LinkGraph]] — the standing link-graph store: seed/ingest
  * idempotency, duplicate-observation folding, and the rank
  * equivalence (stored + maintained == one-shot full graph) plus the
  * closed-form integer PageRank facts on a hand graph.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  test("integer pagerank on a hand graph: closed-form nanos") {
    // a -> b, b -> a, c dangling (no outlinks), c <- a
    val e = edgesDf("a" -> "b", "b" -> "a", "a" -> "c")
    val pr = LinkGraph.ranks(e, iters = 1).orderBy("node")
      .select("node", "pr").as[(String, Long)].collect().toMap
    // n=3, pr0 = 333333333 each; dangling = c's 333333333
    // a: 15%*333333333 + 85%*(b's 333333333/1 + 333333333/3)
    val base = 1000000000L / 3
    val dang = base / 3
    assert(pr("a") == (15 * base) / 100 + (85 * (base + dang)) / 100)
    // b and c each get half of a's mass (outdeg 2)
    assert(pr("b") == (15 * base) / 100 + (85 * (base / 2 + dang)) / 100)
    assert(pr("c") == pr("b"))
  }

  test("seed + ingest + REDELIVERY: duplicate observations fold; " +
      "stored graph ranks identically to the one-shot build") {
    val all = edgesDf("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "d" -> "a")
    val root = Scratch.dir("graft_lg_spec")
    val ref = LinkGraph.seed(all.limit(3), root)
    val wave = all.orderBy("src", "dst") // deterministic remainder
    LinkGraph.ingest(wave, ref, batchId = 1L)
    LinkGraph.ingest(wave, ref, batchId = 1L) // redelivered wholesale
    val stored = LinkGraph.edges(spark, ref)
    assert(stored.count() == 5, "5 distinct edges, not 5+redelivery")
    val a = LinkGraph.ranks(stored).orderBy("node")
      .select("node", "pr").as[(String, Long)].collect().toSeq
    val b = LinkGraph.ranks(all.distinct()).orderBy("node")
      .select("node", "pr").as[(String, Long)].collect().toSeq
    assert(a == b)
  }

  test("batch 0 is the seed's exclusive slot; waves must use ids >= 1") {
    val root = Scratch.dir("graft_lg_spec_ids")
    val ref = LinkGraph.seed(edgesDf("a" -> "b"), root)
    intercept[IllegalArgumentException](
      LinkGraph.ingest(edgesDf("b" -> "c"), ref, batchId = 0L))
    // the epoch is committed and readable
    assert(EpochStore.epochs(root) == Seq(ref.epoch))
  }
}
