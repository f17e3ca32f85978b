package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.functions.TextOps
import graft.streaming.StreamingTokenize

/** Streaming tokenization: the frozen-tokenizer encode is stateless and
  * batch-boundary invariant; the per-source accounting fold's final
  * state equals the batch aggregate under any micro-batch split.
  */
class StreamingTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "low low low lower", "a"),
    (2L, "newest widest", "a"),
    (3L, "low lower lowest", "b"),
    (4L, "", "b"),
    (5L, "the low lands", "b")).toDF("doc_id", "text", "source")

  private lazy val merges = TextOps.bpeTrainMergesLocal(corpus, steps = 6)
    .orderBy("step").collect()
    .map(r => (r.getString(1), r.getString(2))).toSeq

  test("tokenCountStream: final state == batch aggregate under any " +
      "micro-batch split (commutative-monoid state)") {
    implicit val sqlCtx = spark.sqlContext
    // the operators are plain declarative transforms, so the BATCH
    // expectation is the same code run over the batch frame
    val expected = StreamingTokenize.tokenCountStream(corpus, merges)
      .as[(String, Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    def run(splits: Seq[Seq[(Long, String, String)]],
            name: String): Set[(String, Long, Long)] = {
      val ms = MemoryStream[(Long, String, String)]
      val q = StreamingTokenize.tokenCountStream(
        ms.toDF().toDF("doc_id", "text", "source"), merges)
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      splits.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[(String, Long, Long)].collect().toSet
    }
    val rows = corpus.as[(Long, String, String)].collect().toSeq
    assert(run(Seq(rows), "tok_one") == expected)
    assert(run(Seq(rows.take(2), rows.slice(2, 3), rows.drop(3)),
      "tok_three") == expected)
    assert(run(rows.reverse.map(Seq(_)), "tok_rev") == expected)
  }

  test("encodeStream: stateless append output == batch encode, " +
      "regardless of batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val expected = StreamingTokenize.encodeStream(corpus, merges)
      .as[(Long, String, Long, String)].collect().toSet
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingTokenize.encodeStream(
      ms.toDF().toDF("doc_id", "text", "source"), merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("tok_enc").start()
    val rows = corpus.as[(Long, String, String)].collect().toSeq
    ms.addData(rows.take(3): _*); q.processAllAvailable()
    ms.addData(rows.drop(3): _*); q.processAllAvailable()
    q.stop()
    assert(spark.table("tok_enc")
      .as[(Long, String, Long, String)].collect().toSet == expected)
    // the empty doc carries 0 tokens and the md5 of the empty encoding
    assert(expected.find(_._1 == 4L).get._3 == 0L)
  }
}
