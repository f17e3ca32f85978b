package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators.{IndexBuilder, IndexMaintainer}

/** M3 incremental maintenance: upsert/retraction merge (O6), WHERE-set exit,
  * delete-broadcast (O8), retain-deleted (O14), immutable fast path, and the
  * SURVEY §5.3a invariant: incremental replay ≡ rebuild from final snapshot.
  */
class IndexMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val defn = IndexDef("i", "ch", "docid",
    secExprs = Seq("value"), whereExpr = Some("value >= 0"))

  private def batch(rows: (String, Long, java.lang.Double, Long)*): DataFrame =
    rows.toSeq.toDF("opcode", "docid", "value", "seqno")
      .select(col("opcode"), col("docid"), col("value").cast("double"), col("seqno"))

  private def emptyIdx: DataFrame =
    spark.range(0).select(col("id").cast("double").as("key"), col("id").as("docid"))

  private def entries(idx: DataFrame): Set[(Double, Long)] =
    idx.select(col("key"), col("docid")).as[(Double, Long)].collect().toSet

  test("upsert inserts; key change retracts the old entry") {
    val i1 = IndexMaintainer.merge(emptyIdx,
      batch(("MUTATION", 1L, 5.0, 1L)), defn)
    assert(entries(i1) == Set((5.0, 1L)))
    val i2 = IndexMaintainer.merge(i1, batch(("MUTATION", 1L, 7.0, 2L)), defn)
    assert(entries(i2) == Set((7.0, 1L))) // old (5.0, 1) retracted
  }

  test("WHERE-set exit deletes the entry (UpsertDeletion)") {
    val i1 = IndexMaintainer.merge(emptyIdx, batch(("MUTATION", 1L, 5.0, 1L)), defn)
    val i2 = IndexMaintainer.merge(i1, batch(("MUTATION", 1L, -3.0, 2L)), defn)
    assert(entries(i2).isEmpty)
  }

  test("DELETION and EXPIRATION remove the docid's entries") {
    val i1 = IndexMaintainer.merge(emptyIdx,
      batch(("MUTATION", 1L, 5.0, 1L), ("MUTATION", 2L, 6.0, 2L)), defn)
    val i2 = IndexMaintainer.merge(i1,
      batch(("DELETION", 1L, null, 3L), ("EXPIRATION", 2L, null, 4L)), defn)
    assert(entries(i2).isEmpty)
  }

  test("last writer wins within one batch (seqno order)") {
    val i1 = IndexMaintainer.merge(emptyIdx, batch(
      ("MUTATION", 1L, 5.0, 1L),
      ("MUTATION", 1L, 9.0, 3L),
      ("MUTATION", 1L, 7.0, 2L)), defn)
    assert(entries(i1) == Set((9.0, 1L)))
  }

  test("retainDeletedXattr treats DELETION as MUTATION (O14)") {
    val d = defn.copy(retainDeletedXattr = true)
    val i1 = IndexMaintainer.merge(emptyIdx,
      batch(("DELETION", 1L, 5.0, 1L)), d)
    assert(entries(i1) == Set((5.0, 1L)))
  }

  test("immutable index appends without retraction") {
    val d = defn.copy(immutable = true)
    val i1 = IndexMaintainer.merge(emptyIdx, batch(("MUTATION", 1L, 5.0, 1L)), d)
    val i2 = IndexMaintainer.merge(i1, batch(("MUTATION", 1L, 7.0, 2L)), d)
    assert(entries(i2) == Set((5.0, 1L), (7.0, 1L)))
  }

  test("deleteBroadcast removes all entries of the docids (O8)") {
    val idx = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L)).toDF("key", "docid")
    val dels = Seq(1L).toDF("docid")
    assert(entries(IndexMaintainer.deleteBroadcast(idx, dels)) == Set((3.0, 2L)))
  }

  test("deleteBroadcast above the broadcast threshold uses a shuffle anti-join") {
    val idx = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L), (4.0, 3L)).toDF("key", "docid")
    val dels = Seq(1L, 2L).toDF("docid")
    // threshold of 1 row forces the non-broadcast path; semantics identical
    val out = IndexMaintainer.deleteBroadcast(idx, dels, maxBroadcastRows = 1L)
    assert(entries(out) == Set((4.0, 3L)))
  }

  test("primary index merge: upserts and deletions on docid only") {
    val d = IndexDef("pk", "ch", "docid", isPrimary = true)
    val empty = spark.range(0).select(col("id").as("docid"))
    val i1 = IndexMaintainer.merge(empty,
      batch(("MUTATION", 1L, 5.0, 1L), ("MUTATION", 2L, 6.0, 2L)), d)
    assert(i1.as[Long].collect().toSet == Set(1L, 2L))
    val i2 = IndexMaintainer.merge(i1, batch(("DELETION", 1L, null, 3L)), d)
    assert(i2.as[Long].collect().toSet == Set(2L))
  }

  test("function-keyed merge fails fast with a clear message") {
    val d = IndexDef("fn", "ch", "docid", funcName = Some("some_fn"))
    val e = intercept[IllegalArgumentException] {
      IndexMaintainer.merge(emptyIdx, batch(("MUTATION", 1L, 5.0, 1L)), d)
    }
    assert(e.getMessage.contains("function-keyed"))
  }

  test("property: incremental replay == rebuild from final snapshot (§5.3a)") {
    val r = new Random(42)
    val nDocs = 20
    val events = (1 to 200).map { seq =>
      val docid = r.nextInt(nDocs).toLong
      r.nextInt(4) match {
        case 0 => ("DELETION", docid, null.asInstanceOf[java.lang.Double], seq.toLong)
        case _ => ("MUTATION", docid,
          java.lang.Double.valueOf((r.nextInt(41) - 20).toDouble), seq.toLong)
      }
    }
    // incremental: 5 batches in seqno order
    var idx = emptyIdx
    events.grouped(40).foreach { g => idx = IndexMaintainer.merge(idx, batch(g: _*), defn) }
    // rebuild: final state per docid, then batch-built index
    val finalState = events.groupBy(_._2).map { case (_, evs) => evs.maxBy(_._4) }
      .filter(e => e._1 == "MUTATION" && e._3 != null && e._3 >= 0).toSeq
    val expected = finalState.map(e => (e._3.doubleValue, e._2)).toSet
    assert(entries(idx) == expected)
  }

  test("scanAtSeqno reproduces the state at a cutoff (O16 Query consistency)") {
    val changes = batch(
      ("MUTATION", 1L, 5.0, 1L), ("MUTATION", 1L, 9.0, 10L),
      ("MUTATION", 2L, 3.0, 4L), ("DELETION", 2L, null, 12L))
    val atSeq5 = IndexMaintainer.scanAtSeqno(emptyIdx, changes, defn, cutoff = 5L)
    assert(entries(atSeq5) == Set((5.0, 1L), (3.0, 2L)))
    val atEnd = IndexMaintainer.scanAtSeqno(emptyIdx, changes, defn, cutoff = 99L)
    assert(entries(atEnd) == Set((9.0, 1L)))
  }

  test("scanSession == full merge at the current high-water mark (O16)") {
    val changes = batch(
      ("MUTATION", 1L, 5.0, 1L), ("MUTATION", 1L, 9.0, 10L),
      ("MUTATION", 2L, 3.0, 4L))
    val session = IndexMaintainer.scanSession(emptyIdx, changes, defn)
    val full = IndexMaintainer.merge(emptyIdx, changes, defn)
    assert(entries(session) == entries(full))
  }
}
