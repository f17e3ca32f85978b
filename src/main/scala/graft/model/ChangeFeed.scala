package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Opcodes of the mutation stream, mirroring the reference DCP event types
  * handled in `TransformRoute` (reference `Projector/indexjs.go:93-98,123,175`).
  */
object Opcode {
  val Mutation = "MUTATION"
  val Deletion = "DELETION"
  val Expiration = "EXPIRATION"
}

/** A single change event. Columnar twin of the reference's per-mutation
  * input (docid/value/oldValue/meta — `Projector/indexjs.go:101-108`);
  * `partition` is the vbucket analog, `seqno` the per-partition sequence.
  */
final case class ChangeEvent(
    opcode: String,
    docid: Long,
    value: Option[Double],
    oldValue: Option[Double],
    partition: Int,
    seqno: Long)

/** Canonical mapping of the TESTDATA `events` table onto the engine's
  * change-stream schema (FIXTURES.md §3/§7). One place so queries, oracles
  * and tests agree:
  *
  *   docid     = user_id
  *   seqno     = event_id              (globally unique, monotone)
  *   partition = user_id % 32          (vbucket analog)
  *   opcode    = error → DELETION, view → EXPIRATION, else MUTATION
  *   value     = value                 (the doc payload the key derives from)
  *
  * The projection is a handful of `Column` expressions, so Catalyst prunes
  * the parquet scan to exactly (event_id, user_id, event_type, value) and
  * pushes any downstream seqno/opcode filter into the scan.
  */
object ChangeFeed {

  val opcodeCol: Column =
    when(col("event_type") === "error", Opcode.Deletion)
      .when(col("event_type") === "view", Opcode.Expiration)
      .otherwise(Opcode.Mutation)

  /** events table → change-stream DataFrame (opcode, docid, value, partition, seqno). */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      opcodeCol.as("opcode"),
      col("user_id").as("docid"),
      col("value").as("value"),
      (col("user_id") % 32).cast("int").as("partition"),
      col("event_id").as("seqno"))

  /** Equivalent SQL fragment for the DuckDB oracle (same semantics as
    * [[fromEvents]]); interpolate into oracle queries.
    */
  val oracleSelect: String =
    """SELECT CASE WHEN event_type = 'error' THEN 'DELETION'
      |            WHEN event_type = 'view' THEN 'EXPIRATION'
      |            ELSE 'MUTATION' END AS opcode,
      |       user_id AS docid, value, event_id AS seqno
      |FROM events""".stripMargin
}
