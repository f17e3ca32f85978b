package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.model.{ChangeEvent, IndexDef, Opcode}
import graft.operators.IndexMaintainer

/** Streaming index maintenance — the MAINT_STREAM/topic machinery of the
  * reference (stream lifecycle O17, failover/rollback O18/O19) re-expressed
  * as Structured Streaming, where checkpointing subsumes the reference's
  * failover-log/rollback protocol (SURVEY §3 EP1, §4).
  *
  * Two idiomatic forms:
  *
  *  - [[maintain]]: `foreachBatch` merge into a versioned parquet index.
  *    Exactly-once across restarts because the write is idempotent per
  *    `batchId` (retry of batch N rewrites `v=N`, never appends — the
  *    requirement called out in SURVEY §7.4.4).
  *  - [[deltaStream]]: typed `flatMapGroupsWithState` keeping the
  *    docid → last-emitted-key back-index and emitting retraction/upsert
  *    deltas — the reference's per-mutation old-key/new-key routing
  *    (`Projector/indexjs.go:103-189`) as managed Spark state, solving the
  *    "source carries no oldValue" problem (SURVEY §7.4.1) without the
  *    reference's delete-broadcast.
  */
object StreamingIndex {

  /** An index entry change: op = +1 upsert, -1 retraction. */
  final case class IndexDelta(docid: Long, op: Int, key: Double)

  /** Start a streaming maintenance query: each micro-batch merges into the
    * index at `indexDir/v=<batchId>`; the latest version is the index.
    */
  def maintain(changes: DataFrame, defn: IndexDef, indexDir: String,
               checkpointDir: String,
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val current = readLatest(spark, indexDir, batchId, defn)
        IndexMaintainer.merge(current, batch, defn)
          .write.mode("overwrite").parquet(s"$indexDir/v=$batchId")
        ()
      }
      .start()

  /** Maintain MANY indexes from ONE stream pass — the reference's topic
    * topology (one projector feed drives an evaluator ENGINE MAP, one entry
    * per index instance, reference `projector.go:787-813`; instances are
    * added/removed per topic, `:641-717`). The micro-batch is cached once
    * and each index definition merges from it; a failure in one index does
    * not poison the others (per-index isolation, like the reference's
    * per-engine error handling).
    */
  def maintainAll(changes: DataFrame, defns: Seq[(IndexDef, String)],
                  checkpointDir: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.persist()
        // Attempt every index (one bad index doesn't stop the others'
        // writes) but FAIL the batch if any failed: the checkpoint must not
        // commit a batch an index hasn't applied, or that index silently
        // loses the batch forever. Retry is safe — writes are idempotent
        // per (indexDir, batchId).
        val failures = try defns.flatMap { case (defn, indexDir) =>
          try {
            val current = readLatest(spark, indexDir, batchId, defn)
            IndexMaintainer.merge(current, batch, defn)
              .write.mode("overwrite").parquet(s"$indexDir/v=$batchId")
            None
          } catch { case e: Throwable =>
            System.err.println(s"[maintainAll] ${defn.name}: ${e.getMessage}")
            Some(defn.name -> e)
          }
        } finally batch.unpersist()
        failures.headOption.foreach { case (name, e) =>
          throw new RuntimeException(
            s"batch $batchId failed for ${failures.map(_._1).mkString(", ")}", e)
        }
      }
      .start()

  /** Latest committed index version strictly below `beforeBatch` (empty
    * index when none) — idempotent-retry-safe version resolution.
    */
  def readLatest(spark: SparkSession, indexDir: String, beforeBatch: Long,
                 defn: IndexDef): DataFrame = {
    val versions = listVersions(indexDir).filter(_ < beforeBatch)
    if (versions.isEmpty) emptyIndex(spark, defn)
    else spark.read.parquet(s"$indexDir/v=${versions.max}")
  }

  def currentIndex(spark: SparkSession, indexDir: String, defn: IndexDef): DataFrame = {
    val versions = listVersions(indexDir)
    if (versions.isEmpty) emptyIndex(spark, defn)
    else spark.read.parquet(s"$indexDir/v=${versions.max}")
  }

  private def listVersions(indexDir: String): Seq[Long] = {
    val dir = Paths.get(indexDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = Files.list(dir)
    try stream.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("v=") && Files.exists(p.resolve("_SUCCESS")))
        out += n.drop(2).toLong
    } finally stream.close() // Files.list leaks a directory fd if not closed
    out.toSeq
  }

  private def emptyIndex(spark: SparkSession, defn: IndexDef): DataFrame = {
    import spark.implicits._
    // key schema from the defn's expressions over an empty change frame
    val proto = Seq.empty[ChangeEvent].toDF()
    if (defn.isPrimary) proto.select(col("docid"))
    else {
      val keyCols = defn.secExprs.zip(
        graft.operators.IndexBuilder.keyNames(defn.secExprs.length))
        .map { case (e, n) => expr(e).as(n) }
      proto.select(keyCols :+ col("docid"): _*)
    }
  }

  /** Typed stateful form: docid-grouped change events → index deltas, with
    * the docid → last-key back-index held in `GroupState`. Emits a
    * retraction for the previous key (if any) and an upsert for the new one.
    */
  def deltaStream(spark: SparkSession,
                  changes: org.apache.spark.sql.Dataset[ChangeEvent],
                  whereMin: Option[Double] = None)
      : org.apache.spark.sql.Dataset[IndexDelta] = {
    import spark.implicits._
    changes.groupByKey(_.docid)
      .flatMapGroupsWithState[Double, IndexDelta](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (docid: Long, events: Iterator[ChangeEvent], state: GroupState[Double]) => {
          var deltas = List.empty[IndexDelta]
          events.toSeq.sortBy(_.seqno).foreach { ev =>
            val newKey: Option[Double] = ev.opcode match {
              case Opcode.Mutation =>
                ev.value.filter(v => whereMin.forall(v >= _))
              case _ => None // DELETION / EXPIRATION
            }
            val oldKey = if (state.exists) Some(state.get) else None
            if (oldKey != newKey) {
              oldKey.foreach(k => deltas ::= IndexDelta(docid, -1, k))
              newKey.foreach(k => deltas ::= IndexDelta(docid, 1, k))
              newKey match {
                case Some(k) => state.update(k)
                case None => state.remove()
              }
            }
          }
          deltas.reverseIterator
        })
  }
}
