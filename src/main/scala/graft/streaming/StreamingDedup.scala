package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Streaming exact deduplication: the arrival-time form of
  * [[graft.operators.Dedup.exact]]. Each micro-batch folds into the
  * per-content-hash state (smallest doc id seen, total occurrences); the
  * result after any prefix of the stream equals the batch operator over
  * the same rows — order-insensitive by construction (min and count are
  * commutative monoids), so ingestion parallelism and batch boundaries
  * cannot change the answer.
  *
  * Scale shape: the same map-side-partial hash aggregate as the batch
  * form, maintained by the streaming aggregation state store keyed on the
  * 32-byte digest. Complete-mode output suits bounded digests/demo sinks;
  * a 100 TB ingest emits UPDATE mode into a keyed store instead (same
  * aggregate, same state), or routes through
  * [[StreamingIndex.maintain]] with the hash as the index key for a
  * persisted, partition-incremental form.
  */
object StreamingDedup {

  /** Per-content-hash streaming aggregate: (text_hash, keep_id, dup_count). */
  def exactStream(stream: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    stream.groupBy(TextOps.fingerprintMd5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
}
