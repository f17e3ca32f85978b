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

  /** Streaming ingest near-dup screening: each arriving micro-batch of
    * documents is probed against the standing corpus's LSH buckets
    * ([[graft.operators.Dedup.minhashLshIncremental]]) and the detected
    * (new_id, dup_of, jaccard) pairs are appended to `sink` — the shape
    * of a continuously-deduplicating ingest front door. The corpus (in
    * production: the PERSISTED signature/bucket index) is supplied once;
    * each batch touches only the buckets it lands in. Per-batch results
    * are independent (batch docs are compared to the corpus, not each
    * other — intra-batch duplicates are [[exactStream]]'s job), so the
    * output is the same whatever the batch boundaries.
    */
  def nearDupIngest(corpus: DataFrame, stream: DataFrame,
                    sink: (DataFrame, Long) => Unit,
                    threshold: Double = 0.5, hashKind: String = "xx",
                    textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Dedup.minhashLshIncremental(
        corpus, batch, threshold, textCol = textCol, idCol = idCol,
        hashKind = hashKind), batchId)
    }

  /** Streaming near-dup ingest against a GROWING persisted bucket store —
    * the production form of [[nearDupIngest]]: the store under
    * `storeDir` (`sigs/` + `buckets/` parquet,
    * [[graft.operators.Dedup.minhashStoreTables]] shape, seeded with the
    * standing corpus) is both probed AND maintained by every arriving
    * micro-batch:
    *
    *   1. the batch's hashed-shingle and bucket rows (computed ONCE —
    *      the shingle/signature pass is the dominant per-batch cost)
    *      APPEND to the store first, so the store always contains the
    *      batch itself;
    *   2. the same bucket table then probes the store
    *      ([[graft.operators.Dedup.minhashLshProbeStore]] — canonical
    *      id_a < id_b pairs, store side re-guarded at `maxBucket` so a
    *      degenerate bucket that grew through appends stops feeding the
    *      join), touching only the buckets the batch lands in;
    *   3. detected pairs append to `pairs/`.
    *
    * Append-before-probe + canonical pairs make `distinct(pairs)` after
    * any prefix of the stream equal the ONE-SHOT probe of all arrivals
    * against the final store, whatever the batch boundaries: a pair
    * inside one batch is found by that batch (its rows are already in
    * the store), a pair across batches is found by the later one, and
    * re-detections collapse under the canonical form. One caveat bounds
    * the invariance exactly: the skew guard reads the store AS OF each
    * probe, so pairs in a bucket that crosses `maxBucket` MID-stream
    * may be found by early batches and not by a one-shot run — the
    * guard trades recall in degenerate buckets for bounded join fan-out
    * (its standing purpose), and outside such buckets the invariance is
    * exact. The oracled `dedup_streaming_neardup` query pins the
    * one-shot form against an independent DuckDB replay; the
    * split-invariance test pins multi-batch ≡ one-shot on guard-clean
    * data.
    */
  def nearDupIngestStore(spark: org.apache.spark.sql.SparkSession,
                         storeDir: String, stream: DataFrame,
                         threshold: Double = 0.5, numHashes: Int = 64,
                         bands: Int = 16, shingleN: Int = 3,
                         maxBucket: Int = 64,
                         textCol: String = "text", idCol: String = "doc_id",
                         hashKind: String = "xx")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (sets, buckets) = graft.operators.Dedup.minhashStoreTables(
        batch, numHashes, bands, shingleN, textCol, idCol, hashKind)
      sets.write.mode("append").parquet(s"$storeDir/sigs")
      buckets.write.mode("append").parquet(s"$storeDir/buckets")
      graft.operators.Dedup.minhashLshProbeStore(
          spark.read.parquet(s"$storeDir/sigs"),
          spark.read.parquet(s"$storeDir/buckets"),
          buckets, threshold, maxBucket)
        .write.mode("append").parquet(s"$storeDir/pairs")
    }

  /** Streaming ingest SPAN screening against a PERSISTED epoch-frozen
    * fingerprint store — the production form of [[spanIngest]]: the
    * corpus's distinct window fingerprints are computed ONCE
    * ([[graft.operators.Dedup.spanStoreSigs]], seeded under
    * `storeDir/spansigs`) and every arriving micro-batch
    *
    *   1. probes the FROZEN store
    *      ([[graft.operators.Dedup.duplicatedSpansAgainstSigs]]) and
    *      appends per-doc coverage rows to `coverage/`;
    *   2. appends its own distinct window fingerprints to
    *      `spansigs_next/` — the accumulation a store rotation folds in
    *      when the next epoch's corpus snapshot is cut.
    *
    * Probing a frozen epoch makes per-doc scores trivially
    * batch-boundary-invariant (each doc's coverage depends only on the
    * store, never on co-arrivals), which is exactly the semantics the
    * batch operator `dedup_span_incremental` oracles — the streaming
    * form must and does reproduce it (`dedup_streaming_spans`).
    */
  def spanIngestStore(spark: org.apache.spark.sql.SparkSession,
                      storeDir: String, stream: DataFrame,
                      k: Int = 8, textCol: String = "text",
                      idCol: String = "doc_id", hashKind: String = "xx")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.operators.Dedup.duplicatedSpansAgainstSigs(
          spark.read.parquet(s"$storeDir/spansigs"),
          batch, k, textCol, idCol, hashKind)
        .write.mode("append").parquet(s"$storeDir/coverage")
      graft.operators.Dedup.spanStoreSigs(batch, k, textCol, hashKind)
        .write.mode("append").parquet(s"$storeDir/spansigs_next")
    }

  /** Streaming ingest SPAN screening: each arriving micro-batch's docs
    * get their duplicated-span coverage against the standing corpus's
    * window-fingerprint set
    * ([[graft.operators.Dedup.duplicatedSpansIncremental]]) appended to
    * `sink` — the boilerplate detector of a continuously-ingesting
    * pipeline. Batch docs are screened against the corpus only (never
    * each other), so output is batch-boundary-invariant like
    * [[nearDupIngest]].
    */
  def spanIngest(corpus: DataFrame, stream: DataFrame,
                 sink: (DataFrame, Long) => Unit,
                 k: Int = 8, hashKind: String = "xx",
                 textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Dedup.duplicatedSpansIncremental(
        corpus, batch, k, textCol = textCol, idCol = idCol,
        hashKind = hashKind), batchId)
    }
}
