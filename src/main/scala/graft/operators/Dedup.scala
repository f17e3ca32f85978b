package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.plans.LazyCheckpoint

/** Corpus deduplication operators — the training-data-pipeline extension
  * set (beyond the reference surface; SURVEY §7.1 M5).
  *
  * Scale shapes:
  *  - exact dedup: one hash-aggregate on a content fingerprint (map-side
  *    partial agg → one shuffle keyed on the hash; no row ever carries the
  *    full text through the shuffle, only the 32-byte digest + id).
  *  - MinHash/LSH and SimHash: candidate generation is bucket-equi-join on
  *    band/chunk hashes — pairs are only materialized inside a bucket, never
  *    the O(n²) cross product. Oversized buckets (degenerate content skew)
  *    are dropped with an explicit cap, the standard skew guard at corpus
  *    scale.
  */
object Dedup {

  /** Merge-walk Jaccard over two sorted long arrays (the
    * [[graft.functions.HashedShinglesExpr]] output contract).
    */
  private def jaccardSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.JaccardSortedExpr(
      org.apache.spark.sql.GraftBridge.expression(a),
      org.apache.spark.sql.GraftBridge.expression(b)))

  /** All k-token rolling-window fingerprints of a token array, one native
    * pass. Kind "xx" (the scale default): 8-byte xxhash64 longs
    * ([[graft.functions.SpanHashesExpr]]) — window EQUALITY is all span
    * dedup consumes, so the coverage/rewrite outputs are identical to the
    * md5 form while the occurrence-count shuffle carries fixed-width longs
    * instead of 32-hex-char strings. Kind "md5": the cross-engine
    * fingerprints ([[graft.functions.SpanDigestsExpr]]), bit-identical to
    * `transform(sequence(1, n-k+1), i -> md5(concat_ws(' ', slice(toks, i,
    * k))))` and therefore to what a DuckDB/SQL engine recomputes — for
    * exporting or joining fingerprints across engines.
    */
  private def spanFingerprints(toks: Column, k: Int, hashKind: String): Column = {
    val e = org.apache.spark.sql.GraftBridge.expression(toks)
    org.apache.spark.sql.GraftBridge.column(hashKind match {
      case "xx" => graft.functions.SpanHashesExpr(e, k)
      case "md5" => graft.functions.SpanDigestsExpr(e, k)
      case other => throw new IllegalArgumentException(
        s"unknown span hash kind: $other (use 'xx' or 'md5')")
    })
  }

  /** Exact dedup on normalized content hash. Output: one row per distinct
    * content, the smallest docid as the keeper, and the duplicate count.
    */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextOps.fingerprintMd5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact word-set Jaccard over candidate pairs blocked by `blockCol`
    * (same-block pairs only — the deterministic, oracle-checkable core of
    * near-dup detection; LSH below generates blocks when no natural key
    * exists). Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def jaccardPairs(docs: DataFrame, blockCol: String, threshold: Double,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // token sets as xxhash64 longs: identical intersection/union COUNTS
    // (collisions vanishingly rare), far cheaper set ops per pair than
    // string arrays — the jaccard values equal the string-set oracle's
    blockedJaccard(docs.select(
      col(blockCol).as("block"), col(idCol).as("id"),
      array_distinct(transform(TextOps.normTokens(col(textCol)),
        t => xxhash64(t))).as("toks")), threshold)
  }

  /** The blocked self-join + lossless length filter + exact Jaccard
    * verify shared by [[jaccardPairs]] and [[ngramJaccardPairs]] (one
    * copy of the subtle parts: `jaccard >= t` forces `t·|B| <= |A|`
    * and vice versa, so size-mismatched pairs never pay the set ops).
    * Input: (block, id, toks) with toks a distinct element set.
    */
  private def blockedJaccard(sets0: DataFrame,
                             threshold: Double): DataFrame = {
    val sets = sets0.withColumn("n", size(col("toks")))
    val a = sets.as("a"); val b = sets.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id") &&
        col("a.n") >= col("b.n") * threshold &&
        col("b.n") >= col("a.n") * threshold)
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
          size(array_union(col("a.toks"), col("b.toks")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Word n-gram (shingle) Jaccard over candidate pairs blocked by
    * `blockCol` — [[jaccardPairs]] with n-gram sets instead of word sets
    * (order-sensitive: shared vocabulary in different order stops matching
    * at n >= 2). String shingles, not hashed — oracle-comparable.
    */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, threshold: Double,
                        n: Int = 3, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    blockedJaccard(docs.select(
      col(blockCol).as("block"), col(idCol).as("id"),
      TextOps.shingles(col(textCol), n).as("toks")), threshold)
  }

  /** (id, hs): distinct hashed shingles per doc, ONE native pass over the
    * text — tokenization, shingle windows, hashing and hash-dedup fused
    * ([[graft.functions.HashedShinglesExpr]]). This is the table BOTH the
    * signature pass and the exact-Jaccard verify consume, so each shingle
    * is hashed exactly once per corpus scan.
    */
  def hashedShingleSets(docs: DataFrame, shingleN: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id",
                        hashKind: String = "xx"): DataFrame =
    docs.select(col(idCol).as("id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.HashedShinglesExpr(
          org.apache.spark.sql.GraftBridge.expression(col(textCol)),
          shingleN, hashKind)).as("hs"))

  /** Signature matrix from a hashed-shingle table ([[hashedShingleSets]]
    * output): one row per doc, `numHashes` min-hash values unpacked to
    * columns m0..m{n-1}. The lazy checkpoint is the barrier that stops
    * CollapseProject from inlining the signature expression into all
    * numHashes getItems (×64 evaluation) — and the materialized array is
    * the persisted signature matrix a corpus-scale run reuses across LSH
    * parameter sweeps.
    */
  def signaturesFromHashes(hs: DataFrame, numHashes: Int = 64,
                           hashKind: String = "xx"): DataFrame = {
    val sig = org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashFromHashesExpr(
        org.apache.spark.sql.GraftBridge.expression(col("hs")), numHashes, hashKind))
    LazyCheckpoint.shared(hs.select(col("id"), sig.as("__sig")))
      .select(col("id") +:
        (0 until numHashes).map(i => col("__sig").getItem(i).as(s"m$i")): _*)
      // a doc whose text yields NO shingles has no signature (the
      // Long.MaxValue sentinel survives only in that case)
      .filter(col("m0") =!= Long.MaxValue)
  }

  /** MinHash signature matrix straight from documents: one row per doc,
    * `numHashes` min-hash values — [[hashedShingleSets]] piped through
    * [[signaturesFromHashes]]. A pure map over the corpus scan: no
    * explode (×shingles row blowup), no signature shuffle. Docs whose
    * text yields NO shingles emit no signature row (they cannot
    * near-duplicate anything).
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64, shingleN: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id",
                        hashKind: String = "xx"): DataFrame =
    signaturesFromHashes(
      hashedShingleSets(docs, shingleN, textCol, idCol, hashKind),
      numHashes, hashKind)

  /** (id, band, bucket): the banded LSH bucket table of a signature
    * matrix — the thing a corpus-scale run PERSISTS as its near-dup index
    * (see `idx_lsh_buckets` for the index-machinery form).
    *
    * Default bucket key: one xxhash64 long over the band's signature
    * values — 8 bytes through the banding shuffle. The string form (the
    * values joined verbatim) is the engine-neutral formulation the SQL
    * oracle reproduces; only the oracled md5 family pays its ~10× key
    * size.
    */
  def bandBuckets(signatures: DataFrame, bands: Int, rowsPerBand: Int,
                  bucketAsString: Boolean = false): DataFrame = {
    val bandCols = (0 until bands).map { bnd =>
      val slice = (0 until rowsPerBand).map(r => col(s"m${bnd * rowsPerBand + r}"))
      val bucket =
        if (bucketAsString) concat_ws(",", slice: _*)
        else xxhash64(lit(bnd) +: slice: _*)
      struct(lit(bnd).as("band"), bucket.as("bucket"))
    }
    signatures
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH candidate pairs from banded MinHash signatures: docs sharing any
    * band bucket. `maxBucket` caps degenerate buckets (skew guard).
    */
  def minhashCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int,
                        maxBucket: Int = 64,
                        bucketAsString: Boolean = false): DataFrame = {
    val buckets = bandBuckets(signatures, bands, rowsPerBand, bucketAsString)
    val sized = buckets.groupBy("band", "bucket")
      .agg(collect_list("id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucket))
    // pairs within a bucket, deduped across bands
    sized.select(explode(col("ids")).as("id_a"), col("ids"), col("band"), col("bucket"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** End-to-end MinHash+LSH near-dup detection: candidates from banding,
    * verified with exact shingle Jaccard. Output: (id_a, id_b, jaccard).
    */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5, numHashes: Int = 64,
                 bands: Int = 16, shingleN: Int = 3,
                 textCol: String = "text", idCol: String = "doc_id",
                 hashKind: String = "xx"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // ONE hashing pass over the corpus: the hashed-shingle table feeds the
    // signature matrix AND both sides of the candidate verify join (set
    // intersection over fixed-width longs, not ~40-char strings — same
    // Jaccard modulo negligible collisions; the "md5" kind is the 30-bit
    // hash the oracle recomputes). Lazily checkpointed: materialized by
    // the first consumer, shared by the rest.
    val sets = LazyCheckpoint.shared(
      hashedShingleSets(docs, shingleN, textCol, idCol, hashKind))
    val sigs = signaturesFromHashes(sets, numHashes, hashKind)
    val cands = minhashCandidates(sigs, bands, numHashes / bands,
      bucketAsString = hashKind == "md5")
    cands
      .join(sets.select(col("id").as("id_a"), col("hs").as("shs_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hs").as("shs_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("shs_a"), col("shs_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The two tables a PERSISTED MinHash-LSH store holds for a document
    * set: `(sets, buckets)` = the hashed-shingle table (id, hs — what
    * the exact-Jaccard verify reads) and the banded bucket table
    * (id, band, bucket — what candidate probes equi-join). Writing both
    * as parquet is the durable near-dup index of a continuously
    * ingesting pipeline; [[minhashLshProbeStore]] is the probe side and
    * [[graft.streaming.StreamingDedup.nearDupIngestStore]] the
    * streaming maintenance loop.
    */
  def minhashStoreTables(docs: DataFrame, numHashes: Int = 64,
                         bands: Int = 16, shingleN: Int = 3,
                         textCol: String = "text", idCol: String = "doc_id",
                         hashKind: String = "xx"): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sets = LazyCheckpoint.shared(
      hashedShingleSets(docs, shingleN, textCol, idCol, hashKind))
    val buckets = bandBuckets(signaturesFromHashes(sets, numHashes, hashKind),
      bands, numHashes / bands, bucketAsString = hashKind == "md5")
    (sets, buckets)
  }

  /** Drop every row of a bucket table whose (band, bucket) group exceeds
    * `maxBucket` rows — the standing degenerate-skew guard, applied ONCE
    * at store-build time and re-applied at compaction
    * ([[graft.streaming.StreamingDedup.compactNearDupStore]], where a
    * bucket that grew degenerate through appends is cut permanently;
    * probe batches appended between compactions are small by
    * construction).
    */
  def guardBuckets(buckets: DataFrame, maxBucket: Int): DataFrame =
    buckets.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bucket")))
      .filter(col("__n") <= maxBucket)
      .drop("__n")

  /** Probe a persisted MinHash store with an already-computed batch
    * bucket table ([[minhashStoreTables]] output — computing it ONCE and
    * passing it both to the store append and here is the whole point:
    * the shingle/signature pass is the dominant per-batch cost and must
    * not run twice). Candidates come from `batchBuckets` equi-joined
    * against the STORE's bucket table — the store is touched only in the
    * buckets the batch lands in, and the store side is re-guarded with
    * [[guardBuckets]] at probe time so a degenerate bucket that GREW
    * past `maxBucket` through appends stops feeding the join
    * quadratically. Verification reads the STORE's hashed-shingle table
    * for both pair members. Pairs come back CANONICAL (id_a < id_b,
    * symmetric jaccard, deduped), so unions of probe results across
    * batches are set-stable. Contract: the batch's own (sets, buckets)
    * rows are already IN the store (append-before-probe — see
    * [[graft.streaming.StreamingDedup.nearDupIngestStore]]), which is
    * what makes same-batch pairs visible.
    */
  def minhashLshProbeStore(storeSets: DataFrame, storeBuckets: DataFrame,
                           batchBuckets: DataFrame, threshold: Double = 0.5,
                           maxBucket: Int = 64): DataFrame = {
    // the guard counts only PROBED buckets: a semi-join on the batch's
    // (band, bucket) keys first keeps every row of each probed bucket
    // (identical counts within them), so the guard window shuffles
    // O(probed slice) instead of the ENTIRE store bucket table per
    // probe — the "store touched only in the buckets the batch lands
    // in" contract, now true of the guard too
    val probedKeys = batchBuckets.select("band", "bucket").distinct()
    val probedStore = storeBuckets
      .join(probedKeys, Seq("band", "bucket"), "left_semi")
    val cands = LazyCheckpoint.shared(
      batchBuckets.withColumnRenamed("id", "probe_id")
        .join(guardBuckets(probedStore, maxBucket)
          .withColumnRenamed("id", "store_id"), Seq("band", "bucket"))
        .filter(col("probe_id") =!= col("store_id"))
        .select(least(col("probe_id"), col("store_id")).as("id_a"),
          greatest(col("probe_id"), col("store_id")).as("id_b"))
        .distinct())
    // latest-wins verify for RE-CARRIED ids: when the sigs frame
    // carries batch provenance (__b — [[graft.streaming.EpochStore
    // .readAllWithBatch]]), each candidate id verifies against its
    // NEWEST content only. Without it, a re-ingested id keeps both hs
    // rows live: the verify join fans out into conflicting duplicate
    // pairs and matches future docs against content no longer in the
    // corpus. Resolution is candidate-scoped (semi-join before the
    // aggregate), so the extra shuffle is ∝ candidates, not the store.
    val resolvedSets =
      if (storeSets.columns.contains("__b")) {
        val candIds = cands.select(col("id_a").as("id"))
          .unionByName(cands.select(col("id_b").as("id"))).distinct()
        val hit = storeSets.join(candIds, Seq("id"), "left_semi")
        val win = hit.groupBy("id").agg(max(col("__b")).as("__b"))
        hit.join(win, Seq("id", "__b")).drop("__b")
      } else storeSets
    cands
      .join(resolvedSets.select(col("id").as("id_a"), col("hs").as("hs_a")),
        "id_a")
      .join(resolvedSets.select(col("id").as("id_b"), col("hs").as("hs_b")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("hs_a"), col("hs_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental near-dup check: a NEW batch of documents against an
    * EXISTING corpus — the dedup shape of a continuously-ingesting
    * pipeline, where yesterday's corpus is already banded and persisted
    * ([[bandBuckets]]) and only the arriving batch is signed and probed.
    * Candidates come from (band, bucket) equi-joins of batch buckets
    * against corpus buckets — the corpus is touched ONLY in the buckets
    * the batch lands in, never re-paired against itself. Degenerate
    * corpus buckets above `maxBucket` are dropped (same skew guard as the
    * batch variant). Output: (new_id, dup_of, jaccard) — batch docs with
    * a corpus near-duplicate at or above `threshold`.
    */
  def minhashLshIncremental(corpus: DataFrame, batch: DataFrame,
                            threshold: Double = 0.5, numHashes: Int = 64,
                            bands: Int = 16, shingleN: Int = 3,
                            maxBucket: Int = 64, textCol: String = "text",
                            idCol: String = "doc_id",
                            hashKind: String = "xx"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val setsC = LazyCheckpoint.shared(
      hashedShingleSets(corpus, shingleN, textCol, idCol, hashKind))
    val bC = bandBuckets(signaturesFromHashes(setsC, numHashes, hashKind),
      bands, numHashes / bands, bucketAsString = hashKind == "md5")
    minhashLshIncrementalFromTables(setsC, guardBuckets(bC, maxBucket),
      batch, threshold, numHashes, bands, shingleN, textCol, idCol,
      hashKind)
  }

  /** [[minhashLshIncremental]] with the CORPUS side PREBUILT — the form
    * a streaming caller must use: the corpus's shingle/signature/bucket
    * pass is the dominant cost and belongs at stream CONSTRUCTION, not
    * inside every foreachBatch invocation
    * ([[graft.streaming.StreamingDedup.nearDupIngest]] hoists it).
    * `setsC`/`guardedBucketsC` are [[minhashStoreTables]] output (the
    * bucket table already [[guardBuckets]]-guarded); the batch side is
    * signed here with parameters that MUST match the prebuilt tables'.
    */
  def minhashLshIncrementalFromTables(setsC: DataFrame,
                                      guardedBucketsC: DataFrame,
                                      batch: DataFrame,
                                      threshold: Double = 0.5,
                                      numHashes: Int = 64, bands: Int = 16,
                                      shingleN: Int = 3,
                                      textCol: String = "text",
                                      idCol: String = "doc_id",
                                      hashKind: String = "xx"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val asString = hashKind == "md5"
    val setsB = LazyCheckpoint.shared(
      hashedShingleSets(batch, shingleN, textCol, idCol, hashKind))
    val bB = bandBuckets(signaturesFromHashes(setsB, numHashes, hashKind),
      bands, numHashes / bands, asString)
    val cands = bB.withColumnRenamed("id", "new_id")
      .join(guardedBucketsC.withColumnRenamed("id", "dup_of"),
        Seq("band", "bucket"))
      .select("new_id", "dup_of").distinct()
    cands
      .join(setsB.select(col("id").as("new_id"), col("hs").as("hs_b")), "new_id")
      .join(setsC.select(col("id").as("dup_of"), col("hs").as("hs_c")), "dup_of")
      .select(col("new_id"), col("dup_of"),
        jaccardSorted(col("hs_b"), col("hs_c")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: flag corpus docs sharing word n-gram
    * shingles with an evaluation/benchmark set — the contamination check a
    * pretraining corpus MUST run before any benchmark number is
    * trustworthy. Output: one row per corpus doc with the count of its
    * distinct shingles that appear anywhere in the benchmark set, and
    * `contaminated` when the count reaches `minHits`.
    *
    * Scale shape: the benchmark shingle vocabulary is distinct-aggregated
    * once (eval sets are tiny next to the corpus → the join side
    * broadcasts); the corpus side is explode + one map-side-combining
    * count per doc — shingles never self-join. With a corpus-sized
    * "benchmark" the shingle strings would be swapped for their 64-bit
    * hashes ([[hashedShingleSets]]); strings keep the operator
    * engine-neutral here.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                    minHits: Long = 1L, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .distinct()
    val hits = corpus
      .select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** Incremental SEMANTIC dedup against a persisted ANN store
    * ([[graft.operators.AnnIndex]]): each row of `newBatch` finds its
    * nearest standing neighbor in the store and is flagged `is_dup` when
    * the exact cosine of that neighbor reaches `threshold`. This is the
    * steady-state form of semantic dedup at corpus scale — the standing
    * corpus is embedded, clustered and encoded ONCE (then maintained by
    * ingest/delete batches); an arriving crawl batch costs one probe of
    * the store (codes of the probed clusters only + exact re-rank of
    * per-query shortlists), never a re-join or re-encode of the corpus.
    *
    * The probe runs in batch mode (`broadcastQ = false`): `newBatch` is
    * itself corpus-scale, so the query frame and the shortlist move
    * through shuffle joins keyed on `c_id`/`neighbor_id` instead of
    * being broadcast. Output: one row per `newBatch` id —
    * (`idCol`, nn_id, sim, is_dup); `nn_id`/`sim` are null only when
    * the probed clusters hold no candidates (possible at tiny nprobe),
    * and null sim never flags.
    *
    * Within-batch duplicates are out of scope by design — run the batch
    * through [[exact]]/MinHash/[[graft.operators.Similarity]] first;
    * this operator answers the store-vs-batch half, whose naive form
    * (batch × corpus join) is the one that cannot run at 100 TB.
    *
    * ID SEMANTICS: a standing doc sharing a batch row's id can never be
    * that row's neighbor (the probe's self-exclusion, `neighbor ≠
    * query`). That is the UPSERT reading — a batch re-carrying id 42 is
    * a re-crawl of doc 42, and a doc is not a duplicate of itself — and
    * it is exactly what the probe-then-ingest loop
    * ([[graft.streaming.StreamingDedup.semanticIngestStore]]) needs for
    * retry-exactness. If batch ids are a SEPARATE namespace from store
    * ids (content under id 42 unrelated to standing doc 42), remap one
    * side to disjoint ids first, or a verbatim duplicate that happens
    * to share an id passes unflagged.
    */
  def semanticIncrementalStore(spark: SparkSession, storeDir: String,
                               newBatch: DataFrame, storeCorpus: DataFrame,
                               threshold: Double, nprobe: Int = 4,
                               rerank: Int = 16, idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               version: Int = -1,
                               excludeOwnIds: Boolean = false,
                               asOfBatch: Long = Long.MaxValue): DataFrame = {
    val queries = newBatch.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"))
    // excludeOwnIds: the probe-then-ingest loop — the batch's own ids may
    // already be IN the store (a foreachBatch retry after its ingest
    // landed); excluding them keeps the verdicts identical either way
    val excl = if (excludeOwnIds) Some(newBatch.select(col(idCol))) else None
    val nn = AnnIndex.probe(spark, storeDir, queries, storeCorpus, k = 1,
        nprobe = nprobe, rerank = rerank, idCol = idCol, vecCol = vecCol,
        version = version, broadcastQ = false, excluded = excl,
        asOfBatch = asOfBatch)
      .select(col("q_id").as(idCol), col("neighbor_id").as("nn_id"),
        col("sim"))
    newBatch.select(col(idCol))
      .join(nn, Seq(idCol), "left")
      .select(col(idCol), col("nn_id"), col("sim"),
        (coalesce(col("sim"), lit(Double.MinValue)) >= threshold)
          .as("is_dup"))
  }

  /** 64-bit SimHash per doc: sign of the per-bit vote sum over distinct
    * token hashes. A single native expression per row
    * ([[graft.functions.SimHashExpr]]) — a pure map over the corpus scan,
    * no explode, no shuffle.
    */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id", hashKind: String = "xx"): DataFrame =
    docs.select(col(idCol).as("id"),
      org.apache.spark.sql.GraftBridge.column(graft.functions.SimHashExpr(
        org.apache.spark.sql.GraftBridge.expression(
          TextOps.normTokens(col(textCol))), hashKind)).as("simhash"))

  /** Connected components over an undirected pair graph (id_a, id_b) by
    * min-label propagation: every node's label converges to the smallest id
    * reachable from it. Deterministic; iterations bounded by component
    * diameter (per-round `localCheckpoint` keeps lineage flat, convergence
    * is detected with a cheap changed-count). At extreme scale swap the
    * propagation loop for the large-star/small-star variant — the output
    * contract (doc -> min reachable id) is identical.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — the iteration below would otherwise
    // re-execute the (possibly expensive) pair-generation plan every round.
    // Lazy barriers throughout: each round's convergence probe is the job
    // that materializes that round's checkpoint (an eager checkpoint per
    // round doubled the job count of the loop).
    val edges = LazyCheckpoint.shared(pairs.select(col("id_a"), col("id_b"))
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))))
    var labels = LazyCheckpoint.shared(edges.select(col("id_a").as("id"))
      .distinct().withColumn("label", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaEdges = labels.join(edges, col("id") === col("id_a"))
        .select(col("id_b").as("id"), col("label"))
      val prop = viaEdges.unionAll(labels)
        .groupBy("id").agg(min("label").as("newLabel"))
      val joined = LazyCheckpoint.shared(
        prop.join(labels.withColumnRenamed("label", "old"), "id"))
      converged = joined.filter(col("newLabel") < col("old")).head(1).isEmpty
      labels = joined.select(col("id"), col("newLabel").as("label"))
      i += 1
    }
    // honest rejection over silent corruption: min-label propagation
    // moves ONE hop per round, so a component whose diameter exceeds
    // the cap would come back split into several "clusters" with
    // several keep-survivors — wrong answers with no signal. The
    // log-diameter [[connectedComponentsStar]] is the escape hatch.
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        "(a component's diameter exceeds the cap) — raise maxIter or " +
        "use connectedComponentsStar (log-scale rounds)")
    labels
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the extreme-scale form of [[connectedComponents]]: round count grows
    * with log of component size, NOT component diameter, so a pathological
    * chain that min-label propagation cannot finish in bounded rounds
    * converges in a handful. Each round is two grouped aggregates over the
    * edge list; edges stay symmetric between rounds; convergence is
    * detected with an order-insensitive (count, bit_xor) edge checksum —
    * one cheap job, no driver-side edge materialization. Output contract
    * identical to [[connectedComponents]]: (id, label = min reachable id),
    * for every non-isolated node.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // lazy barriers: the per-round checksum job materializes that round's
    // edge checkpoint — see [[connectedComponents]]
    var edges = LazyCheckpoint.shared(
      pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())
    var prev = (-1L, 0L)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR: per node, link every strictly larger neighbor to
      // m = min(N(u) ∪ {u}) — long tails collapse toward minima
      val lsMin = edges.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = edges.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      val lsSym = ls.unionAll(ls.select(col("v").as("u"), col("u").as("v")))
        .distinct()
      // SMALL-STAR: per node, link its smaller neighbors AND itself to
      // their collective min — stars flatten to depth 1
      val down = lsSym.filter(col("v") < col("u"))
      val ssMin = down.groupBy("u").agg(min("v").as("m"))
      val ss = down.join(ssMin, "u")
        .select(col("v").as("a"), col("m"))
        .unionAll(ssMin.select(col("u").as("a"), col("m")))
        .filter(col("a") =!= col("m"))
      edges = LazyCheckpoint.shared(
        ss.select(col("a").as("u"), col("m").as("v"))
          .unionAll(ss.select(col("m").as("u"), col("a").as("v")))
          .distinct())
      val chk = edges.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).head()
      val cur = (chk.getLong(0), if (chk.isNullAt(1)) 0L else chk.getLong(1))
      converged = cur == prev
      prev = cur
      i += 1
    }
    // the cap is a runaway backstop (log-scale rounds make 30 ≈ 2^30
    // nodes); hitting it still means the labels below are WRONG, so
    // reject by name rather than return them
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "pathological input or a cap set below log2(component size)")
    edges.groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))
  }

  /** Near-dup clusters: blocked word-Jaccard pairs above `threshold` become
    * edges; each doc gets its component's min doc id as `cluster`; docs
    * with no near-dup are their own cluster. `keep = (doc == cluster)`
    * marks the canonical survivor per cluster — the thing a training-data
    * run actually consumes. Components come from the alternating-star
    * algorithm ([[connectedComponentsStar]]), whose round count is
    * diameter-independent — the 100 TB default; the min-label propagation
    * form remains available as [[connectedComponents]].
    */
  def clusters(docs: DataFrame, blockCol: String, threshold: Double,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val pairs = jaccardPairs(docs, blockCol, threshold, textCol, idCol)
    val comp = connectedComponentsStar(pairs)
    docs.select(col(idCol).as("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
      .withColumn("keep", (col("doc_id") === col("cluster")))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, blocked on
    * 16-bit chunks (pigeonhole: distance ≤ 3 over 4 chunks ⇒ some chunk is
    * equal, so the chunk-equi-join loses nothing at maxDist ≤ 3).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id", hashKind: String = "xx"): DataFrame = {
    require(maxDist <= 3, "chunk blocking is exact only for maxDist <= 3")
    // Materialize the signature table (16 bytes/doc) before the self-join:
    // a broadcast self-join otherwise executes the signature scan TWICE
    // (the BroadcastExchange side cannot reuse the streamed side's plan),
    // and join-key constraint inference re-evaluates the simhash inside a
    // pushed-down isnotnull filter. At corpus scale this is the standard
    // "persist the signatures" step — lazily: the first join side to run
    // materializes it, the other reads the persisted partitions, and no
    // driver-blocking job fires at call time.
    val sh = LazyCheckpoint.shared(simhash(docs, textCol, idCol, hashKind))
    val chunks = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
      }: _*)).as("ck"))
      .select(col("id"), col("simhash"), col("ck.c").as("c"), col("ck.v").as("v"))
    val a = chunks.as("a"); val b = chunks.as("b")
    a.join(b, col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // filter BEFORE distinct: hamming is identical for a pair across
      // chunks, so discarding early shrinks the dedup shuffle to survivors
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Parallelism guard for CPU-heavy scan-side expansions: a small input
    * (single parquet row-group) is unsplittable, which would serialize the
    * per-window fingerprint projection on one core. Spread it when the
    * scan under-parallelizes; at real scale inputs have many splits and
    * this is a no-op (no shuffle added).
    */
  private def spreadSmallScan(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions * 2 >= sc.defaultParallelism) df
    else df.repartition(sc.defaultParallelism)
  }

  /** Exact duplicated-SPAN detection: every k-token rolling window is
    * fingerprinted; a fingerprint occurring more than once corpus-wide
    * marks its window as a verbatim repeat, and per document the
    * duplicated windows are merged into maximal spans (overlapping
    * windows coalesce) to yield the duplicated-token coverage. This is
    * the span-level exact dedup of training corpora — document-level
    * dedup (exact/MinHash) misses boilerplate repeated INSIDE otherwise
    * distinct documents, which is what this catches.
    *
    * Scale shape — linear in corpus token count, no pairwise document
    * comparison anywhere:
    *  1. window fingerprints: pure scan projection (one hash per position;
    *     8-byte xxhash64 by default — see [[spanFingerprints]]);
    *  2. corpus-wide occurrence count: map-side-combining hash aggregate
    *     keyed on the fingerprint (no text ever shuffles);
    *  3. duplicated fingerprints join back to positions: plain equi-join
    *     on the fingerprint (AQE broadcasts it when the duplicate set is
    *     small);
    *  4. coverage: one per-document sort window — merged-interval length
    *     via lead(pos), so overlapping windows are never double-counted.
    *
    * Output: (doc_id, n_toks, n_dup_windows, dup_tokens, dup_fraction),
    * one row per input document (zero-duplicate docs included). The
    * output is fingerprint-kind-independent (window equality is all that
    * matters), which is what lets a SQL oracle recompute it via md5.
    */
  def duplicatedSpans(docs: DataFrame, k: Int = 8,
                      textCol: String = "text", idCol: String = "doc_id",
                      hashKind: String = "xx"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // window pass + final (doc_id, n_toks) join share it — the sibling
    // span operators checkpoint base for the same reason
    val base = LazyCheckpoint.shared(
      spreadSmallScan(docs).select(col(idCol).as("doc_id"),
          TextOps.normTokens(col(textCol)).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long")))
    // Window fingerprints at every position (1-based) — one native pass
    // per doc (short docs yield an empty array and so no rows).
    val wins = LazyCheckpoint.shared( // consumed twice: count + join-back
      base.select(col("doc_id"),
          posexplode(spanFingerprints(col("toks"), k, hashKind)))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("sig")))
    val dup = wins.groupBy("sig").agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1).select("sig")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val covered = wins.join(dup, "sig")
      .withColumn("nxt", lead(col("pos"), 1).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(when(col("nxt").isNull, lit(k))
          .otherwise(least(lit(k), col("nxt") - col("pos")))).as("dup_tokens"))
    base.select("doc_id", "n_toks").join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) / col("n_toks"), 4)
          .as("dup_fraction"))
  }

  /** The distinct window-fingerprint table of a corpus — what a
    * persisted SPAN store holds (one `sig` column; ~8 bytes/window under
    * the default xx kind). Computing it once at corpus-index time and
    * probing it many times ([[duplicatedSpansAgainstSigs]]) is the
    * production shape; [[duplicatedSpansIncremental]] composes the two
    * for the recompute-per-call form.
    */
  def spanStoreSigs(corpus: DataFrame, k: Int = 8,
                    textCol: String = "text",
                    hashKind: String = "xx"): DataFrame =
    spreadSmallScan(corpus)
      .select(explode(spanFingerprints(
        TextOps.normTokens(col(textCol)), k, hashKind)).as("sig"))
      .distinct()

  /** Incremental span-level dedup: a NEW batch of documents is screened
    * against a STANDING corpus's window-fingerprint set — the span
    * counterpart of [[minhashLshIncremental]], for the continuous-ingest
    * pipeline where yesterday's corpus fingerprints are already persisted
    * (in production: the distinct-sig table IS the span index; here it is
    * derived from `corpus` inline). A batch window is "duplicated" when
    * its fingerprint exists ANYWHERE in the corpus; batch docs are NOT
    * compared to each other (intra-batch duplication is the batch
    * operator's / [[graft.streaming.StreamingDedup.exactStream]]'s job),
    * so per-batch results are independent of batch boundaries.
    *
    * Scale shape: corpus side reduces to its distinct fingerprint set
    * once (8-byte longs, map-side-combining distinct); each batch is one
    * window projection + one equi-join against that set + the same
    * lead()-merged coverage as [[duplicatedSpans]]. The corpus is never
    * re-fingerprinted per batch when the sig table is persisted.
    *
    * Output: same shape as [[duplicatedSpans]], one row per BATCH doc.
    */
  def duplicatedSpansIncremental(corpus: DataFrame, batch: DataFrame,
                                 k: Int = 8, textCol: String = "text",
                                 idCol: String = "doc_id",
                                 hashKind: String = "xx"): DataFrame =
    duplicatedSpansAgainstSigs(
      spanStoreSigs(corpus, k, textCol, hashKind), batch, k, textCol,
      idCol, hashKind)

  /** The probe half of incremental span screening: per-batch-doc
    * duplicated-window coverage against an EXISTING distinct-sig table
    * (persisted or freshly built — [[spanStoreSigs]] shape). Same
    * output contract as [[duplicatedSpans]].
    */
  def duplicatedSpansAgainstSigs(corpusSigs: DataFrame, batch: DataFrame,
                                 k: Int = 8, textCol: String = "text",
                                 idCol: String = "doc_id",
                                 hashKind: String = "xx"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = LazyCheckpoint.shared( // window pass + final join share it
      spreadSmallScan(batch).select(col(idCol).as("doc_id"),
          TextOps.normTokens(col(textCol)).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long")))
    val wins = base.select(col("doc_id"),
        posexplode(spanFingerprints(col("toks"), k, hashKind)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("sig"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val covered = wins.join(corpusSigs, "sig") // sig set is distinct: no fanout
      .withColumn("nxt", lead(col("pos"), 1).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(when(col("nxt").isNull, lit(k))
          .otherwise(least(lit(k), col("nxt") - col("pos")))).as("dup_tokens"))
    base.select("doc_id", "n_toks").join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) / col("n_toks"), 4)
          .as("dup_fraction"))
  }

  /** The removal half of span dedup: rewrite each document with every
    * duplicated k-token window's tokens cut out (the remaining tokens
    * rejoin in original order). Same linear scale shape as
    * [[duplicatedSpans]]; the cut itself is ONE native pass per doc
    * ([[graft.functions.SpanRewriteExpr]]) over the token array and the
    * doc's duplicated-window start positions — tokens never explode into
    * rows or shuffle (the earlier anti-join formulation pushed every
    * token through a (doc, position) anti-join and a collect_list
    * reassembly). Emits the md5 of the rewritten text (not the text) so
    * the cross-engine verify carries 32 hex chars per doc, not documents.
    *
    * Output: (doc_id, n_toks, n_kept, clean_md5).
    */
  def removeDuplicatedSpans(docs: DataFrame, k: Int = 8,
                            textCol: String = "text", idCol: String = "doc_id",
                            hashKind: String = "xx"): DataFrame = {
    val base = LazyCheckpoint.shared( // window pass + rewrite pass share it
      spreadSmallScan(docs).select(col(idCol).as("doc_id"),
          TextOps.normTokens(col(textCol)).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long")))
    val wins = LazyCheckpoint.shared(
      base.select(col("doc_id"),
          posexplode(spanFingerprints(col("toks"), k, hashKind)))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("sig")))
    val dup = wins.groupBy("sig").agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1).select("sig")
    // per-doc duplicated-window START positions — |windows| ints per doc,
    // not |tokens| rows; order irrelevant to the rewrite expression
    val starts = wins.join(dup, "sig")
      .groupBy("doc_id")
      .agg(collect_list(col("pos").cast("int")).as("ps"))
    val rewrite = org.apache.spark.sql.GraftBridge.column(
      graft.functions.SpanRewriteExpr(
        org.apache.spark.sql.GraftBridge.expression(col("toks")),
        org.apache.spark.sql.GraftBridge.expression(
          coalesce(col("ps"), array().cast("array<int>"))), k))
    base.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"), rewrite.as("r"))
      .select(col("doc_id"), col("n_toks"),
        col("r.n_kept").as("n_kept"), col("r.clean_md5").as("clean_md5"))
  }
}
