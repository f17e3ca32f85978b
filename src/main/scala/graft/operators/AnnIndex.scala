package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorOps, VersionedSlots}

/** Persisted IVF-PQ ANN index — build ONCE, probe many times, ingest
  * incrementally: the production shape of the similarity tier, closing
  * the same train-per-query gap [[graft.functions.TokenizerStore]]
  * closes for the tokenizer. `sim_ann_ivf_pq` re-runs k-means and PQ
  * codebook training on every call; a real ANN service trains at index
  * creation, persists, and every probe batch loads the frozen artifacts
  * while arriving vectors fold in through [[ingest]].
  *
  * Two artifacts, stored by what they are:
  *  - **Model** (fine/coarse centroids, cluster membership, PQ
  *    codebooks): control-plane-sized (nCentroids×dim + m×k×(dim/m)
  *    doubles regardless of corpus size) → one JSON file, like the
  *    tokenizer's merges. Round-trips exactly: Jackson emits
  *    shortest-round-trip doubles, so a probe against the loaded model
  *    is bit-identical to one against training memory
  *    ([[AnnIndexSpec]] pins it; the oracled `sim_ann_persisted` query's
  *    recall gate re-proves it on real data).
  *  - **Codes table** (one row per corpus vector: id, cluster, m-byte PQ
  *    codes, norm — NO vectors): data-plane → parquet via the index
  *    store layout, DIRECTORY-PARTITIONED by cluster id, one ingest
  *    batch per `b=<N>` directory (below). A probe batch resolves its
  *    `nprobe` clusters driver-side from the model (the routing
  *    expression is control-plane math) and reads ONLY those partitions
  *    — at 100 TB a probe scans `nprobe/nCentroids` of the codes, and
  *    the codes are already ~16×+ smaller than the vectors.
  *
  * '''Incremental maintenance''' — the engine's defining capability
  * (reference `Projector/indexjs.go:123-189` routes a mutation stream
  * into a standing index; [[graft.streaming.StreamingIndex.maintain]]
  * is the scalar-index form): [[ingest]] encodes an arriving batch with
  * the FROZEN model (routing + `pqEncode` are scan expressions — no
  * retraining, no rewrite of standing codes) and writes it as
  * `codes/b=<batchId>/c_id=<c>/`, wholesale-overwriting ITS OWN batch
  * directory only. A batch directory is committed by its parquet
  * `_SUCCESS`; a retried batch rewrites `b=<id>` from scratch, so
  * at-least-once delivery (foreachBatch, [[maintainStream]]) never
  * duplicates rows — the `v=<batch>` idempotence pattern of
  * [[graft.streaming.StreamingIndex]]. Re-embedded ids are UPSERTS:
  * [[probe]] reads every committed batch directory under the pinned
  * version with the same static cluster-partition filter and resolves
  * each id latest-batch-wins, so probes are oblivious to how the corpus
  * arrived; [[compact]] folds the shadowed rows away into a fresh
  * single-batch version under the same frozen model.
  *
  * Versioned via [[VersionedSlots]] (the shared slot-claiming helper):
  * each [[build]] claims the next immutable `v<N>/` directory slot and
  * publishes `model.json` LAST and atomically, so a version is visible
  * only when complete — re-indexing a corpus snapshot never disturbs
  * probes against the previous index.
  *
  * Exact re-rank still needs true vectors for shortlist rows; [[probe]]
  * takes the corpus frame for that one join, same as the in-memory form.
  */
object AnnIndex {

  /** The control-plane artifact. Arrays are stored as nested lists;
    * `members` is the two-level routing's fine-membership table (empty =
    * single-level).
    */
  final case class Model(
      m: Int,
      codebookK: Int,
      coarseProbes: Int,
      fine: Seq[Seq[Double]],
      coarse: Seq[Seq[Double]],
      members: Seq[Seq[Int]],
      codebooks: Seq[Seq[Seq[Double]]],
      // Option so models serialized before the field existed load as
      // None (= plain codes) — json4s fills absent Options, no default-
      // parameter support needed
      residual: Option[Boolean] = None) {
    def fineArr: Seq[Array[Double]] = fine.map(_.toArray)
    def coarseArr: Seq[Array[Double]] = coarse.map(_.toArray)
    def codebookArr: Seq[Seq[Array[Double]]] =
      codebooks.map(_.map(_.toArray))
    /** Codes quantize `v − c(v)` ([[Similarity.ivfPqResidualTopK]]'s
      * layout) instead of `v`; probes add the exact `q·c` bias.
      */
    def isResidual: Boolean = residual.contains(true)
  }

  private implicit val formats: Formats = DefaultFormats

  private val VersionDir = "v([0-9]+)".r

  private def parseVersion(name: String): Option[Int] = name match {
    case VersionDir(v) => Some(v.toInt)
    case _ => None
  }

  private def versionPath(dir: String, v: Int) = Paths.get(dir, s"v$v")
  private def modelPath(dir: String, v: Int) =
    versionPath(dir, v).resolve("model.json")
  private def codesRoot(dir: String, v: Int) = s"$dir/v$v/codes"

  /** Versions present in the store, ascending. A version EXISTS only
    * once its `model.json` does — the model is published LAST (and
    * atomically) in [[build]], so a half-written codes table is never
    * visible as a version.
    */
  def versions(dir: String): Seq[Int] =
    VersionedSlots.versions(dir, parseVersion,
      visible = p => Files.exists(p.resolve("model.json")))

  /** The base + ingested batch ids committed under a version's codes
    * table, ascending ([[VersionedSlots.committedBatches]] — the shared
    * visibility rule: a batch exists iff its parquet `_SUCCESS` does, so
    * an interrupted ingest is invisible until its idempotent retry
    * rewrites the directory). Driver-side listing, O(batches) — the
    * analog of [[graft.streaming.StreamingIndex]]'s committed-version
    * resolution.
    */
  def committedBatches(dir: String, version: Int): Seq[Long] =
    VersionedSlots.committedBatches(codesRoot(dir, version))

  /** The codes rows for `corpus` under `model`: (id, cluster id, PQ
    * codes, norm) — frozen-model scan expressions, shared verbatim by
    * [[build]] (base batch) and [[ingest]] (incremental batches) so the
    * two paths cannot drift.
    */
  /** `v − c(v)` for a routed row, with the fine-centroid table as an
    * expression literal — the residual the codes quantize when
    * [[Model.isResidual]] (shared by [[encodeFrame]] and the mixed-
    * mutation path so they cannot drift).
    */
  private def residualCol(model: Model)(v: Column, cId: Column): Column =
    zip_with(v.cast("array<double>"), element_at(typedlit(model.fine), cId + 1),
      (a, b) => a - b)

  private def encodeFrame(corpus: DataFrame, model: Model,
                          idCol: String, vecCol: String): DataFrame = {
    val routed = corpus.withColumn("__c",
      route(model)(col(vecCol), 1).getItem(0))
    val target =
      if (model.isResidual) residualCol(model)(col(vecCol), col("__c"))
      else col(vecCol)
    routed.select(col(idCol), col("__c").as("c_id"),
      VectorOps.pqEncode(target, model.codebookArr).as("codes"),
      VectorOps.norm(col(vecCol)).as("nrm"))
  }

  private def writeBatch(codes: DataFrame, dir: String, version: Int,
                         batchId: Long): Unit = {
    val root = s"${codesRoot(dir, version)}/b=$batchId"
    codes.repartition(col("c_id"))
      .write.mode("overwrite").partitionBy("c_id")
      .parquet(root)
    // an EMPTY batch (a compact fold of a fully-tombstoned version, an
    // empty delete list) writes _SUCCESS but ZERO data files under the
    // partitioned layout, and a parquet read over file-less directories
    // cannot infer schema — the committed batch would wedge every
    // probe/stats/compact that reads it alone. Plant one 0-row
    // schema-carrying file under the reserved tombstone partition (the
    // cheap post-write directory check costs no extra job; the 0-row
    // file is semantically invisible).
    val wrote = Option(new java.io.File(root).listFiles).exists(
      _.exists(f => f.isDirectory && f.getName.startsWith("c_id=")))
    if (!wrote)
      codes.drop("c_id").limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$root/c_id=$TombstoneCluster")
  }

  /** Train the IVF routing + PQ codebooks on `corpus` and persist both
    * artifacts as the NEXT immutable version under `dir` (slot claimed
    * via [[VersionedSlots.claimDir]]; a pinned version never drifts,
    * re-builds never clobber). Same defaults and training routines as
    * [[Similarity.ivfPqTopK]] — the persisted index IS that query's
    * index, written down. The corpus codes land as batch `b=0`;
    * [[ingest]] adds `b>=1`. Returns (model, version).
    *
    * `residual = true` persists the [[Similarity.ivfPqResidualTopK]]
    * layout: codebooks train on `v − c(v)` and every code in the store
    * quantizes the residual; the flag lives in the model so
    * [[ingest]]/[[applyMutations]]/[[compact]]/[[probe]] all honor it
    * from the frozen artifact alone.
    */
  def build(corpus: DataFrame, dir: String,
            nCentroids: Int = 16, kmeansIters: Int = 2,
            m: Int = 16, codebookK: Int = 32,
            idCol: String = "vec_id", vecCol: String = "embedding",
            twoLevelThreshold: Int = 64, coarseProbes: Int = 2,
            residual: Boolean = false,
            seedByHash: Boolean = false): (Model, Int) = {
    // ONE TakeOrdered pass serves BOTH control-plane samples of a cold
    // build: the k-means seeds are the first nCentroids rows by id and
    // the PQ training sample the first PqSampleN rows by id — the seed
    // rows are a PREFIX of the PQ sample, so a single ordered collect
    // feeds both (one scheduler round-trip instead of two, across every
    // bench lifecycle build). Hash-seeded (retrain) and residual builds
    // keep separate passes: hash order is a different TakeOrdered, and
    // residual codebooks train on v − c(v), which needs the trained
    // centroids first.
    val fusedSample: Option[Array[Array[Double]]] =
      if (seedByHash || residual) None
      else Some(corpus.orderBy(col(idCol))
        .limit(math.max(nCentroids, Similarity.PqSampleN))
        .select(col(vecCol).cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray))
    val fine = Similarity.collectCentroids(corpus, nCentroids, kmeansIters,
      idCol, vecCol, seedByHash = seedByHash,
      seedsOpt = fusedSample.map(_.take(nCentroids)))
    val (coarse, members): (Seq[Array[Double]], Seq[Seq[Int]]) =
      if (fine.length > twoLevelThreshold) {
        val (c, mm) = Similarity.coarsen(fine,
          math.round(math.sqrt(fine.length)).toInt)
        (c.toSeq, mm.map(_.toSeq).toSeq)
      } else (Nil, Nil)
    // residual mode trains the codebooks on `v − c(v)` (routed against
    // the just-trained fine centroids); the corpus frame for training is
    // a pure expression either way
    val fineLit = typedlit(fine.map(_.toSeq).toSeq)
    val trainFrame =
      if (!residual) corpus
      else corpus.select(col(idCol),
        zip_with(col(vecCol).cast("array<double>"),
          element_at(fineLit,
            VectorOps.nearestCentroids(col(vecCol), fine.toSeq,
              coarse, members, 1, coarseProbes).getItem(0) + 1),
          (a, b) => a - b).as(vecCol))
    val codebooks = fusedSample match {
      case Some(sm) => Similarity.trainPqCodebooksOn(
        sm.take(Similarity.PqSampleN), m, codebookK)
      case None => Similarity.trainPqCodebooks(trainFrame, m, codebookK,
        idCol = idCol, vecCol = vecCol)
    }
    val model = Model(m, codebookK, coarseProbes,
      fine.map(_.toSeq).toSeq, coarse.map(_.toSeq), members,
      codebooks.map(_.map(_.toSeq)),
      residual = if (residual) Some(true) else None)
    // claim the next version slot atomically (losers retry the next
    // number) — occupied-but-invisible slots are skipped past too
    val v = VersionedSlots.claimDir(dir, n => s"v$n",
      VersionedSlots.versions(dir, parseVersion).lastOption.getOrElse(0) + 1)
    // the stored index rows: codes + norm only, partitioned by cluster —
    // a probe reads nprobe cluster directories, never the whole table.
    // The model JSON lands LAST and atomically: its presence is what
    // makes the version visible.
    writeBatch(encodeFrame(corpus, model, idCol, vecCol), dir, v, 0L)
    VersionedSlots.publishReplace(modelPath(dir, v), Serialization.write(model))
    (model, v)
  }

  /** Incrementally ingest `batch` into a version's codes table: encode
    * with the FROZEN model (no retraining — arriving vectors route and
    * quantize through pure scan expressions) and write the rows as the
    * batch's own committed directory `codes/b=<batchId>`. Idempotent per
    * `batchId`: a retry wholesale-overwrites the same directory, so
    * at-least-once delivery never duplicates index rows. Standing codes
    * are never rewritten — per-batch write volume ∝ the batch, not the
    * index. `batchId` must be ≥ 1 (0 is the build's base batch) and
    * unique per ingested batch under one version; [[maintainStream]]
    * derives it from the streaming micro-batch id.
    *
    * '''Upserts are first-class''': a batch may re-carry an existing id
    * with a new vector (a re-embedding — the reference's defining loop
    * routes upserts into a standing index, `Projector/indexjs.go:123-189`,
    * and [[graft.operators.IndexMaintainer]] is the scalar-index form).
    * [[probe]] resolves multiplicity LATEST-BATCH-WINS: within the probed
    * partitions each id answers once, from its highest committed batch.
    * One documented approximation bound: if a re-embedded vector ROUTES to
    * a different cluster, the old row still sits in its old cluster's
    * directory and can surface as a stale CANDIDATE when only the old
    * cluster is probed — harmless to scores (the exact re-rank reads true
    * vectors from `corpus`, so a stale candidate scores with the CURRENT
    * vector) and folded away entirely by [[compact]], which is also when
    * shadowed same-cluster rows stop being scanned at all.
    */
  def ingest(batch: DataFrame, dir: String, batchId: Long,
             version: Int = -1,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(batchId >= 1, s"batchId must be >= 1 (0 is the build batch), got $batchId")
    val v = resolveVersion(dir, version)
    writeBatch(encodeFrame(batch, loadModel(dir, v), idCol, vecCol),
      dir, v, batchId)
  }

  /** The reserved tombstone partition: deletion rows live under
    * `c_id = -1` (no real cluster — routing ids are non-negative), so a
    * probe can read EVERY live tombstone with one extra static partition
    * filter entry, regardless of which cluster the deleted id's data
    * rows sit in. The alternatives don't scale: resolving the id's
    * clusters at delete time is a full codes scan, and fanning the
    * tombstone out to every cluster writes nCentroids rows per deletion.
    * Tombstone volume is ∝ LIVE deletions, not corpus — [[compact]]
    * folds deleted ids (and the tombstones themselves) away.
    */
  val TombstoneCluster: Int = -1

  /** Delete ids from a version — the other half of the reference's
    * mutation routing (`Projector/indexjs.go:175-189` routes
    * `AddDeletion` into the standing index the same way it routes
    * upserts; [[graft.operators.IndexMaintainer]] is the scalar-index
    * form). Writes one TOMBSTONE row per id — codes-schema-shaped with
    * `codes`/`nrm` null, under the reserved [[TombstoneCluster]]
    * partition — as the batch's own idempotent `b=<batchId>` directory,
    * exactly like [[ingest]] (a retry wholesale-overwrites; at-least-once
    * delivery never double-deletes). [[probe]]'s latest-batch-wins
    * resolution reads tombstones alongside data rows: a tombstone from
    * the id's newest batch resolves the id as ABSENT; a later [[ingest]]
    * of the same id wins over the tombstone (delete-then-re-add works).
    * Within one batch id a tombstone shadows a data row. [[compact]]
    * drops tombstoned ids and the tombstones themselves.
    *
    * `ids` is a one-column work-list frame (control-plane shaped, e.g.
    * the `removed` slice of a corpus diff) — deletion cost is ∝ the
    * delete batch, never the standing index.
    */
  def delete(ids: DataFrame, dir: String, batchId: Long,
             version: Int = -1, idCol: String = "vec_id"): Unit = {
    require(batchId >= 1, s"batchId must be >= 1 (0 is the build batch), got $batchId")
    val v = resolveVersion(dir, version)
    val tombs = ids.select(col(idCol),
      lit(TombstoneCluster).as("c_id"),
      lit(null).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType)).as("codes"),
      lit(null).cast("double").as("nrm"))
    writeBatch(tombs, dir, v, batchId)
  }

  /** Apply one MIXED mutation batch — upserts AND deletions — to a
    * version's codes table as a single idempotent `b=<batchId>`
    * directory. This is the full form of the reference's per-batch
    * routing loop (`Projector/indexjs.go:123-189` interleaves
    * `AddUpsert` and `AddDeletion` rows from the same change feed);
    * [[ingest]] and [[delete]] are its single-opcode halves.
    *
    * `feed` is change-feed-shaped: an opcode column (`DELETION` /
    * `EXPIRATION` tombstone the id, anything else upserts), the id, the
    * vector (null on deletions — the deletion branch never evaluates
    * the encode expressions), and optionally a seqno. When `seqnoCol`
    * is given the batch is first reduced to each id's NEWEST event
    * (change feeds re-carry hot ids within one batch; the winner must
    * be the latest, not an arbitrary partition order) — one window over
    * the BATCH, never the standing index. Without a seqno the caller
    * asserts one event per id (duplicate ids would race on
    * [[latestWins]]'s within-batch tie rule, which is defined for the
    * reduced shape only).
    *
    * Everything [[ingest]]/[[delete]] guarantee holds here: frozen-model
    * scan-expression encode, write volume ∝ the batch, wholesale
    * overwrite on retry (at-least-once delivery stays exactly-once),
    * tombstones in the reserved [[TombstoneCluster]] partition.
    */
  def applyMutations(feed: DataFrame, dir: String, batchId: Long,
                     version: Int = -1, opcodeCol: String = "opcode",
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     seqnoCol: Option[String] = None): Unit = {
    require(batchId >= 1, s"batchId must be >= 1 (0 is the build batch), got $batchId")
    val v = resolveVersion(dir, version)
    val model = loadModel(dir, v)
    val reduced = seqnoCol match {
      case Some(sq) => feed
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col(sq).desc)))
        .filter(col("__rn") === 1).drop("__rn")
      case None => feed
    }
    val isDel = upper(col(opcodeCol)).isin("DELETION", "EXPIRATION")
    val bytesT = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType)
    // __c carries the REAL routing for upsert rows (deletions never
    // evaluate it — `when` branches are lazy); the emitted c_id swaps in
    // the tombstone partition for deletions. Residual models quantize
    // v − c(v) with the same shared residualCol as encodeFrame.
    val routedRows = reduced.withColumn("__c",
      when(isDel, lit(TombstoneCluster))
        .otherwise(route(model)(col(vecCol), 1).getItem(0)))
    val encTarget =
      if (model.isResidual) residualCol(model)(col(vecCol), col("__c"))
      else col(vecCol)
    val rows = routedRows.select(col(idCol),
      col("__c").as("c_id"),
      when(isDel, lit(null).cast(bytesT))
        .otherwise(VectorOps.pqEncode(encTarget, model.codebookArr))
        .as("codes"),
      when(isDel, lit(null).cast("double"))
        .otherwise(VectorOps.norm(col(vecCol))).as("nrm"))
    writeBatch(rows, dir, v, batchId)
  }

  /** Streaming maintenance of a persisted ANN version: every arriving
    * micro-batch of (id, vector) rows folds in through [[ingest]] —
    * the ANN counterpart of [[graft.streaming.StreamingIndex.maintain]].
    * foreachBatch is at-least-once; [[ingest]]'s per-batch idempotence
    * makes the composition exactly-once. The micro-batch id maps to
    * ingest batch `id + batchIdBase` (streaming ids start at 0; batch 0
    * is the build's base batch, so the default base of 1 starts the
    * stream right after it).
    *
    * '''Batch-id namespace''': a version's batch ids are ONE namespace
    * shared by [[ingest]]/[[delete]]/[[applyMutations]] and the stream
    * maintainers, and overwrite-on-collision is deliberate — it is what
    * makes checkpoint REPLAY of a micro-batch exactly-once, so a
    * collision cannot be detected-and-failed without breaking restart.
    * A maintainer owns the contiguous range `[batchIdBase, ∞)`; manual
    * mutation batches on a stream-maintained version must use ids BELOW
    * `batchIdBase` (attach a stream to a manually-maintained version
    * with `batchIdBase = committedBatches(dir, v).max + 1`). Mixing ids
    * across that split silently replaces the other writer's batch.
    */
  def maintainStream(stream: DataFrame, dir: String, version: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     batchIdBase: Long = 1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(batchIdBase >= 1,
      s"batchIdBase must be >= 1 (0 is the build batch), got $batchIdBase")
    // pin at CONSTRUCTION: a negative version means "latest NOW", not
    // "latest at each micro-batch" — re-resolving per batch would let a
    // concurrent build/compact silently re-target the stream mid-flight
    // (the hybridSearchStream hazard), stranding every earlier batch in
    // the old version
    val pinned = resolveVersion(dir, version)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      ingest(batch, dir, batchId + batchIdBase, pinned, idCol, vecCol)
    }
  }

  /** [[maintainStream]] for a MIXED change stream — upserts and
    * deletions interleaved, routed per micro-batch by
    * [[applyMutations]]. This closes the streaming loop to the
    * reference's actual shape: its projector consumes one continuous
    * feed where both opcodes arrive in arrival order
    * (`Projector/indexjs.go:123-189`), not separate upsert and delete
    * channels. foreachBatch at-least-once × per-batch idempotent
    * overwrite = exactly-once; cross-batch ordering is the micro-batch
    * sequence itself (batch N+1's events outrank batch N's via
    * [[latestWins]]), within-batch ordering is `seqnoCol`. Batch-id
    * namespace rules are [[maintainStream]]'s: this maintainer owns
    * `[batchIdBase, ∞)`.
    */
  def maintainChangeStream(stream: DataFrame, dir: String, version: Int,
                           opcodeCol: String = "opcode",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           seqnoCol: Option[String] = Some("seqno"),
                           batchIdBase: Long = 1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(batchIdBase >= 1,
      s"batchIdBase must be >= 1 (0 is the build batch), got $batchIdBase")
    // construction-time pin, as in [[maintainStream]]
    val pinned = resolveVersion(dir, version)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyMutations(batch, dir, batchId + batchIdBase, pinned, opcodeCol,
        idCol, vecCol, seqnoCol)
    }
  }

  /** Latest-batch-wins resolution over a multi-batch codes frame: each id
    * keeps its row from the highest `b` (the batch directory partition
    * column); within one batch a [[delete]] tombstone shadows a data row.
    * A winning tombstone resolves the id as ABSENT (filtered out here, so
    * downstream scoring never sees it). Skipped entirely for single-batch
    * reads — the common built-then-compacted shape pays no shuffle, and
    * batch 0 ([[build]]/[[compact]] output) never contains tombstones.
    * The window runs over the PROBED subset only in [[probe]] (post
    * partition-pruning), so its cost is ∝ probed codes, never the
    * standing index.
    */
  /** Each id's WINNING row across batches — highest batch, tombstone
    * outranking a data row within one batch. The single resolver both
    * [[latestWins]] (which then drops tombstone winners) and [[stats]]
    * (which counts them) share, so the tie-break can never silently
    * diverge between what probes resolve and what the stats surface
    * reports.
    */
  private def winnersOf(codes: DataFrame, idCol: String,
                        nBatches: Int): DataFrame =
    if (nBatches <= 1) codes
    else codes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("b").desc, col("codes").isNull.desc)))
      .filter(col("__rn") === 1).drop("__rn")

  private def latestWins(codes: DataFrame, idCol: String,
                         nBatches: Int): DataFrame =
    winnersOf(codes, idCol, nBatches).filter(col("codes").isNotNull)

  /** Fold a version's committed batches into a single-batch NEW version:
    * latest-batch-wins over every id (shadowed re-embedded rows are
    * dropped — including the cross-cluster stale rows [[probe]]'s
    * windowed view cannot see; ids whose newest row is a [[delete]]
    * tombstone are dropped entirely, tombstones included — the fold is
    * where deletions stop costing anything), written as the new
    * version's `b=0` under
    * the SAME frozen model (the model JSON is copied; compaction is a
    * layout fold, not a retrain). The source version stays intact for
    * pinned readers — the [[graft.streaming.EpochStore.rotate]] pattern.
    * Returns the new version. Fold cost ∝ live codes; run it when the
    * committed-batch count (visible via `graft_ann_model(...).n_batches`)
    * makes per-probe batch listings or upsert shadowing worth collapsing.
    */
  def compact(spark: SparkSession, dir: String, version: Int = -1,
              idCol: String = "vec_id"): Int = {
    val v = resolveVersion(dir, version)
    val dirs = committedBatches(dir, v).map(b => s"${codesRoot(dir, v)}/b=$b")
    require(dirs.nonEmpty, s"version $v has no committed codes batches")
    val folded = latestWins(
      spark.read.option("basePath", codesRoot(dir, v)).parquet(dirs: _*),
      idCol, dirs.length)
      .select(col(idCol), col("c_id"), col("codes"), col("nrm"))
    val nv = VersionedSlots.claimDir(dir, n => s"v$n",
      VersionedSlots.versions(dir, parseVersion).lastOption.getOrElse(0) + 1)
    writeBatch(folded, dir, nv, 0L)
    VersionedSlots.publishReplace(modelPath(dir, nv),
      Files.readString(modelPath(dir, v)))
    nv
  }

  /** Re-train the routing + codebooks from the RESOLVED live rows of a
    * pinned version and publish the result as a NEW version — the
    * drift-recovery lifecycle op, and the complement of [[compact]]:
    * compact folds LAYOUT under the frozen model; retrain re-fits the
    * MODEL itself, for when ingest drift has degraded routing (the
    * `max_cluster / n_vectors` skew signal from [[stats]], or a
    * `n_batches` ingest volume that dwarfs the training corpus — both
    * wire-visible via `graft_ann_stats` / `graft_ann_model`).
    *
    * The store holds lossy PQ codes, not vectors, so `vectors` resolves
    * live ids to exact embeddings — the same source-of-truth frame
    * probes re-rank against; a SUPERSET of the live ids is fine (the
    * semi-join keeps live ids only; tombstoned and shadowed rows are
    * excluded by the same latest-wins fold [[compact]] uses). Live-id
    * resolution is distributed (∝ live codes); training and the new
    * `b=0` are exactly [[build]] on the resolved frame, so every build
    * invariant (slot claim, model-JSON-last visibility) holds. The
    * source version stays intact for pinned readers — [[gcShadowed]]
    * reclaims it.
    *
    * GEOMETRY IS INHERITED: `nCentroids`/`m`/`codebookK`/`coarseProbes`
    * default (−1) to the SOURCE model's values and `residual = None`
    * inherits its layout — a drift recovery must not silently swap the
    * deployed index's quantization geometry (the exact property
    * [[compact]] preserves by copying the model). Pass explicit values
    * / `Some(_)` only for a deliberate geometry or layout MIGRATION —
    * which is a retrain by definition: codes are not portable across
    * models. (`twoLevelThreshold` is a build-time decision, not a model
    * fact: whether the re-fit routing gets a coarse level is re-decided
    * for the new centroid count.)
    *
    * `vectors` must carry ONE row per live id (the current-snapshot
    * contract; enforced) — a duplicated id would land twice in the new
    * single-batch version, where no latest-wins fold can resolve it,
    * and break the answers-once probe contract.
    *
    * Reference analog: the engine has no in-place index mutation either
    * — re-creating a function over the same source re-processes the
    * CURRENT document set as a fresh deployment
    * (`http_handlers.go:1650-1678`, the function POST lifecycle that
    * re-runs savePrimaryStore/saveTempStore), and `savePrimaryStore`
    * refuses to mutate a live deployment (`http_handlers.go:1118-1121`).
    */
  def retrain(spark: SparkSession, dir: String, vectors: DataFrame,
              version: Int = -1,
              nCentroids: Int = -1, kmeansIters: Int = 2,
              m: Int = -1, codebookK: Int = -1,
              idCol: String = "vec_id", vecCol: String = "embedding",
              twoLevelThreshold: Int = 64, coarseProbes: Int = -1,
              residual: Option[Boolean] = None): (Model, Int) = {
    val v = resolveVersion(dir, version)
    val src = loadModel(dir, v)
    def inherit(arg: Int, fromModel: Int) = if (arg > 0) arg else fromModel
    val dirs = committedBatches(dir, v).map(b => s"${codesRoot(dir, v)}/b=$b")
    require(dirs.nonEmpty, s"version $v has no committed codes batches")
    val live = latestWins(
      spark.read.option("basePath", codesRoot(dir, v)).parquet(dirs: _*),
      idCol, dirs.length).select(col(idCol))
    // shared lazy checkpoint ([[stats]]/[[probe]] discipline): the
    // latest-wins window over EVERY codes batch + the semi-join feed
    // the uniqueness aggregate, every k-means iteration, the PQ
    // sample and the final encode — without the barrier each of those
    // ~(iters+3) jobs re-runs the most expensive scan in the operation
    val liveVecs = graft.plans.LazyCheckpoint.shared(
      vectors.select(col(idCol), col(vecCol))
        .join(live, Seq(idCol), "left_semi"))
    // one row per live id, enforced: a duplicate would land twice in the
    // new SINGLE-batch version where latestWins cannot resolve it (one
    // aggregate over the live set — minor next to the k-means passes)
    val u = liveVecs.agg(count(lit(1)).as("__r"),
      count_distinct(col(idCol)).as("__d")).head()
    require(u.getLong(0) == u.getLong(1),
      s"vectors frame carries duplicate $idCol rows for " +
        s"${u.getLong(0) - u.getLong(1)} live ids — retrain requires one " +
        "row per live id (the current-snapshot contract)")
    // hash-order seeding: a retrain's live set is id-ordered by ARRIVAL
    // ("old corpus, then drifted ingest"), exactly the layout where
    // first-k-by-id seeds would all sit in the pre-drift region — see
    // [[Similarity.collectCentroids]]
    build(liveVecs, dir,
      inherit(nCentroids, src.fine.length), kmeansIters,
      inherit(m, src.m), inherit(codebookK, src.codebookK),
      idCol, vecCol, twoLevelThreshold,
      inherit(coarseProbes, src.coarseProbes),
      residual.getOrElse(src.isResidual),
      seedByHash = true)
  }

  /** Explicit version GC ([[VersionedSlots.gcShadowed]]): delete index
    * versions shadowed by the newest `keepLast` — what [[compact]] and
    * re-[[build]]s leave behind for pinned probes — and uncommitted
    * version directories (a crashed build: slot claimed, model never
    * published) older than `staleUncommittedMs`. `model.json` is deleted
    * first, so a raced [[versions]] listing can never see a half-deleted
    * version as visible. Returns the versions deleted.
    */
  def gcShadowed(dir: String, keepLast: Int = 2,
                 staleUncommittedMs: Long = 24L * 3600 * 1000,
                 nowMs: Long = System.currentTimeMillis): Seq[Int] =
    VersionedSlots.gcShadowed(dir, parseVersion,
      visible = p => Files.exists(p.resolve("model.json")),
      keepLast = keepLast, marker = Some("model.json"),
      staleUncommittedMs = staleUncommittedMs, nowMs = nowMs)

  /** Store STATISTICS for a pinned version over the RESOLVED state
    * (latest-batch-wins) — the ANN tier's `idx_stats`/`bm25Stats`
    * analog, a MAINTENANCE scan (reads the whole codes table, unlike a
    * probe): `n_vectors` live ids, `n_deleted` ids whose winning row is
    * a tombstone, `n_clusters` non-empty clusters and `max_cluster`
    * (the hot-cluster/skew signal the upsert gate in ScaleSmoke watches;
    * an operator alerts when `max_cluster / n_vectors` drifts — the
    * rebuild-the-routing signal, alongside `n_batches` from the model
    * facts).
    */
  def stats(spark: SparkSession, dir: String,
            version: Int = -1,
            idCol: String = "vec_id"): DataFrame = {
    val v = resolveVersion(dir, version)
    val batches = committedBatches(dir, v)
    require(batches.nonEmpty, s"version $v has no committed codes batches")
    val dirs = batches.map(b => s"${codesRoot(dir, v)}/b=$b")
    val all = spark.read.option("basePath", codesRoot(dir, v))
      .parquet(dirs: _*)
    // the SHARED winners resolver ([[winnersOf]] — the exact view
    // probes resolve); latestWins drops tombstone winners, stats counts
    // them from the same view. Lazily checkpointed: the live aggregate
    // and the deleted count are two jobs, and without the barrier each
    // would re-scan every batch directory and re-run the window
    val winners = graft.plans.LazyCheckpoint.shared(
      winnersOf(all, idCol, batches.length))
    val live = winners.filter(col("codes").isNotNull)
    val perCluster = live.groupBy("c_id").agg(count(lit(1)).as("__n"))
    // coalesce: a validly EMPTIED store (every id tombstoned) must
    // report (0, n, 0, 0), not nulls — this surface exists precisely to
    // inspect such states
    perCluster.agg(
        coalesce(sum("__n"), lit(0L)).cast("long").as("n_vectors"),
        count(lit(1)).cast("long").as("n_clusters"),
        coalesce(max("__n"), lit(0L)).cast("long").as("max_cluster"))
      .crossJoin(broadcast(
        winners.filter(col("codes").isNull)
          .agg(count(lit(1)).cast("long").as("n_deleted"))))
      .select("n_vectors", "n_deleted", "n_clusters", "max_cluster")
  }

  /** The frozen-model codes frame for `corpus` under a pinned version —
    * exactly what [[build]]/[[ingest]] persist ([[encodeFrame]] is shared
    * verbatim), exposed for state-equivalence invariants: a maintained
    * index (base + ingest batches + tombstones, folded) must equal the
    * re-encode of the current corpus snapshot — the ANN form of the
    * maintained ≡ rebuilt contract the scalar index pins in
    * `idx_catchup`. Pure scan expressions over `corpus`; nothing is read
    * from or written to the store.
    */
  def encodeWith(corpus: DataFrame, dir: String, version: Int = -1,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    encodeFrame(corpus, loadModel(dir, resolveVersion(dir, version)),
      idCol, vecCol)

  /** Load a pinned version's model (immutable). */
  def loadModel(dir: String, version: Int): Model =
    Serialization.read[Model](Files.readString(modelPath(dir, version)))

  /** The newest visible version, if any. */
  def latestVersion(dir: String): Option[Int] = versions(dir).lastOption

  private def resolveVersion(dir: String, version: Int): Int =
    if (version > 0) version
    else latestVersion(dir).getOrElse(throw new NoSuchElementException(
      s"no ANN index versions under $dir"))

  private def route(model: Model)(vecC: Column, kk: Int): Column =
    VectorOps.nearestCentroids(vecC, model.fineArr, model.coarseArr,
      model.members, kk, model.coarseProbes)

  /** Probe the persisted index: top-k cosine neighbors per query, same
    * output contract as [[Similarity.ivfPqTopK]] and the same scoring
    * code ([[Similarity.pqScore]]). `version` pins the artifact
    * (default -1 = newest visible). The routed query frame is lazily
    * checkpointed and materialized ONCE — the collected probed-cluster
    * set and the scoring join consume the SAME routed rows, so a
    * non-deterministic `queries` frame (a sample, a shuffle-dependent
    * order) cannot route outside the collected partition filter. The
    * probed cluster set is resolved driver-side (nprobe × |queries| ints
    * — probe batches are control-plane-sized by nature) and applied as a
    * literal partition filter, so the codes scan is statically pruned to
    * the probed `c_id=` directories across every committed ingest batch.
    * `corpus` supplies true vectors for the exact re-rank of shortlist
    * rows only.
    *
    * '''Filtered search''' (`allowed`): the metadata-constrained vector
    * query every production ANN service answers ("nearest neighbors
    * among documents WHERE <predicate>") — pass the predicate's id set
    * as a one-column frame and the probe returns top-k among THOSE ids
    * only. This is a PRE-filter, not a post-filter: the candidate codes
    * semi-join the allowed set BEFORE the ADC shortlist window, so the
    * shortlist holds k·rerank ALLOWED candidates and selective filters
    * cannot starve the result (the post-filter failure mode). Cost
    * shape is unchanged — the scan still reads only probed cluster
    * directories; the semi-join touches probed candidates, never the
    * corpus, and the id-level filter commutes with latest-batch-wins
    * (tombstones share the data row's id, so resolution is unaffected).
    *
    * '''Batch probes''' (`broadcastQ = false`): when `queries` is itself
    * corpus-scale (a whole ingest batch probing the store, e.g.
    * [[graft.operators.Dedup.semanticIncrementalStore]]), the probed
    * cluster set collapses to ≤ nCentroids ids (still control-plane
    * bounded — it is collected DISTINCT), but broadcasting the query
    * frame or the shortlist would ship corpus-sized state to every
    * task. `false` routes both through ordinary shuffle joins keyed on
    * `c_id` / `neighbor_id`; the static partition pruning of the codes
    * scan is identical in both modes.
    *
    * `excluded` is the anti-join analog of `allowed`: ids in the frame
    * can never answer, gated with the same pre-filter semantics (before
    * the shortlist window, so excluded rows cannot occupy shortlist
    * slots). Its load-bearing use is streaming dedup ingest
    * ([[graft.streaming.StreamingDedup.semanticIngestStore]]): a batch
    * that probes the store and then ingests ITSELF excludes its own
    * ids, so a foreachBatch retry that re-probes AFTER its ingest
    * landed returns the identical verdicts — at-least-once delivery
    * stays exactly-once. Cost ∝ probed codes, like `allowed`.
    *
    * `asOfBatch` is batch-id snapshot isolation: only committed batches
    * `<= asOfBatch` are read. A probe racing a concurrent batch write
    * is the load-bearing case — a retried streaming batch
    * wholesale-OVERWRITES its own directory, so a probe whose file
    * listing included the first attempt's files would hit
    * FILE_NOT_EXIST mid-read; pinning the probe to the batches BEFORE
    * the one being written makes it immune to the overwrite (and makes
    * retry verdicts bit-identical — same candidate set by
    * construction).
    *
    * SELF-EXCLUSION: the candidate whose id EQUALS the row's `q_id` is
    * excluded from that query's neighbors (the re-rank shares
    * [[Similarity.pqScore]]'s near-dup convention — a vector is never
    * its own neighbor). Callers whose query ids live in the corpus id
    * space must remap them (the single-query SQL wire passes
    * `q_id = -1`), or doc N can never answer query N through this leg.
    */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
            corpus: DataFrame, k: Int, nprobe: Int = 4, rerank: Int = 16,
            idCol: String = "vec_id", vecCol: String = "embedding",
            version: Int = -1,
            allowed: Option[DataFrame] = None,
            broadcastQ: Boolean = true,
            excluded: Option[DataFrame] = None,
            asOfBatch: Long = Long.MaxValue): DataFrame = {
    val v = resolveVersion(dir, version)
    // Route-once discipline, two cost shapes:
    //  - broadcastQ (interactive probe; queries are control-plane-sized
    //    by premise): the driver must see the routed rows anyway to
    //    resolve the partition filter, so collect them ONCE and re-enter
    //    them as a local relation — one job, versus the former
    //    checkpoint-materialize + distinct-collect pair, and the same
    //    no-reroute guarantee (a non-deterministic queries frame cannot
    //    route outside the collected filter: the plan consumes the very
    //    rows the filter was derived from). [[routeQueries]] +
    //    [[probeRouted]] factor the two halves so a caller probing
    //    several same-model versions (a fold-equivalence gate over a
    //    version and its [[compact]] fold) pays ONE routing job.
    //  - batch probes (corpus-scale queries): collecting is forbidden —
    //    keep the shared lazy checkpoint + distinct collect.
    // A/B + operational kill-switch for the local-relation fast path
    val localOk = spark.conf.getOption("spark.graft.ann.probeLocal")
      .forall(_.toBoolean)
    if (broadcastQ && localOk)
      probeRouted(spark, dir, routeQueries(spark, dir, queries, nprobe, v),
        corpus, k, rerank, idCol, vecCol, v, allowed, excluded, asOfBatch)
    else {
      val model = loadModel(dir, v)
      val routedPlan = queries.select(col("q_id"), col("q_vec"),
        VectorOps.norm(col("q_vec")).as("__qn"),
        VectorOps.pqLut(col("q_vec"), model.codebookArr).as("__lut"),
        explode(route(model)(col("q_vec"), nprobe)).as("c_id"))
      val ck = graft.plans.LazyCheckpoint.shared(routedPlan)
      val probed = ck.select("c_id").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      scoreProbed(spark, dir, v, ck, probed, corpus, k, rerank,
        idCol, vecCol, allowed, excluded, asOfBatch, broadcastQ = false)
    }
  }

  /** The routed, driver-resolved query batch of an interactive
    * (`broadcastQ`) probe: one LOCAL row per query (q_id, q_vec, __qn,
    * __lut, __routes — the nprobe nearest cluster ids) plus the distinct
    * probed cluster set. Collected PRE-explode, so each query's LUT and
    * vector live once in driver memory, not once per probed cluster.
    *
    * Resolved ONCE and shareable by several [[probeRouted]] calls whose
    * versions carry the SAME model — the [[compact]] contract (the model
    * JSON is copied verbatim), which lets a fold-equivalence gate
    * (multi-batch version vs its compacted fold) pay ONE routing job for
    * both arms. Sharing across versions with DIFFERENT models would
    * route against the wrong centroids — callers own that invariant.
    */
  final case class Routed(rows: Array[org.apache.spark.sql.Row],
                          schema: org.apache.spark.sql.types.StructType,
                          probed: Seq[Int], nprobe: Int)

  def routeQueries(spark: SparkSession, dir: String, queries: DataFrame,
                   nprobe: Int, version: Int = -1): Routed = {
    val v = resolveVersion(dir, version)
    val model = loadModel(dir, v)
    val plan = queries.select(col("q_id"), col("q_vec"),
      VectorOps.norm(col("q_vec")).as("__qn"),
      VectorOps.pqLut(col("q_vec"), model.codebookArr).as("__lut"),
      route(model)(col("q_vec"), nprobe).as("__routes"))
    val rows = plan.collect()
    val rIdx = plan.schema.fieldIndex("__routes")
    val probed = rows.iterator.flatMap(_.getSeq[Int](rIdx))
      .toArray.distinct.sorted.toSeq
    Routed(rows, plan.schema, probed, nprobe)
  }

  /** [[probe]] from a pre-resolved [[Routed]] batch — the second half of
    * the broadcastQ local path, exposed so independent probe arms of one
    * lifecycle invariant can share a single routing job (and run their
    * result actions concurrently; the store reads are immutable
    * per-version directories). `version` must carry the SAME model the
    * batch was routed with ([[routeQueries]] contract).
    */
  def probeRouted(spark: SparkSession, dir: String, routed: Routed,
                  corpus: DataFrame, k: Int, rerank: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  version: Int = -1,
                  allowed: Option[DataFrame] = None,
                  excluded: Option[DataFrame] = None,
                  asOfBatch: Long = Long.MaxValue): DataFrame = {
    val v = resolveVersion(dir, version)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(routed.rows: _*), routed.schema)
    val queryBase = local.select(col("q_id"), col("q_vec"), col("__qn"),
      col("__lut"), explode(col("__routes")).as("c_id"))
    scoreProbed(spark, dir, v, queryBase, routed.probed, corpus, k, rerank,
      idCol, vecCol, allowed, excluded, asOfBatch, broadcastQ = true)
  }

  /** The scoring half shared by both probe shapes: static partition
    * pruning to the probed clusters (+ tombstones), allowed/excluded
    * gates, latest-batch-wins resolution, ADC + exact re-rank.
    */
  private def scoreProbed(spark: SparkSession, dir: String, v: Int,
                          queryBase: DataFrame, probed: Seq[Int],
                          corpus: DataFrame, k: Int, rerank: Int,
                          idCol: String, vecCol: String,
                          allowed: Option[DataFrame],
                          excluded: Option[DataFrame],
                          asOfBatch: Long,
                          broadcastQ: Boolean): DataFrame = {
    val model = loadModel(dir, v)
    // residual models: the exact q·c(v) bias per probed cluster — a
    // deterministic function of the materialized (q_vec, c_id), so it
    // composes AFTER the route-once point without breaking it
    val queryA =
      if (model.isResidual) queryBase.withColumn("__bias",
        VectorOps.dot(col("q_vec"),
          element_at(typedlit(model.fine), col("c_id") + 1)))
      else queryBase
    val batchDirs = committedBatches(dir, v)
      .filter(_ <= asOfBatch)
      .map(b => s"${codesRoot(dir, v)}/b=$b")
    require(batchDirs.nonEmpty, s"version $v has no committed codes batches")
    // probed clusters PLUS the reserved tombstone partition: deletions
    // must shadow data rows wherever the data row's cluster is, so the
    // static filter always admits c_id=-1 (its volume is ∝ live
    // deletions; absent entirely on the compacted path)
    val scanned = (probed :+ TombstoneCluster).map(Integer.valueOf)
    val rawCodes = spark.read
      .option("basePath", codesRoot(dir, v))
      .parquet(batchDirs: _*)
      .filter(col("c_id").isin(scanned.toIndexedSeq: _*))
    val admitted = allowed.fold(rawCodes)(ids =>
      rawCodes.join(ids.select(col(idCol)), Seq(idCol), "left_semi"))
    val gated = excluded.fold(admitted)(ids =>
      admitted.join(ids.select(col(idCol)), Seq(idCol), "left_anti"))
    val corpusCodes = latestWins(gated, idCol, batchDirs.length)
      .select(col(idCol), col("c_id"), col("codes").as("__codes"),
        col("nrm").as("__n"))
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__v"), VectorOps.norm(col(vecCol)).as("__vn"))
    Similarity.pqScore(corpusCodes, vecs, queryA, k, rerank, idCol,
      biasCol = if (model.isResidual) Some("__bias") else None,
      broadcastQ = broadcastQ)
  }
}
