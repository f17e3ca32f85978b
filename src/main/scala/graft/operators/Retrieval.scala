package graft.operators

import java.nio.file.{Files, Paths}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VersionedSlots}
import graft.model.{HashPartition, IndexDef}

/** Index-accelerated BM25 — the retrieval tier composed with the engine's
  * own scalar index: the postings list IS an array index over the token
  * split (one entry per token OCCURRENCE, so tf = entry multiplicity —
  * exactly what [[IndexBuilder]]'s array path emits for `idx_array_words`,
  * reference `Projector/indexjs.go:131-141`), persisted hash-partitioned
  * by key through [[IndexStore.write]], plus a doc-stats sidecar
  * (docid, dl) for the scorer.
  *
  * Versioned like every other artifact store ([[VersionedSlots]]): each
  * [[buildBm25Index]] claims the next immutable `v<N>/` slot, writes
  * `postings/` and `docstats/`, and publishes the `bm25.json` layout
  * marker LAST — a version is visible only when complete, probes pin a
  * version, re-builds never disturb standing readers, and
  * [[gcShadowed]] sweeps what compactions leave behind. The marker
  * carries the layout (`nPartitions`), so a probe needs only the store
  * directory — the caller cannot mis-state the hash fan-out.
  *
  * The probe never scans the corpus: the query terms' partition ids are
  * resolved driver-side with the SAME hash the store layout used
  * (literal terms — control-plane math, the [[AnnIndex.probe]] pattern)
  * and applied as a static `part` filter, so the postings scan reads
  * ONLY the probed directories; within them the pushed `key IN (...)`
  * filter prunes row groups of the key-sorted parquet. At 100 TB a
  * 3-term query touches terms/nPartitions of the postings and none of
  * the documents.
  *
  * Score parity: the per-(doc, term) partial mirrors
  * [[TextOps.bm25TopK]]'s expression structure VERBATIM (same integer
  * inputs, same literal arithmetic, same micro-unit rounding before the
  * order-free long sum), so the indexed probe returns the IDENTICAL
  * rows as the full-scan scorer whenever ≥ k documents contain a query
  * term (a zero-hit doc scores 0 in the full scan but has no postings
  * here — it can only surface when hits cannot fill the top-k).
  */
object Retrieval {

  /** The layout marker: what a probe must know about how the store was
    * written. Published LAST — its presence IS version visibility.
    */
  final case class Bm25Layout(nPartitions: Int)

  private implicit val formats: Formats = DefaultFormats

  private val VersionDir = "v([0-9]+)".r

  private def parseVersion(name: String): Option[Int] = name match {
    case VersionDir(v) => Some(v.toInt)
    case _ => None
  }

  private def markerPath(dir: String, v: Int) =
    Paths.get(dir, s"v$v", "bm25.json")

  /** Visible store versions, ascending (`bm25.json` published last). */
  def versionsOf(dir: String): Seq[Int] =
    VersionedSlots.versions(dir, parseVersion,
      visible = p => Files.exists(p.resolve("bm25.json")))

  /** The newest visible version, if any. */
  def latestVersion(dir: String): Option[Int] = versionsOf(dir).lastOption

  /** Explicit version GC ([[VersionedSlots.gcShadowed]], marker-first
    * decommission). Returns the versions deleted.
    */
  def gcShadowed(dir: String, keepLast: Int = 2): Seq[Int] =
    VersionedSlots.gcShadowed(dir, parseVersion,
      visible = p => Files.exists(p.resolve("bm25.json")),
      keepLast = keepLast, marker = Some("bm25.json"))

  private def bm25Def(idCol: String, nPartitions: Int): IndexDef =
    IndexDef("idx_bm25_postings", "documents", idCol,
      // the SQL twin of TextOps.normTokens — one shared tokenization
      secExprs = Seq("split(lower(trim(text)), '\\\\s+')"),
      isArrayIndex = true,
      partition = HashPartition(Seq("key"), nPartitions))

  /** Build the BM25 artifacts as the NEXT immutable version under `dir`:
    * `v<N>/postings` (the persisted array index, hash-partitioned by
    * key) and `v<N>/docstats` (docid, dl). Both derive from one corpus
    * scan each; dl equals the doc's postings multiplicity by
    * construction (the split emits every token). Returns the version.
    */
  def buildBm25Index(docs: DataFrame, dir: String,
                     textCol: String = "text", idCol: String = "doc_id",
                     nPartitions: Int = 16): Int = {
    val defn = bm25Def(idCol, nPartitions)
    val v = VersionedSlots.claimDir(dir, n => s"v$n",
      VersionedSlots.versions(dir, parseVersion).lastOption.getOrElse(0) + 1)
    IndexStore.write(IndexBuilder.build(docs, defn),
      s"$dir/v$v/postings", defn)
    docs.select(expr(idCol).as("docid"),
        size(TextOps.normTokens(col(textCol))).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$dir/v$v/docstats")
    VersionedSlots.publishReplace(markerPath(dir, v),
      Serialization.write(Bm25Layout(nPartitions)))
    v
  }

  private def resolveVersion(dir: String, version: Int): Int =
    if (version > 0) version
    else latestVersion(dir).getOrElse(throw new NoSuchElementException(
      s"no BM25 index versions under $dir"))

  /** Reciprocal-rank fusion of two ranked lists — the hybrid-retrieval
    * combiner (BM25 relevance × a quality/semantic prior):
    * `score(d) = Σ 1/(c + rank_i(d))` over the lists containing `d`
    * (absent ⇒ contributes 0), the standard RRF with `c = 60`.
    * Inputs are (idCol, rankCol) frames — shortlist-sized by
    * construction (top-N each), so the full-outer join is control-plane
    * work regardless of corpus size. The fused score is nano-rounded to
    * a long BEFORE ranking (integer denominators and a fixed a+b
    * order, so both engines compute the identical double → identical
    * long), ties break on the id. Output: (idCol, rrf_nano, rankCol).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60,
              idCol: String = "doc_id", rankCol: String = "rk",
              outCol: String = "rrf_nano"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ra = a.select(col(idCol), col(rankCol).as("__ra"))
    val rb = b.select(col(idCol), col(rankCol).as("__rb"))
    def contrib(r: org.apache.spark.sql.Column) =
      when(r.isNotNull, lit(1.0) / (lit(c) + r)).otherwise(lit(0.0))
    val fused = ra.join(rb, Seq(idCol), "full_outer")
      .withColumn(outCol,
        round((contrib(col("__ra")) + contrib(col("__rb"))) * lit(1e9))
          .cast("long"))
    fused.orderBy(col(outCol).desc, col(idCol).asc).limit(k)
      .select(col(idCol), col(outCol))
      .withColumn(rankCol, row_number().over(
        Window.orderBy(col(outCol).desc, col(idCol).asc)))
  }

  /** Top-k BM25 over a pinned version's postings: (doc_id, n_hit,
    * score_micro, rk) — the same output contract as
    * [[TextOps.bm25TopK]], computed from the store alone (the layout
    * comes from the version's own marker, never from the caller).
    */
  def bm25TopKFromIndex(spark: SparkSession, dir: String,
                        terms: Seq[String], k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        version: Int = -1): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
    require(k >= 1, "k must be >= 1")
    val v = resolveVersion(dir, version)
    val nPartitions = Serialization.read[Bm25Layout](
      Files.readString(markerPath(dir, v))).nPartitions
    // the probed partition ids, resolved driver-side with the layout's
    // own hash (one 1-row job over literal terms — control-plane)
    val parts = spark.range(1).select(
        array(terms.map(t => pmod(hash(lit(t)), lit(nPartitions))): _*))
      .head().getSeq[Int](0).distinct.sorted
    val post = IndexStore.read(spark, s"$dir/v$v/postings")
      .filter(col("part").isin(parts.map(Integer.valueOf): _*) &&
        col("key").isin(terms: _*))
    val tf = post.groupBy("docid", "key").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("key").agg(count(lit(1)).cast("long").as("__df"))
    val dl = spark.read.parquet(s"$dir/v$v/docstats")
    val stats = dl.agg(count(lit(1)).cast("long").as("__n"),
      sum("dl").as("__tot"))
    // the TextOps.bm25TopK partial, verbatim structure — integer inputs
    // and literal arithmetic shared, micro-rounded before the long sum
    val tfD = col("__tf").cast("double")
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val avgdl = col("__tot").cast("double") / col("__n")
    val partial = round(idf * (tfD * lit(k1 + 1)) /
      (tfD + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / avgdl))) *
      lit(1e6)).cast("long")
    val scored = tf.join(broadcast(dfreq), "key")
      .join(dl, "docid").crossJoin(broadcast(stats))
      .withColumn("__sc", partial)
      .groupBy("docid")
      .agg(count(lit(1)).cast("int").as("n_hit"),
        sum("__sc").as("score_micro"))
    val top = scored
      .orderBy(col("score_micro").desc, col("docid").asc).limit(k)
    top.select(col("docid").as("doc_id"), col("n_hit"), col("score_micro"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id").asc)))
  }
}
