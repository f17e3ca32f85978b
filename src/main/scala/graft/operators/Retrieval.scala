package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.model.{HashPartition, IndexDef}

/** Index-accelerated BM25 — the retrieval tier composed with the engine's
  * own scalar index: the postings list IS an array index over the token
  * split (one entry per token OCCURRENCE, so tf = entry multiplicity —
  * exactly what [[IndexBuilder]]'s array path emits for `idx_array_words`,
  * reference `Projector/indexjs.go:131-141`), persisted hash-partitioned
  * by key through [[IndexStore.write]], plus a doc-stats sidecar
  * (docid, dl) and the scorer's 1-row totals.
  *
  * The probe never scans the corpus: the query terms' partition ids are
  * resolved driver-side with the SAME hash the store layout used
  * (literal terms — control-plane math, the [[AnnIndex.probe]] pattern)
  * and applied as a static `part` filter, so the postings scan reads
  * ONLY the probed directories; within them the pushed `key IN (...)`
  * filter prunes row groups of the key-sorted parquet. At 100 TB a
  * 3-term query touches 3/nPartitions of the postings and none of the
  * documents.
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

  private def bm25Def(idCol: String, nPartitions: Int): IndexDef =
    IndexDef("idx_bm25_postings", "documents", idCol,
      // the SQL twin of TextOps.normTokens — one shared tokenization
      secExprs = Seq("split(lower(trim(text)), '\\\\s+')"),
      isArrayIndex = true,
      partition = HashPartition(Seq("key"), nPartitions))

  /** Build the BM25 artifacts under `dir`: `postings/` (the persisted
    * array index, hash-partitioned by key) and `docstats/` (docid, dl).
    * Both derive from one corpus scan each; dl equals the doc's postings
    * multiplicity by construction (the split emits every token).
    */
  def buildBm25Index(docs: DataFrame, dir: String,
                     textCol: String = "text", idCol: String = "doc_id",
                     nPartitions: Int = 16): Unit = {
    val defn = bm25Def(idCol, nPartitions)
    IndexStore.write(IndexBuilder.build(docs, defn), s"$dir/postings", defn)
    docs.select(expr(idCol).as("docid"),
        size(TextOps.normTokens(col(textCol))).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$dir/docstats")
  }

  /** Top-k BM25 over the persisted postings: (doc_id, n_hit,
    * score_micro, rk) — the same output contract as
    * [[TextOps.bm25TopK]], computed from the index alone.
    */
  def bm25TopKFromIndex(spark: SparkSession, dir: String,
                        terms: Seq[String], k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        nPartitions: Int = 16): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.distinct == terms, "query terms must be distinct")
    require(k >= 1, "k must be >= 1")
    // the probed partition ids, resolved driver-side with the layout's
    // own hash (one 1-row job over literal terms — control-plane)
    val parts = spark.range(1).select(
        array(terms.map(t => pmod(hash(lit(t)), lit(nPartitions))): _*))
      .head().getSeq[Int](0).distinct.sorted
    val post = IndexStore.read(spark, s"$dir/postings")
      .filter(col("part").isin(parts.map(Integer.valueOf): _*) &&
        col("key").isin(terms: _*))
    val tf = post.groupBy("docid", "key").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("key").agg(count(lit(1)).cast("long").as("__df"))
    val dl = spark.read.parquet(s"$dir/docstats")
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
