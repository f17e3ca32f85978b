package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{Sampling => S}

/** Sequence-shaping operators for training-data preparation: chunking long
  * documents into overlapping token windows, and packing documents into
  * fixed token-budget bins — the two transforms between a curated corpus
  * and a tokenizer's input.
  */
object Packing {

  /** Split each doc into token windows of `window` tokens with `overlap`
    * tokens of context carried between consecutive chunks
    * (stride = window - overlap). Chunk i covers tokens
    * [i·stride, i·stride + window); the chunk count is
    * ceil(max(len - overlap, 1) / stride), so every token is covered and a
    * doc shorter than a window yields exactly one chunk. Pure expressions:
    * the explode is the only row-count change, no shuffle; token count and
    * text derive from the SAME sliced array (no re-tokenization).
    */
  def chunk(docs: DataFrame, window: Int, overlap: Int,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(overlap >= 0 && overlap < window, "0 <= overlap < window")
    val stride = window - overlap
    val toks = TextOps.normTokens(col(textCol))
    val nChunks = greatest(
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    docs.select(col(idCol).as("doc_id"), toks.as("toks"),
        nChunks.as("n_chunks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1), i =>
          slice(col("toks"), i * stride + 1, lit(window))))
          .as(Seq("chunk_idx", "chunk_toks")))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk_toks")).cast("long").as("chunk_tokens"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"))
  }

  /** Assign docs to fixed token-budget packs, per stratum, in the engine's
    * deterministic hash order ([[Sampling.hashKey]]): pack id = cumulative
    * tokens BEFORE the doc, integer-divided by the budget. Deterministic
    * under any partitioning; the window shuffles only (stratum, tiny keys).
    */
  def pack(docs: DataFrame, budget: Long, strataCol: String = "source",
           tokensCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(S.hashKey(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"), col(strataCol).as("source"),
        col(tokensCol).as("n_tokens"))
      .withColumn("pack_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
          .cast("long"))
  }
}
