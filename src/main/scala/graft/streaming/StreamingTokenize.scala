package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Streaming tokenization — the arrival-time form of the tokenizer tier.
  *
  * The tokenizer itself (the BPE merge table) is FROZEN control-plane
  * data, trained ahead on a corpus snapshot
  * ([[graft.functions.TextOps.bpeTrainMergesLocal]]) — exactly how
  * production tokenizers are versioned: retraining per micro-batch would
  * silently re-id every previously emitted token. Each arriving document
  * is then encoded map-only inside the stream's projection
  * ([[graft.functions.TextOps.bpeEncode]] — no shuffle, no state), and
  * the only STATE the stream carries is the per-source token accounting
  * aggregate. count/sum are commutative monoids, so the running totals
  * after any prefix of the stream equal the batch aggregate over the
  * same rows — arrival order and batch boundaries cannot change the
  * answer (the `tokenize_streaming` oracle pins the final state against
  * an independent batch SQL replay, like `dedup_streaming`).
  *
  * 100 TB shape: encode cost scales with arriving bytes (pure map,
  * whole-stage-friendly); the state store holds ONE row per source
  * (control-plane cardinality). An update-mode sink on
  * [[tokenCountStream]] is the live feed a token-budget controller
  * (`Sampling.tokenBudget`'s knob) reads without rescanning the corpus.
  */
object StreamingTokenize {

  /** Map-only encode of an arriving stream:
    * (id, stratum, n_tokens, enc_md5) per document. Stateless — usable
    * under any output mode or inside `foreachBatch`; the two-level
    * select keeps the CodegenFallback encode computed once per row (see
    * [[graft.functions.TextOps.bpeTokensFromEncoded]]).
    */
  def encodeStream(stream: DataFrame, merges: Seq[(String, String)],
                   textCol: String = "text", idCol: String = "doc_id",
                   strataCol: String = "source"): DataFrame =
    stream.select(col(idCol), col(strataCol),
        TextOps.bpeEncode(col(textCol), merges).as("__enc"))
      .select(col(idCol), col(strataCol),
        size(TextOps.bpeTokensFromEncoded(col("__enc"))).cast("long")
          .as("n_tokens"),
        md5(col("__enc")).as("enc_md5"))

  /** Per-source running token accounting of the encoded stream:
    * (stratum, n_docs, total_tokens). The one stateful stage — a
    * map-side-partial streaming aggregate keyed on the stratum.
    */
  def tokenCountStream(stream: DataFrame, merges: Seq[(String, String)],
                       textCol: String = "text", idCol: String = "doc_id",
                       strataCol: String = "source"): DataFrame =
    encodeStream(stream, merges, textCol, idCol, strataCol)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
}
