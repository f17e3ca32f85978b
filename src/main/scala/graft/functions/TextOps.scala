package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines.
  *
  * Everything here is a `Column` expression over
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs, no shuffles of its
  * own — so a 100 TB documents scan computes these in the same whole-stage
  * codegen pass that reads the parquet.
  */
object TextOps {

  /** Whitespace tokenization (the reference delegates all text handling to
    * arbitrary JS; we expose explicit primitives instead).
    */
  def tokens(text: Column): Column = split(text, "\\s+")

  def normTokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: whitespace tokens plus an extra unit per 4 chars
    * of long tokens — a cheap, deterministic proxy for tokenizer load
    * estimation at corpus scale.
    */
  def subwordCount(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(4.0)).cast("long")))

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** Quality-scoring features: token counts, average token length,
    * stop-word ratio, distinct-token ratio. All exact integer ratios turned
    * into doubles (deterministic across engines — used by the DuckDB oracle).
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = normTokens(text)
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    Seq(
      "n_tokens" -> nTok,
      "n_chars" -> length(text).cast("long"),
      "avg_token_len" ->
        (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok),
      "stopword_ratio" -> (nStop.cast("double") / nTok),
      "distinct_ratio" -> (nDistinct.cast("double") / nTok))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, lexical
    * diversity, and a natural stop-word rate. Deterministic arithmetic only.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenScore = least(f("n_tokens").cast("double") / lit(64.0), lit(1.0))
    val divScore = f("distinct_ratio")
    val stopScore = lit(1.0) - abs(f("stopword_ratio") - lit(0.4))
    round((lenScore + divScore + stopScore) / lit(3.0), 6)
  }

  /** Language-ID by marker-token voting (n-gram-free heuristic: count hits
    * against per-language stop-word profiles, argmax, ties → first in list).
    * Pure expression → runs inside codegen; suitable as a pre-filter at
    * corpus scale where a real classifier is a later, costlier pass.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "不"))

  def langId(text: Column): Column = {
    val toks = normTokens(text)
    // struct(score, negIdx, lang): array_max picks highest score, ties → first profile
    val scored = array(langProfiles.zipWithIndex.map { case ((lang, markers), i) =>
      struct(
        size(filter(toks, t => t.isin(markers.map(lit(_)): _*))).as("score"),
        lit(-i).as("tiebreak"),
        lit(lang).as("lang"))
    }: _*)
    array_max(scored).getField("lang")
  }

  /** Content-defined fingerprint: md5 of whitespace-normalized, lowercased
    * text. Cross-engine deterministic (oracle: DuckDB `md5`).
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 31-bit rolling polynomial fingerprint over normalized tokens
    * (base-31 Horner over xxhash64 of each token, kept in [0, 2^31) so the
    * arithmetic never overflows under ANSI mode) — the cheap shift-resistant
    * fingerprint for near-dup pre-bucketing. Engine-internal (xxhash64 seed
    * semantics are Spark's), so verified by ScalaTest, not the SQL oracle.
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(
      normTokens(text),
      lit(0L),
      (acc, t) =>
        pmod(acc * lit(31L) + xxhash64(t).bitwiseAND(lit(0x7fffffffL)),
          lit(1L << 31)))

  /** Distinct word n-gram shingles (n consecutive tokens joined by space);
    * docs with fewer than n tokens yield an empty array. Native single-pass
    * expression ([[ShinglesExpr]]) — the HOF formulation
    * (`transform(sequence, slice+concat_ws)`) interprets one expression tree
    * per shingle position and dominated the dedup profile at scale.
    */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      ShinglesExpr(org.apache.spark.sql.GraftBridge.expression(text), n))
}
