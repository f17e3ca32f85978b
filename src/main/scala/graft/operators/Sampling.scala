package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — reproducible across engines, runs, and
  * partitionings, which `rand()` sampling is not. The order key is
  * `md5(key)` (hex string; fixed-length lowercase, so lexicographic
  * comparison == numeric comparison on the 128-bit value). Any engine with
  * md5 draws the SAME sample — resumable pipelines, auditable holdouts.
  *
  * Scale shape: [[byFraction]] is a pure filter in the scan (no shuffle,
  * no sort); [[stratified]] shuffles only on the stratum key and keeps
  * top-n per stratum via window rank.
  */
object Sampling {

  /** Pseudo-random but deterministic order key for a row key column. */
  def hashKey(c: Column): Column = md5(c.cast("string"))

  /** Hex threshold whose prefix encodes `frac` of the 32-bit space.
    * Fraction 1.0 returns a sentinel ABOVE every hex digest ('g' >
    * 'f'): `< round(1.0 · (2^32-1))` would still exclude the maximal
    * hash prefix, silently dropping ~1 row in 2^32 from a stratum the
    * contract says is kept whole.
    */
  def fracThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, "fraction in [0,1]")
    if (frac >= 1.0) "g"
    else f"${math.round(frac * 0xffffffffL)}%08x" + "0" * 24
  }

  /** Keep ~`frac` of rows, chosen by hash of `keyCol` — a scan-level
    * filter, deterministic under any parallelism.
    */
  def byFraction(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(hashKey(col(keyCol)) < lit(fracThreshold(frac)))

  /** Top-`n` rows per stratum in hash order — equal-sized deterministic
    * quotas per group (e.g. per source) regardless of group skew.
    */
  def stratified(df: DataFrame, strataCol: String, n: Int,
                 keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Per-stratum token-budget selection — "take the first N tokens of
    * every domain": keep the documents whose cumulative token offset in
    * the engine's deterministic hash order is still below `budget` (the
    * boundary-straddling doc is kept whole, so each stratum retains AT
    * LEAST `budget` tokens when it has them). This is the mixing step a
    * pretraining recipe states in TOKENS ("10B per domain"), which a
    * doc-count quota ([[stratified]]) or rate ([[mixture]]) can only
    * approximate when doc lengths differ across domains. Offsets come
    * from the bucketed two-phase prefix sum
    * ([[Packing.streamOffsets]]) — no stratum ever funnels through one
    * task; output carries `tok_before` (tokens preceding the doc in its
    * stratum's stream) for auditability.
    */
  def tokenBudget(df: DataFrame, budget: Long, strataCol: String = "source",
                  tokensCol: String = "n_tokens",
                  idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    // streamOffsets projects to its three fixed columns; join the
    // selection back by id so tokenBudget is a FILTER over df like
    // every sibling sampler (callers keep their other columns and
    // their own column names). The selected set is budget-bounded, so
    // the join's small side broadcasts under AQE at any corpus size.
    val sel = Packing.streamOffsets(df, strataCol, tokensCol, idCol,
        offCol = "tok_before")
      .filter(col("tok_before") < budget)
      .select(col("doc_id").as("__tb_id"), col("tok_before"))
    df.join(sel, df(idCol) === col("__tb_id")).drop("__tb_id")
  }

  /** Temperature-reweighted source mixture (the multilingual-pretraining
    * sampling scheme, temperature fixed at 1/2): a stratum holding T_s
    * of the corpus's tokens samples at weight w_s ∝ sqrt(T_s), i.e.
    * keep-fraction f_s = min(1, target · w_s / T_s)
    * = min(1, target / (Z · sqrt(T_s))) with Z = Σ_s sqrt(T_s) — big
    * sources are flattened ~1/sqrt(T_s), small sources kept whole, and
    * the expected kept-token total is ~`targetTokens` (less whatever the
    * f_s = 1 clamp leaves unused).
    *
    * Shape at scale: ONE tiny aggregate (stratum cardinality is
    * control-plane — the per-stratum totals come back to the driver like
    * k-means centroids), fractions embedded as literal thresholds in the
    * scan filter exactly like [[mixture]] — the corpus itself never
    * shuffles. Z is summed DRIVER-SIDE over the totals sorted by stratum
    * name: float addition is not associative, so a distributed
    * `sum(sqrt(tot))` could return summation-order-dependent ulps across
    * partitionings — the fixed-order sum makes the thresholds
    * run-to-run deterministic. sqrt/division are correctly-rounded
    * IEEE-754 in any engine and the fraction is rounded to 6 decimals
    * (ample ulp headroom vs an independent replay's own summation
    * order) before the integer 32-bit hash-space compare, like
    * [[fracThreshold]]. Rows with a NULL stratum sample at fraction 0
    * (excluded), as under the previous join formulation.
    */
  def temperatureMixture(df: DataFrame, strataCol: String = "source",
                         tokensCol: String = "n_tokens",
                         keyCol: String = "doc_id",
                         targetTokens: Long): DataFrame = {
    require(targetTokens >= 1, "targetTokens must be >= 1")
    // stratum key and total are cast IN THE PLAN, so a non-string
    // stratum column or a non-long token sum can't ClassCastException
    // the driver-side collect
    val totals = df.groupBy(col(strataCol).cast("string").as("__s"))
      .agg(sum(col(tokensCol)).cast("long").as("__tot"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(t => t._1 != null && t._2 > 0L)
      .sortBy(_._1)
    val z = totals.iterator.map(t => math.sqrt(t._2.toDouble)).sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fracCol = totals.foldLeft(lit(null).cast("double")) {
      case (acc, (s, tot)) =>
        val f = r6(math.min(1.0,
          targetTokens.toDouble / (z * math.sqrt(tot.toDouble))))
        when(col(strataCol).cast("string") === s, lit(f)).otherwise(acc)
    }
    // the f = 1.0 clamp keeps a stratum WHOLE: short-circuit it so the
    // maximal hash prefix can't fail `< round(1.0 · (2^32-1))`
    df.withColumn("mix_frac", fracCol)
      .filter(col("mix_frac").isNotNull && (col("mix_frac") >= 1.0 ||
        conv(substring(hashKey(col(keyCol)), 1, 8), 16, 10).cast("long") <
        round(col("mix_frac") * lit(4294967295.0)).cast("long")))
  }

  /** Weighted sampling WITHOUT replacement (the Efraimidis–Spirakis
    * exponential race): row i wins a slot with probability ∝ its weight,
    * by taking the `n` SMALLEST priorities `-ln(u_i)/w_i` where `u_i` is
    * a deterministic uniform draw from the row key. A token-weighted
    * document sample ("pick documents ∝ their token count") is this with
    * `weightCol` = the token count — the selection step of a data-mixing
    * recipe that wants long documents represented by tokens, not by
    * document count ([[tokenBudget]] is the per-stratum exhaustive form;
    * this is the global probabilistic one).
    *
    * Determinism across engines, runs, and partitionings: `u` is the
    * md5 prefix read as a 52-bit integer, `(k+1)/2^52` ∈ (0,1] — a
    * power-of-two divide, so `u` itself is bit-exact anywhere md5 is.
    * The priority is rounded to 9 decimals before comparison (the
    * [[temperatureMixture]] ulp-headroom argument: ln() may differ by an
    * ulp across libm implementations; 9 decimals absorbs it), ties break
    * on the key. The emitted `rankCol` is the selection order — integers
    * only, so the output is hash-comparable across engines.
    *
    * Scale shape: the priority is a pure scan expression and the
    * selection is a global top-n (TakeOrdered — per-partition heaps, no
    * full sort, no shuffle of the corpus); only the `n` winners reach the
    * ranking window, which is control-plane-sized by construction.
    * Rows with NULL or non-positive weight never win a slot, and
    * neither do NULL-key rows (a null key would yield a null priority,
    * which Spark's ascending NULLS-FIRST sort would seat ahead of every
    * weighted row). `keyCol` must be UNIQUE for cross-engine
    * determinism: duplicate keys collapse to identical priorities and
    * selection among them becomes partition-order-dependent.
    */
  def weighted(df: DataFrame, n: Int, weightCol: String, keyCol: String,
               rankCol: String = "rk"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val u = (conv(substring(hashKey(col(keyCol)), 1, 13), 16, 10)
      .cast("long") + 1) / lit(4503599627370496.0) // 2^52
    val top = df.filter(col(keyCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__pr", round(-log(u) / col(weightCol), 9))
      .orderBy(col("__pr").asc, col(keyCol).asc)
      .limit(n)
    // single-partition window over n rows only (the winners) — the
    // corpus never funnels through it
    top.withColumn(rankCol, row_number().over(
        Window.orderBy(col("__pr").asc, col(keyCol).asc)))
      .drop("__pr")
  }

  /** Per-stratum weighted sampling without replacement: [[weighted]]'s
    * exponential race run independently inside every stratum — "n
    * documents per domain, drawn ∝ token count" — with the same
    * deterministic 52-bit md5 uniform, 9-decimal rounding, and key
    * tie-break. Selection is one rank window partitioned by the stratum
    * (the [[stratified]] shuffle shape: the corpus shuffles ONCE on the
    * stratum key; no per-stratum pass, no driver loop); `rankCol` is the
    * within-stratum selection order. Rows with NULL or non-positive
    * weight never win a slot, nor do NULL-key rows ([[weighted]]'s
    * NULLS-FIRST argument); `keyCol` must be unique within a stratum for
    * cross-engine determinism.
    */
  def weightedStratified(df: DataFrame, strataCol: String, n: Int,
                         weightCol: String, keyCol: String,
                         rankCol: String = "rk"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val u = (conv(substring(hashKey(col(keyCol)), 1, 13), 16, 10)
      .cast("long") + 1) / lit(4503599627370496.0) // 2^52
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__pr").asc, col(keyCol).asc)
    df.filter(col(keyCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__pr", round(-log(u) / col(weightCol), 9))
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= n)
      .drop("__pr")
  }

  /** Weighted mixture sampling: keep a per-stratum fraction of rows —
    * the domain-mixing step of a pretraining run (upweight curated
    * sources, downweight crawl), expressed as a pure scan-level filter:
    * each stratum's keep-fraction becomes a hash threshold, the CASE over
    * strata compiles into the scan projection, and NO shuffle or
    * per-stratum pass happens regardless of how many strata there are.
    * Rows whose stratum is not in `weights` keep `defaultFrac`.
    */
  def mixture(df: DataFrame, strataCol: String, weights: Map[String, Double],
              keyCol: String, defaultFrac: Double = 0.0): DataFrame = {
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(
      lit(fracThreshold(defaultFrac))) { case (acc, (stratum, frac)) =>
      when(col(strataCol) === stratum, lit(fracThreshold(frac))).otherwise(acc)
    }
    df.filter(hashKey(col(keyCol)) < threshold)
  }

  /** EPOCH-FACTOR mixing — [[mixture]] generalized past 1.0: each
    * stratum's factor is a REPETITION count (2.5 = every doc twice,
    * half the docs a third time), the data-scheduling shape for
    * upweighting small high-quality sources across a training run
    * (mixture weights above 1 are meaningless as keep-fractions but
    * exact as expected copy counts). Deterministic: the fractional
    * copy goes to docs whose [[hashKey]] uniform lies under the
    * fraction's threshold — the SAME hash-threshold machinery as
    * [[mixture]], so a factor ≤ 1 degenerates to it exactly (epoch 0
    * kept for the selected docs, nothing else). Each copy carries its
    * `epoch` index and a deterministic per-copy `shuffle_key`
    * (md5(key:epoch)) so downstream range-partitioning interleaves
    * copies across the stream instead of replaying a source
    * back-to-back — the consumer orders by the key; no global sort
    * happens here. Scale shape: scan projection + explode, output ∝
    * Σ factor·|stratum|; no shuffle of its own.
    */
  def epochs(df: DataFrame, strataCol: String,
             factors: Map[String, Double], keyCol: String,
             defaultFactor: Double = 0.0): DataFrame = {
    require(factors.values.forall(f => f >= 0.0 && f < 64.0),
      "epoch factors in [0, 64)")
    // the default flows through the same floor/threshold machinery —
    // unvalidated it would replicate every unlisted stratum past the
    // blow-up cap the require above exists for
    require(defaultFactor >= 0.0 && defaultFactor < 64.0,
      "defaultFactor in [0, 64)")
    val whole = factors.toSeq.sortBy(_._1).foldLeft(
      lit(math.floor(defaultFactor).toInt)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(math.floor(f).toInt))
        .otherwise(acc)
    }
    val fracThr = factors.toSeq.sortBy(_._1).foldLeft(
      lit(fracThreshold(defaultFactor - math.floor(defaultFactor)))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit(fracThreshold(f - math.floor(f)))).otherwise(acc)
    }
    df.withColumn("__n", whole +
        when(hashKey(col(keyCol)) < fracThr, 1).otherwise(0))
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0), col("__n") - 1)))
      .withColumn("epoch", col("epoch").cast("int"))
      .withColumn("shuffle_key",
        md5(concat(col(keyCol).cast("string"), lit(":"),
          col("epoch").cast("string"))))
      .drop("__n")
  }
}
