package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.plans.LazyCheckpoint

/** Similarity search over an embedding column (`Array[Float]`) —
  * training-data-pipeline extension (SURVEY §7.1 M5).
  *
  *  - [[bruteForceTopK]] is the exactness baseline: broadcast the (small)
  *    query set, one streaming pass over the corpus, per-query top-k.
  *  - [[lshTopK]] is the scale path: seeded random-hyperplane buckets per
  *    table; candidates come from bucket equi-joins, exact cosine re-ranks
  *    only candidates. At 100 TB the corpus is bucketed once and persisted;
  *    queries touch `tables × bucket` slivers instead of the full corpus.
  *  - [[ivfTopK]] is the IVF variant: deterministic coarse centroids,
  *    cluster assignment once, queries probe the `nprobe` nearest clusters.
  *
  * Vector norms are computed ONCE per row before any join and carried as a
  * column, so each candidate pair costs a single native dot product
  * (`VectorOps.dot`, codegen) instead of three interpreted HOF reductions.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Queries df: (q_id, q_vec); corpus df: (`idCol`, `vecCol`).
    * Output: (q_id, neighbor_id, sim, rank) with rank 1..k.
    *
    * The corpus side never shuffles at full width: scoring happens in the
    * scan pass, and only (q_id, id, sim) triples — not vectors — enter the
    * per-query top-k exchange.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.withColumn("__cn", VectorOps.norm(col(vecCol)))
    val q = queries.withColumn("__qn", VectorOps.norm(col("q_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("neighbor_id"),
        (VectorOps.dot(col(vecCol), col("q_vec")) / (col("__cn") * col("__qn"))).as("sim"))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `tables` tables × `bits` planes. */
  def hyperplanes(dim: Int, tables: Int, bits: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Bit width targeting ~`perBucket` vectors per bucket: log2(n/perBucket),
    * clamped to [2, 20]. `bits <= 0` in the LSH entry points selects this —
    * the knob that keeps bucket occupancy (and thus recall vs. candidate
    * cost) stable from 10^2 test rows to 10^10 corpus rows.
    */
  def autoBits(n: Long, perBucket: Int = 16): Int =
    math.max(2, math.min(20,
      (math.log(math.max(1.0, n.toDouble / perBucket)) / math.log(2.0)).round.toInt))

  /** (id, vec, norm, t, bkt): one row per (vector, table) — all tables'
    * buckets come from ONE `HyperplaneBucketsExpr` pass, then posexplode.
    */
  private def bucketed(df: DataFrame, id: String, vec: String,
                       planes: Seq[Seq[Array[Double]]]): DataFrame =
    df.select(col(id), col(vec), VectorOps.norm(col(vec)).as("__n"),
        posexplode(VectorOps.hyperplaneBuckets(col(vec), planes)).as(Seq("t", "bkt")))

  /** ANN via multi-table hyperplane LSH, exact cosine re-rank on candidates.
    * Approximate: recall measured against [[bruteForceTopK]] in tests and
    * gated by the oracled `sim_ann_lsh` recall query.
    * `bits <= 0` → [[autoBits]] from the corpus count (one cheap count job).
    *
    * `multiprobe = true` additionally probes, per table, every bucket at
    * Hamming distance 1 from the query's bucket — the standard recall
    * rescue at scale: as the corpus grows, autoBits adds bits and the
    * probability that ALL bits agree for a true neighbor decays
    * geometrically; allowing one flipped bit recovers most of it. The
    * probe fan-out lives ONLY on the (small, broadcast) query side —
    * `queries × tables × (bits+1)` rows — while the corpus keeps exactly
    * one bucket per (vector, table).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              tables: Int = 16, bits: Int = -1, seed: Long = 42L,
              multiprobe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nBits = if (bits > 0) bits else autoBits(corpus.count())
    val planes = hyperplanes(dim, tables, nBits, seed)
    val corpusB = bucketed(corpus, idCol, vecCol, planes)
    val queryB0 = bucketed(queries, "q_id", "q_vec", planes)
      .withColumnRenamed("__n", "__qn")
    val queryB =
      if (!multiprobe) queryB0
      else queryB0.select(col("q_id"), col("q_vec"), col("__qn"), col("t"),
        explode(array(col("bkt") +:
          (0 until nBits).map(b => col("bkt").bitwiseXOR(lit(1L << b))): _*))
          .as("bkt"))
    // candidate generation and dedup run on NARROW (q_id, id) pairs —
    // deduping rows that still carry both vectors would push
    // full-width rows (vectors + norms, multiplied by the multiprobe
    // fan-out) through the exchange, the exact shuffle-volume lesson
    // [[lshNearDupPairs]] records; the vectors join back ONCE per
    // surviving candidate
    val candIds = corpusB.select(col(idCol), col("t"), col("bkt"))
      .join(broadcast(queryB.select(col("q_id"), col("t"), col("bkt"))),
        Seq("t", "bkt"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol))
      .dropDuplicates("q_id", idCol)
    val corpusVecs = corpus.select(col(idCol), col(vecCol),
      VectorOps.norm(col(vecCol)).as("__n"))
    val queryVecs = queries.select(col("q_id"), col("q_vec"),
      VectorOps.norm(col("q_vec")).as("__qn"))
    val scored = candIds
      .join(corpusVecs, Seq(idCol))
      .join(broadcast(queryVecs), Seq("q_id"))
      .select(col("q_id"), col(idCol).as("neighbor_id"),
        (VectorOps.dot(col(vecCol), col("q_vec")) /
          (col("__n") * col("__qn"))).as("sim"))
    topK(scored, k)
  }

  /** Deterministic Lloyd refinement, centroids on the driver: seeds are
    * the first `nCentroids` vectors by id — or, with
    * `seedByHash = true`, the first `nCentroids` in HASH order of the
    * id (same TakeOrdered cost). Hash seeding exists for RE-fits over a
    * store's live rows ([[graft.operators.AnnIndex.retrain]]): there id
    * order IS arrival order — "old corpus, then drifted ingest" — so
    * first-k-by-id would seed every centroid inside the oldest region
    * and Lloyd's few iterations could never split a later distribution
    * shift; hash order spreads the seeds uniformly over the corpus
    * whatever its id layout, still deterministically. Cold builds keep
    * id-order seeding (no arrival bias to correct, and the in-memory
    * query operators share it, so store-probe ≡ in-memory equalities
    * hold by construction). Each iteration assigns rows via
    * the native [[graft.functions.NearestCentroidsExpr]] argmax (a pure
    * map over the scan — no crossJoin against a centroid table, no
    * row_number window over rows × centroids) and the new means come back
    * as ONE (cluster, pos) aggregate of nCentroids × dim rows. Centroid
    * sets are control-plane-sized (even 10⁴ × 64 dims = 5 MB), so the
    * driver round-trip is the scale-correct home for them.
    */
  def collectCentroids(corpus: DataFrame, nCentroids: Int, iters: Int,
                       idCol: String, vecCol: String,
                       sample: Double = 1.0,
                       seedByHash: Boolean = false,
                       seedsOpt: Option[Array[Array[Double]]] = None)
      : Array[Array[Double]] = {
    // At corpus scale Lloyd trains on a deterministic sample (centroid
    // quality needs ~100×nCentroids points, not 10^10); sample = 1.0 keeps
    // the small-SF oracles exact.
    val train =
      if (sample >= 1.0) corpus
      else corpus.sample(withReplacement = false, sample, seed = 42L)
    // seedsOpt: the caller already holds the first nCentroids vectors in
    // the seed order (e.g. [[graft.operators.AnnIndex.build]]'s fused
    // seed+PQ-sample TakeOrdered) — skip the seed job. Never mutated in
    // place (each Lloyd step clones before writing), so aliasing a
    // caller-held sample is safe.
    var cents: Array[Array[Double]] = seedsOpt.getOrElse {
      val seedOrder =
        if (seedByHash) Seq(xxhash64(col(idCol)), col(idCol))
        else Seq(col(idCol))
      train.orderBy(seedOrder: _*).limit(nCentroids)
        .select(col(vecCol).cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
    }
    for (_ <- 0 until iters) {
      val assign = VectorOps.nearestCentroids(col(vecCol), cents.toSeq)
        .getItem(0).as("c_id")
      // assign in its OWN projection below the explode: inlined into the
      // generate's select list it would be re-evaluated per exploded
      // element (×dim) — measured 64× the assignment cost. LAZY barrier:
      // the single consumer (the means aggregate) materializes it inside
      // its own job — an eager checkpoint here cost one extra blocking
      // job per Lloyd iteration
      val assigned = LazyCheckpoint.shared(train
        .select(assign, col(vecCol).cast("array<double>").as("__v")))
      val means = assigned
        .select(col("c_id"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy("c_id", "pos").agg(avg("x").as("m"))
        .collect()
      val next = cents.map(_.clone) // empty clusters keep their centroid
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
    }
    cents
  }

  /** Driver-side cosine k-means over the fine centroids themselves → the
    * coarse routing level of two-level IVF. Pure local math
    * (nFine × nCoarse × dim flops per iteration); deterministic seeds
    * spread over the fine index range. Returns (coarse centroids, fine
    * member ids per coarse group).
    */
  def coarsen(fine: Array[Array[Double]], nCoarse: Int,
              iters: Int = 5): (Array[Array[Double]], Array[Array[Int]]) = {
    val n = fine.length
    val m = math.max(1, math.min(nCoarse, n))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val len = math.min(a.length, b.length)
      while (i < len) { s += a(i) * b(i); i += 1 }
      s
    }
    var coarse = Array.tabulate(m)(i => fine(math.min(i * n / m, n - 1)).clone())
    val assign = new Array[Int](n)
    def assignAll(): Unit = {
      val norms = coarse.map(c => math.sqrt(dot(c, c)))
      var i = 0
      while (i < n) {
        var best = 0; var bestS = Double.NegativeInfinity
        var c = 0
        while (c < coarse.length) {
          val s = if (norms(c) == 0) 0.0 else dot(fine(i), coarse(c)) / norms(c)
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
    }
    for (_ <- 0 until iters) {
      assignAll()
      val dims = fine.head.length
      val sums = Array.fill(coarse.length)(new Array[Double](dims))
      val counts = new Array[Int](coarse.length)
      var i = 0
      while (i < n) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < dims) { sums(c)(j) += fine(i)(j); j += 1 }
        i += 1
      }
      coarse = coarse.indices.map { c =>
        if (counts(c) == 0) coarse(c) else sums(c).map(_ / counts(c))
      }.toArray
    }
    assignAll()
    val members = Array.fill(coarse.length)(Array.newBuilder[Int])
    assign.zipWithIndex.foreach { case (c, i) => members(c) += i }
    (coarse, members.map(_.result()))
  }

  /** IVF-style ANN: Lloyd-refined coarse quantization of the corpus, then
    * probe the `nprobe` closest clusters per query. Routing is the native
    * per-row expression; above `twoLevelThreshold` fine centroids it goes
    * TWO-LEVEL — √n coarse routing centroids over √n-sized groups, so
    * per-row assignment cost stays O(√nCentroids) and nCentroids can reach
    * 10³⁺ without the all-centroid scoring blowup.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4, kmeansIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              twoLevelThreshold: Int = 64, coarseProbes: Int = 2): DataFrame = {
    val fine = collectCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
    val (coarse, members): (Seq[Array[Double]], Seq[Seq[Int]]) =
      if (fine.length > twoLevelThreshold) {
        val (c, mm) = coarsen(fine, math.round(math.sqrt(fine.length)).toInt)
        (c.toSeq, mm.map(_.toSeq).toSeq)
      } else (Nil, Nil)
    def route(vecC: Column, kk: Int) =
      VectorOps.nearestCentroids(vecC, fine.toSeq, coarse, members, kk, coarseProbes)
    val corpusA = corpus.withColumn("__n", VectorOps.norm(col(vecCol)))
      .withColumn("c_id", route(col(vecCol), 1).getItem(0))
    val queryA = queries.withColumn("__qn", VectorOps.norm(col("q_vec")))
      .select(col("q_id"), col("q_vec"), col("__qn"),
        explode(route(col("q_vec"), nprobe)).as("c_id"))
    val scored = corpusA.join(broadcast(queryA), Seq("c_id"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("neighbor_id"),
        (VectorOps.dot(col(vecCol), col("q_vec")) / (col("__n") * col("__qn"))).as("sim"))
      .dropDuplicates("q_id", "neighbor_id")
    topK(scored, k)
  }

  /** Per-subspace product-quantization codebooks trained driver-side on a
    * deterministic corpus sample (first `sampleN` rows by id): the input
    * dimension splits into `m` contiguous sub-vectors; each subspace gets a
    * k-codeword Lloyd (L2) codebook. PQ codebooks are control-plane data —
    * m × k × (dim/m) doubles regardless of corpus size — and train on a
    * bounded sample exactly like the IVF centroids ([[collectCentroids]]'s
    * `sample` knob): quality needs ~100×k points per subspace, not 10^10.
    * Seeds are evenly spaced over the sample (deterministic); empty
    * clusters keep their codeword.
    */
  /** The deterministic PQ training-sample bound: the first `PqSampleN`
    * rows by id. Shared with [[graft.operators.AnnIndex.build]]'s fused
    * seed+sample collect so the two can never disagree.
    */
  val PqSampleN: Int = 4096

  def trainPqCodebooks(corpus: DataFrame, m: Int, k: Int, iters: Int = 8,
                       sampleN: Int = PqSampleN,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Seq[Seq[Array[Double]]] = {
    val sample: Array[Array[Double]] = corpus.orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    trainPqCodebooksOn(sample, m, k, iters)
  }

  /** [[trainPqCodebooks]] on an ALREADY-collected ordered sample — lets
    * a caller holding the first-`sampleN`-by-id rows (the fused
    * seed+PQ-sample TakeOrdered in [[graft.operators.AnnIndex.build]])
    * train without a second collect job. Same loop, verbatim.
    */
  def trainPqCodebooksOn(sample: Array[Array[Double]], m: Int, k: Int,
                         iters: Int = 8): Seq[Seq[Array[Double]]] = {
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"PQ subspace count $m must divide dim $dim")
    val dsub = dim / m
    val n = sample.length
    (0 until m).map { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val kk = math.min(k, n)
      var cents = Array.tabulate(kk)(c => sub(c * n / kk).clone())
      val assign = new Array[Int](n)
      for (_ <- 0 until iters) {
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < kk) {
            var d = 0.0; var t = 0
            while (t < dsub) {
              val diff = sub(i)(t) - cents(c)(t); d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assign(i) = best
          i += 1
        }
        val sums = Array.fill(kk)(new Array[Double](dsub))
        val counts = new Array[Int](kk)
        i = 0
        while (i < n) {
          val c = assign(i); counts(c) += 1
          var t = 0
          while (t < dsub) { sums(c)(t) += sub(i)(t); t += 1 }
          i += 1
        }
        cents = Array.tabulate(kk)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents.toSeq
    }
  }

  /** IVF-PQ ANN: IVF coarse routing confines candidates to `nprobe`
    * clusters, and candidate scoring runs over `m`-byte PQ codes via an
    * ADC lookup table instead of full vectors — the corpus representation
    * that enters the candidate join is (id, cluster, codes, norm): ~16
    * bytes + m for a 64-dim float vector (256 bytes raw). The ADC
    * shortlist (`rerank × k` per query) is then re-ranked with exact
    * cosine, touching true vectors only for shortlist rows.
    *
    * 100 TB shape: codes/norms are computed once at ingest (a pure scan
    * expression) and are what a persisted ANN index stores; queries
    * broadcast their LUT (m × k doubles each); the only full-width vector
    * access is the final shortlist join. Approximate — gated by the
    * oracled `sim_ann_ivf_pq` recall query like the LSH/IVF variants.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 16, nprobe: Int = 4, kmeansIters: Int = 2,
                m: Int = 16, codebookK: Int = 32, rerank: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding",
                twoLevelThreshold: Int = 64, coarseProbes: Int = 2): DataFrame = {
    val fine = collectCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
    val (coarse, members): (Seq[Array[Double]], Seq[Seq[Int]]) =
      if (fine.length > twoLevelThreshold) {
        val (c, mm) = coarsen(fine, math.round(math.sqrt(fine.length)).toInt)
        (c.toSeq, mm.map(_.toSeq).toSeq)
      } else (Nil, Nil)
    val codebooks = trainPqCodebooks(corpus, m, codebookK,
      idCol = idCol, vecCol = vecCol)
    def route(vecC: Column, kk: Int) =
      VectorOps.nearestCentroids(vecC, fine.toSeq, coarse, members, kk, coarseProbes)
    // the stored index rows: no vectors — codes + norm only
    val corpusCodes = corpus.select(col(idCol),
      route(col(vecCol), 1).getItem(0).as("c_id"),
      VectorOps.pqEncode(col(vecCol), codebooks).as("__codes"),
      VectorOps.norm(col(vecCol)).as("__n"))
    val queryA = queries.select(col("q_id"), col("q_vec"),
      VectorOps.norm(col("q_vec")).as("__qn"),
      VectorOps.pqLut(col("q_vec"), codebooks).as("__lut"),
      explode(route(col("q_vec"), nprobe)).as("c_id"))
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__v"), VectorOps.norm(col(vecCol)).as("__vn"))
    pqScore(corpusCodes, vecs, queryA, k, rerank, idCol)
  }

  /** IVF-PQ with RESIDUAL encoding — the Faiss-IVFPQ refinement of
    * [[ivfPqTopK]]: PQ codes quantize `v - c(v)` (the vector MINUS its
    * routing centroid) instead of `v` itself. Residuals span only the
    * within-cluster spread, so the same m×k codebook budget spends its
    * codewords on a far smaller ball — ADC error shrinks and the
    * shortlist recall rises at IDENTICAL probe cost (same codes bytes,
    * same LUT size, same candidate join).
    *
    * Scoring stays a plain-LUT ADC because the inner product decomposes
    * exactly: `q·v = q·c(v) + q·(v − c(v))` — the first term is a
    * per-probe scalar against the probed cluster's centroid (a literal;
    * nprobe dots per query, control-plane cheap), the second is the
    * standard ADC estimate with codebooks trained on residuals. No
    * per-cluster LUT rebuild (the L2-metric formulation would need one —
    * cosine/IP does not).
    *
    * Residual codebooks train on the residual frame (a pure expression
    * over the corpus: routed centroid subtracted element-wise), sampled
    * exactly like [[trainPqCodebooks]] always samples. Gated by the
    * oracled `sim_ann_residual` recall query; the spec plants clustered
    * data where plain PQ provably cannot follow (cluster offsets exceed
    * the codebook budget) and residual PQ must.
    */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        nCentroids: Int = 16, nprobe: Int = 4,
                        kmeansIters: Int = 2, m: Int = 16,
                        codebookK: Int = 32, rerank: Int = 16,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        twoLevelThreshold: Int = 64,
                        coarseProbes: Int = 2): DataFrame = {
    val fine = collectCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
    val (coarse, members): (Seq[Array[Double]], Seq[Seq[Int]]) =
      if (fine.length > twoLevelThreshold) {
        val (c, mm) = coarsen(fine, math.round(math.sqrt(fine.length)).toInt)
        (c.toSeq, mm.map(_.toSeq).toSeq)
      } else (Nil, Nil)
    val centsLit = typedlit(fine.map(_.toSeq).toSeq)
    def route(vecC: Column, kk: Int) =
      VectorOps.nearestCentroids(vecC, fine.toSeq, coarse, members, kk, coarseProbes)
    def residual(v: Column, cId: Column): Column =
      zip_with(v.cast("array<double>"), element_at(centsLit, cId + 1),
        (a, b) => a - b)
    val residFrame = corpus.select(col(idCol),
      residual(col(vecCol), route(col(vecCol), 1).getItem(0)).as(vecCol))
    val codebooks = trainPqCodebooks(residFrame, m, codebookK,
      idCol = idCol, vecCol = vecCol)
    val corpusCodes = corpus
      .withColumn("c_id", route(col(vecCol), 1).getItem(0))
      .select(col(idCol), col("c_id"),
        VectorOps.pqEncode(residual(col(vecCol), col("c_id")), codebooks)
          .as("__codes"),
        VectorOps.norm(col(vecCol)).as("__n"))
    val queryA = queries.select(col("q_id"), col("q_vec"),
        VectorOps.norm(col("q_vec")).as("__qn"),
        VectorOps.pqLut(col("q_vec"), codebooks).as("__lut"),
        explode(route(col("q_vec"), nprobe)).as("c_id"))
      // q·c(v) for the probed cluster — the exact part of the split dot
      .withColumn("__bias",
        VectorOps.dot(col("q_vec"), element_at(centsLit, col("c_id") + 1)))
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__v"), VectorOps.norm(col(vecCol)).as("__vn"))
    pqScore(corpusCodes, vecs, queryA, k, rerank, idCol,
      biasCol = Some("__bias"))
  }

  /** The probe half of IVF-PQ — ADC scoring over codes, per-query
    * shortlist, exact cosine re-rank — shared verbatim by [[ivfPqTopK]]
    * (in-memory build), [[ivfPqResidualTopK]] (residual codes: the ADC
    * estimate gains the exact `q·c` bias term from `biasCol`), and
    * [[AnnIndex.probe]] (persisted build), so build-once/probe-many
    * cannot drift from the in-query-trained form.
    * `corpusCodes`: (idCol, c_id, __codes, __n) — codes only, no vectors;
    * `vecs`: (neighbor_id, __v, __vn) — touched only for shortlist rows;
    * `queryA`: (q_id, q_vec, __qn, __lut, c_id) — one row per probe.
    *
    * `broadcastQ` picks the join strategy for the query side. `true` (the
    * interactive probe: a handful of queries against a huge codes table)
    * broadcasts queries and the shortlist — the codes scan never shuffles.
    * `false` is the BATCH shape (a corpus-scale query set, e.g. a whole
    * ingest batch deduplicating against the store): queries and codes
    * equi-join on `c_id` through the shuffle, and the shortlist joins the
    * vector side by key — nothing corpus-sized is ever broadcast.
    */
  private[operators] def pqScore(corpusCodes: DataFrame, vecs: DataFrame,
                                 queryA: DataFrame, k: Int, rerank: Int,
                                 idCol: String,
                                 biasCol: Option[String] = None,
                                 broadcastQ: Boolean = true): DataFrame = {
    val adcDot = VectorOps.pqAdcDot(col("__codes"), col("__lut"))
    val approxDot = biasCol.map(b => col(b) + adcDot).getOrElse(adcDot)
    val qSide = if (broadcastQ) broadcast(queryA) else queryA
    // each corpus row lives in exactly one cluster, so a (q, id) candidate
    // appears at most once — no dedup needed before the shortlist window
    val adc = corpusCodes.join(qSide, Seq("c_id"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col("q_vec"), col("__qn"),
        col(idCol).as("neighbor_id"),
        (approxDot / (col("__n") * col("__qn"))).as("sim_adc"))
    val wAdc = Window.partitionBy("q_id")
      .orderBy(col("sim_adc").desc, col("neighbor_id").asc)
    val shortlistRaw = adc.withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= k * rerank)
      .select("q_id", "q_vec", "__qn", "neighbor_id")
    val shortlist = if (broadcastQ) broadcast(shortlistRaw) else shortlistRaw
    // exact re-rank: true vectors touched only for shortlist rows
    val scored = vecs.join(shortlist, Seq("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        (VectorOps.dot(col("__v"), col("q_vec")) /
          (col("__vn") * col("__qn"))).as("sim"))
    topK(scored, k)
  }

  /** Exact embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * O(n²) by construction — the correctness anchor for the LSH variant
    * [[lshNearDupPairs]]; run it on samples, not the full corpus.
    */
  def nearDupPairsExact(corpus: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val n = VectorOps.norm(col(vecCol))
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"), n.as("n_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"), n.as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (VectorOps.dot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding near-dup pairs via LSH bucketing (pairs only form inside a
    * bucket) — the 100 TB shape of [[nearDupPairsExact]].
    */
  def lshNearDupPairs(corpus: DataFrame, threshold: Double, dim: Int,
                      tables: Int = 16, bits: Int = -1, seed: Long = 42L,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nBits = if (bits > 0) bits else autoBits(corpus.count())
    val planes = hyperplanes(dim, tables, nBits, seed)
    // Candidate generation carries IDS ONLY through the bucket self-join:
    // a pair colliding in several tables is deduped BEFORE any cosine is
    // computed, and the bucket shuffle moves ~20-byte rows instead of
    // full vectors. (Scoring first and deduping after paid one dot
    // product per bucket collision — measured >10× the distinct-pair
    // count on a 16-table setup.) Both the bucket table and the vector
    // side are lazily checkpointed: each is computed once even though the
    // self-join / two-sided scoring join consume them twice.
    val bk = LazyCheckpoint.shared(corpus.select(col(idCol).as("id"),
      posexplode(VectorOps.hyperplaneBuckets(col(vecCol), planes)).as(Seq("t", "bkt"))))
    val pairs = bk.as("a").join(bk.as("b"),
        col("a.t") === col("b.t") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val vecs = LazyCheckpoint.shared(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorOps.norm(col(vecCol)).as("nrm")))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("n_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (VectorOps.dot(col("vec_a"), col("vec_b")) /
          (col("n_a") * col("n_b"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Cluster-confined semantic near-dup pairs (the SemDeDup shape):
    * k-means coarse clusters over the embedding space, then pairwise
    * cosine ONLY inside a cluster — the pair count drops from O(n²) to
    * Σ|cluster|², and each cluster's self-join is an equi-join on the
    * cluster id. `probes > 1` assigns each vector to its `probes` nearest
    * centroids (explode before the self-join), trading Σ|cluster|²×probes²
    * candidate work for boundary-pair recall — the same remedy IVF uses
    * for quantization loss on the query path.
    *
    * 100 TB shape: centroid set is driver-resident control-plane data
    * (see [[collectCentroids]]), assignment is a pure scan expression, and
    * the only shuffle is the cluster-keyed self-join; a degenerate cluster
    * (embedding-space skew) is the one hazard — Σ|cluster|² explodes on one
    * hot cluster. `maxCluster` drops assignments in clusters above the cap
    * (the same window-count guard as the MinHash path's `maxBucket`,
    * [[Dedup.minhashLshIncremental]]); the right centroid count
    * (√n keeps E|cluster| = √n) makes the cap a no-op on benign data.
    */
  def semanticNearDupPairs(corpus: DataFrame, threshold: Double,
                           nCentroids: Int = 16, kmeansIters: Int = 2,
                           probes: Int = 2, maxCluster: Int = 100000,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
    // ids-only through the cluster self-join (≤8-byte keys, not vectors);
    // multi-probe collisions dedup BEFORE any cosine — same shape as
    // [[lshNearDupPairs]], where scoring-then-deduping measured >10× the
    // distinct-pair cost
    val assignedAll = corpus.select(col(idCol).as("id"),
        explode(VectorOps.nearestCentroids(col(vecCol), cents.toSeq,
          k = probes)).as("c_id"))
    val assigned = LazyCheckpoint.shared(assignedAll.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("c_id")))
      .filter(col("__n") <= maxCluster)
      .drop("__n"))
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val vecs = LazyCheckpoint.shared(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorOps.norm(col(vecCol)).as("nrm")))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("n_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (VectorOps.dot(col("vec_a"), col("vec_b")) /
          (col("n_a") * col("n_b"))).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
