package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

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
    val cands = corpusB.join(broadcast(queryB), Seq("t", "bkt"))
      .filter(col(idCol) =!= col("q_id"))
      .dropDuplicates("q_id", idCol)
    val scored = cands.select(col("q_id"), col(idCol).as("neighbor_id"),
      (VectorOps.dot(col(vecCol), col("q_vec")) / (col("__n") * col("__qn"))).as("sim"))
    topK(scored, k)
  }

  /** Deterministic Lloyd refinement: start from the first `nCentroids`
    * vectors by id, then `iters` rounds of assign-to-nearest + elementwise
    * mean. The mean is a posexplode + (cluster, pos) average — map-side
    * partial aggregation, so each round shuffles nCentroids × dim doubles,
    * not the corpus. Centroids stay a driver-broadcastable DataFrame.
    */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int, iters: Int,
                      idCol: String, vecCol: String): DataFrame = {
    var cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("c_id"), col(vecCol).cast("array<double>").as("c_vec"))
    for (_ <- 0 until iters) {
      val withN = cents.select(col("c_id"), col("c_vec"),
        VectorOps.norm(col("c_vec")).as("c_n"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("c_sim").desc, col("c_id").asc)
      val assigned = corpus
        .withColumn("__n", VectorOps.norm(col(vecCol)))
        .crossJoin(broadcast(withN))
        .withColumn("c_sim",
          VectorOps.dot(col(vecCol), col("c_vec")) / (col("__n") * col("c_n")))
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") === 1)
        .select(col("c_id"), col(vecCol).cast("array<double>").as("v"))
      cents = assigned
        .select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c_id", "pos").agg(avg("x").as("m"))
        .groupBy("c_id").agg(
          array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("c_id"),
          expr("transform(pm, p -> p.m)").as("c_vec"))
      cents = cents.localCheckpoint() // truncate the per-iteration lineage
    }
    cents
  }

  /** IVF-style ANN: coarse-quantize the corpus to `nCentroids` centroids
    * (Lloyd-refined from a deterministic seed, [[kmeansCentroids]]), then
    * probe the `nprobe` closest clusters per query.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 4, kmeansIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = kmeansCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
      .select(col("c_id"), col("c_vec"), VectorOps.norm(col("c_vec")).as("c_n"))
    def assign(df: DataFrame, id: String, vec: String, nc: String, keep: Int) = {
      val w = Window.partitionBy(col(id)).orderBy(col("c_sim").desc, col("c_id").asc)
      df.crossJoin(broadcast(centroids))
        .withColumn("c_sim",
          VectorOps.dot(col(vec), col("c_vec")) / (col(nc) * col("c_n")))
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= keep)
        .drop("c_vec", "c_sim", "c_rank", "c_n")
    }
    val corpusA = assign(corpus.withColumn("__n", VectorOps.norm(col(vecCol))),
      idCol, vecCol, "__n", 1)
    val queryA = assign(queries.withColumn("__qn", VectorOps.norm(col("q_vec"))),
      "q_id", "q_vec", "__qn", nprobe)
    val scored = corpusA.join(broadcast(queryA), Seq("c_id"))
      .filter(col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).as("neighbor_id"),
        (VectorOps.dot(col(vecCol), col("q_vec")) / (col("__n") * col("__qn"))).as("sim"))
      .dropDuplicates("q_id", "neighbor_id")
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
    val bk = bucketed(corpus, idCol, vecCol, planes)
      .withColumnRenamed(idCol, "id").withColumnRenamed(vecCol, "vec")
    val a = bk.as("a"); val b = bk.as("b")
    a.join(b, col("a.t") === col("b.t") && col("a.bkt") === col("b.bkt") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (VectorOps.dot(col("a.vec"), col("b.vec")) /
          (col("a.__n") * col("b.__n"))).as("sim"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("sim") >= threshold)
  }
}
