package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** M5 similarity search: brute-force exactness on hand-built vectors,
  * LSH/IVF recall against the brute-force baseline on real embeddings.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK: exact neighbors and ranks on known geometry") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val out = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L), (3L, 2L), (4L, 3L))) // cos: .994, 0, -1
  }

  test("lshTopK recall >= 0.6 vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    val approx = pairs(Similarity.lshTopK(emb, queries, k = 5, dim = 64))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("ivfTopK recall >= 0.6 vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("ivfTopK returns k ranked neighbors per query, sims descending") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val out = Similarity.ivfTopK(emb, queries, k = 5)
      .select("q_id", "rank", "sim").as[(Long, Long, Double)].collect()
    assert(out.groupBy(_._1).forall(_._2.length == 5))
    out.groupBy(_._1).values.foreach { rows =>
      val sims = rows.sortBy(_._2).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("two-level IVF at nCentroids=256 keeps recall >= 0.6") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    // 256 > twoLevelThreshold → coarse-then-fine routing; wider nprobe
    // because clusters are tiny at this corpus/centroid ratio
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5,
      nCentroids = 256, nprobe = 32, coarseProbes = 4))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"two-level IVF recall $recall too low")
  }

  test("nearestCentroids two-level probing all groups == flat scan") {
    val r = new scala.util.Random(7)
    val fine = Array.fill(32)(Array.fill(8)(r.nextGaussian()))
    val (coarse, members) = Similarity.coarsen(fine, 6)
    assert(members.map(_.length).sum == 32)
    val vecs = Seq.fill(50)(Array.fill(8)(r.nextGaussian().toFloat))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val flat = df.select(col("id"),
      graft.functions.VectorOps.nearestCentroids(col("v"), fine.toSeq, k = 3).as("n"))
      .as[(Long, Seq[Int])].collect().toMap
    val twoAll = df.select(col("id"),
      graft.functions.VectorOps.nearestCentroids(col("v"), fine.toSeq,
        coarse.toSeq, members.map(_.toSeq).toSeq, k = 3,
        coarseProbes = coarse.length).as("n"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(flat == twoAll) // probing every group must equal the flat scan
  }

  test("PQ codes: m bytes in [0,k), deterministic across evaluations") {
    val emb = Tables.embeddings(spark, sf())
    val cb = Similarity.trainPqCodebooks(emb, m = 8, k = 16)
    assert(cb.length == 8 && cb.forall(_.length == 16) &&
      cb.forall(_.forall(_.length == 8)))
    val codes = emb.select(col("vec_id"),
        graft.functions.VectorOps.pqEncode(col("embedding"), cb).as("c"))
      .as[(Long, Seq[Byte])].collect()
    assert(codes.forall(_._2.length == 8))
    assert(codes.forall(_._2.forall(b => b >= 0 && b < 16)))
    val again = emb.select(col("vec_id"),
        graft.functions.VectorOps.pqEncode(col("embedding"), cb).as("c"))
      .as[(Long, Seq[Byte])].collect()
    assert(codes.toMap == again.toMap)
  }

  test("ADC dot == dot(query, PQ reconstruction) for every corpus row") {
    val emb = Tables.embeddings(spark, sf()).limit(100)
    val cb = Similarity.trainPqCodebooks(emb, m = 8, k = 16)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val rows = emb.select(col("vec_id"),
        graft.functions.VectorOps.pqEncode(col("embedding"), cb).as("codes"))
      .as[(Long, Seq[Byte])].collect()
    val lutDf = emb.filter(col("vec_id") === 0)
      .select(graft.functions.VectorOps.pqLut(col("embedding"), cb).as("lut"))
    val lut = lutDf.as[Seq[Double]].head()
    val adc = emb.select(col("vec_id"),
        graft.functions.VectorOps.pqAdcDot(
          graft.functions.VectorOps.pqEncode(col("embedding"), cb),
          typedLit(lut)).as("s"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, codes) =>
      // reconstruct = concat of codewords; dot vs ADC differs only in
      // floating summation grouping (per-subspace partials) → tight tol
      val recon = codes.zipWithIndex.flatMap { case (c, j) => cb(j)(c) }
      val exact = recon.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(adc(id) - exact) <= 1e-9 * math.max(1.0, math.abs(exact)),
        s"ADC mismatch for $id: ${adc(id)} vs $exact")
    }
  }

  test("two pq_adc_dot instances coexist in one codegen stage " +
      "(fresh locals, no Janino collision)") {
    import graft.functions.VectorOps
    // AQE wraps the plan in AdaptiveSparkPlanExec, whose codegen stages
    // only exist per executed stage — turn it off so codegenString sees
    // the WholeStageCodegen subtree directly
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // codebooks whose codewords ARE the test vectors' subvectors, so the
    // ADC dot is the exact dot and the expected values are hand-checkable
    val cb = Seq(
      Seq(Array(1.0, 2.0), Array(0.5, 0.5)),
      Seq(Array(3.0, 4.0), Array(1.0, 0.0)))
    // repartition keeps ConvertToLocalRelation from constant-folding the
    // whole 1-row plan away — the projection must actually reach codegen
    val df = Seq((Array(1.0f, 2.0f, 3.0f, 4.0f),
      Array(0.5f, 0.5f, 1.0f, 0.0f))).toDF("a", "b").repartition(1)
    // cache the codes/lut frame: CollapseProject would otherwise fold the
    // CodegenFallback encode/lut expressions into the ADC projection and
    // disable whole-stage codegen for the operator — the production plans
    // (Similarity.ivfPqTopK) likewise feed pq_adc_dot from materialized
    // columns
    val enc = df.select(
      VectorOps.pqEncode(col("a"), cb).as("ca"),
      VectorOps.pqEncode(col("b"), cb).as("cbb"),
      VectorOps.pqLut(col("a"), cb).as("lut")).cache()
    enc.count()
    val out = enc.select(
      VectorOps.pqAdcDot(col("ca"), col("lut")).as("aa"),
      VectorOps.pqAdcDot(col("cbb"), col("lut")).as("ba"))
    // dot(a,a) = 30, dot(a,b) = 4.5 — both must be right with the two
    // expressions generated into the SAME function
    assert(out.as[(Double, Double)].head() == ((30.0, 4.5)))
    // and the generated source declares DISTINCT fresh locals per
    // instance — fixed names would collide, fail Janino compilation and
    // silently drop the stage to interpreted execution
    val src = org.apache.spark.sql.execution.debug.codegenString(
      out.queryExecution.executedPlan)
    val names = "adcM_\\d+".r.findAllIn(src).toSet
    assert(names.size >= 2,
      s"expected >= 2 distinct adcM locals, got $names in:\n$src")
    // same hazard for vec_dot: ONE cosine column inlines THREE
    // DotProductExpr instances (dot(a,b), dot(a,a), dot(b,b)) into one
    // projection — fixed locals would collide there too
    val cosOut = enc2cols(df)
    // cos(a,b) = 4.5 / sqrt(30 * 1.5)
    assert(math.abs(cosOut.as[(Double, Double)].head()._1 -
      4.5 / math.sqrt(45.0)) < 1e-12)
    val cosSrc = org.apache.spark.sql.execution.debug.codegenString(
      cosOut.queryExecution.executedPlan)
    val vdNames = "vdN_\\d+".r.findAllIn(cosSrc).toSet
    assert(vdNames.size >= 3,
      s"expected >= 3 distinct vdN locals, got $vdNames")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def enc2cols(df: org.apache.spark.sql.DataFrame) =
    df.select(
      // three DISTINCT dots (a·b, a·a, b·b) — equal subtrees would be
      // merged by subexpression elimination and not stress the locals
      graft.functions.VectorOps.cosine(col("a"), col("b")).as("cab"),
      graft.functions.VectorOps.dot(col("a"), col("b")).as("dab"))

  test("pq_lut / pq_encode reject wrong child types at analysis time " +
      "and malformed codebooks at construction") {
    import graft.functions.VectorOps
    val cb = Seq(Seq(Array(1.0, 2.0)))
    val df = Seq("nope").toDF("s")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorOps.pqLut(col("s"), cb)).collect()
    }
    assert(e1.getMessage.contains("pq_lut expects"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorOps.pqEncode(col("s"), cb)).collect()
    }
    assert(e2.getMessage.contains("pq_encode expects"))
    // pq_lut now replicates pq_encode's codebook-shape validation
    intercept[IllegalArgumentException] {
      graft.functions.PqLutExpr(
        org.apache.spark.sql.GraftBridge.expression(col("s")),
        Seq(Seq(Array(1.0), Array(1.0, 2.0))))
    }
    intercept[IllegalArgumentException] {
      graft.functions.PqLutExpr(
        org.apache.spark.sql.GraftBridge.expression(col("s")),
        Seq(Seq(Array(1.0)), Seq(Array(1.0), Array(2.0))))
    }
  }

  test("ivfPqTopK recall >= 0.8 vs brute force (sf0.001 and sf0.01)") {
    // 0.8 is the oracled sim_ann_ivf_pq gate; sf0.01 is the driver's scale
    Seq("sf0.001", "sf0.01").foreach { sfd =>
      val emb = Tables.embeddings(spark, sf(sfd))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
      val pq = pairs(Similarity.ivfPqTopK(emb, queries, k = 5))
      val recall = (exact & pq).size.toDouble / exact.size
      assert(recall >= 0.8, s"IVF-PQ recall $recall too low at $sfd")
    }
  }

  test("ivfPqResidualTopK: recall >= 0.8 on real embeddings, residual " +
      "codes beat plain PQ on planted clustered data") {
    // real-data gate (the oracled sim_ann_residual contract)
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    val res = pairs(Similarity.ivfPqResidualTopK(emb, queries, k = 5))
    val recall = (exact & res).size.toDouble / exact.size
    assert(recall >= 0.8, s"residual IVF-PQ recall $recall too low")
    // planted geometry where residual codes MUST estimate better: 8
    // far-apart clusters (offset 10, noise 0.3) and a codebook budget
    // (m=8, k=4) far too small to represent cluster offsets — plain PQ
    // collapses distinct clusters into shared codewords (reconstruction
    // error ~ the offset scale), residual PQ only quantizes the noise
    // ball. The pinned invariant is the MECHANISM, mean ADC error of
    // q·v (top-k recall inside huge-offset clusters is indiscriminate:
    // within-cluster cosine gaps shrink as 'sigma^2/|c|^2', below ANY
    // quantizer's resolution).
    val rnd = new scala.util.Random(7)
    val dim = 32
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 10.0))
    // contiguous 64-row blocks per cluster: the deterministic k-means
    // seed schedule (evenly spaced over the id-ordered sample) then
    // starts one seed in each planted cluster
    val data = (0 until 512).map { i =>
      val c = centers(i / 64)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val corpus = data.toDF("vec_id", "embedding")
    import graft.functions.VectorOps
    val fine = Similarity.collectCentroids(corpus, 8, 2,
      "vec_id", "embedding")
    val cbPlain = Similarity.trainPqCodebooks(corpus, m = 8, k = 4)
    val centsLit = typedlit(fine.map(_.toSeq).toSeq)
    def residualOf(v: org.apache.spark.sql.Column,
                   cId: org.apache.spark.sql.Column) =
      zip_with(v.cast("array<double>"), element_at(centsLit, cId + 1),
        (a, b) => a - b)
    val routed = corpus.withColumn("c_id",
      VectorOps.nearestCentroids(col("embedding"), fine.toSeq, Nil, Nil, 1, 2)
        .getItem(0))
    val cbResid = Similarity.trainPqCodebooks(
      routed.select(col("vec_id"),
        residualOf(col("embedding"), col("c_id")).as("embedding")),
      m = 8, k = 4)
    val q = data(5)._2 // one in-cluster query vector, applied to ALL rows
    val qLit = typedlit(q.map(_.toDouble).toSeq)
    val errs = routed.select(
      abs(VectorOps.pqAdcDot(
        VectorOps.pqEncode(col("embedding"), cbPlain),
        VectorOps.pqLut(qLit, cbPlain)) -
        VectorOps.dot(qLit, col("embedding"))).as("err_plain"),
      abs(VectorOps.dot(qLit, element_at(centsLit, col("c_id") + 1)) +
        VectorOps.pqAdcDot(
          VectorOps.pqEncode(residualOf(col("embedding"), col("c_id")), cbResid),
          VectorOps.pqLut(qLit, cbResid)) -
        VectorOps.dot(qLit, col("embedding"))).as("err_resid"))
      .agg(avg("err_plain").as("p"), avg("err_resid").as("r")).head()
    val (plainErr, residErr) = (errs.getDouble(0), errs.getDouble(1))
    assert(residErr < plainErr * 0.35, // measured ratio 0.247 at seed 7
      s"residual ADC error $residErr must be far below plain $plainErr " +
        "when cluster offsets exceed the codebook budget")
  }

  test("ivfPqResidualTopK: exact re-rank emits true cosines (bias term " +
      "cannot leak into final sims)") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val res = Similarity.ivfPqResidualTopK(emb, queries, k = 5)
      .select("q_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, queries, k = 500)
      .select("q_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    res.foreach { case (q, n, s) =>
      assert(math.abs(s - exact((q, n))) <= 1e-9,
        s"re-ranked sim for ($q,$n) is not the true cosine")
    }
  }

  test("ivfPqTopK: exact re-rank means emitted sims are true cosines") {
    val emb = Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val pq = Similarity.ivfPqTopK(emb, queries, k = 5)
      .select("q_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, queries, k = 500)
      .select("q_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    pq.foreach { case (q, n, s) =>
      assert(math.abs(s - exact((q, n))) <= 1e-9,
        s"re-ranked sim for ($q,$n) is not the true cosine")
    }
  }

  test("nearDupPairsExact is symmetric-free (id_a < id_b) and thresholded") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairsExact(corpus, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("lshNearDupPairs finds what exact finds at high threshold (sf0.001)") {
    val emb = Tables.embeddings(spark, sf())
    val exact = Similarity.nearDupPairsExact(emb, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(emb, 0.45, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH output must be a subset of exact (no false positives: exact verify)
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = (exact & lsh).size.toDouble / exact.size
      assert(recall >= 0.5, s"LSH near-dup recall $recall too low")
    }
  }

  test("semanticNearDupPairs maxCluster bounds a planted hot cluster") {
    // 60 IDENTICAL vectors (one degenerate cluster — identical points always
    // share an assignment) + 4 spread low-id ones that seed the centroids:
    // uncapped, the hot cluster alone yields C(60,2)=1770 candidate pairs
    val hot = (100 until 160).map(i => (i.toLong, Array(1.0f, 0.0f)))
    val cold = Seq(
      (0L, Array(-1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.0f, -1.0f)), (3L, Array(-0.7f, 0.7f)))
    val df = (cold ++ hot).toDF("vec_id", "embedding")
    val uncapped = Similarity.semanticNearDupPairs(df, 0.99,
      nCentroids = 4, probes = 1)
    assert(uncapped.count() >= 1770L) // the blowup the cap prevents
    // cap below the hot-cluster size: its assignments are dropped entirely,
    // so no pair from it survives; small clusters are untouched
    val capped = Similarity.semanticNearDupPairs(df, 0.99,
      nCentroids = 4, probes = 1, maxCluster = 30)
    val pairs = capped.select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < 100L && b < 100L })
  }

  test("semanticNearDupPairs: exact-subset with high recall (sf0.001)") {
    val emb = Tables.embeddings(spark, sf())
    val exact = Similarity.nearDupPairsExact(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sem = Similarity.semanticNearDupPairs(emb, 0.4, nCentroids = 16,
        probes = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every emitted pair is cosine-verified, so false positives are impossible
    assert(sem.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = (exact & sem).size.toDouble / exact.size
      assert(recall >= 0.8, s"semantic near-dup recall $recall too low")
    }
  }
}
