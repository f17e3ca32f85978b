package graft

/** Driver-gate smoke: every registered query runs at sf0.001, returns the
  * columns its oracle (if any) will be compared on, and non-pair queries
  * return rows. Catches a broken queries/oracle wiring inside `sbt test`
  * instead of at the driver's Verify run.
  */
class QueriesSmokeSpec extends SparkSpec {

  // pair/threshold queries may legitimately be empty at the smallest SF
  private val mayBeEmpty = Set(
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_exact", "dedup_embedding_lsh")

  test("every oracled query name exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // Queries whose SEMANTICS are an all-pairs comparison: the explicitly
  // documented exactness/recall anchors (their scale twins are the LSH /
  // clustered variants) and the one broadcast-single-row total join.
  private val quadraticByDesign = Set(
    "dedup_embedding_exact", // exact cosine anchor
    "sim_topk_bruteforce", // brute-force top-k baseline
    "sim_ann_lsh", "sim_ann_ivf", "sim_quantized_recall", // recall vs exact
    "dedup_semantic", // contains its own exact-recall anchor
    "text_unigram_lm", "text_tfidf_top", // broadcast 1-row corpus total
    "text_bm25_top", "text_bm25_indexed", // broadcast 1-row (N, Σdl, df) stats
    "text_bm25_incremental", // same 1-row stats join, maintained store
    "text_bm25_queries", // same 1-row stats join, batched probe
    "text_rrf_fusion", // contains the bm25 1-row stats join
    "text_hybrid_search", // bm25 1-row stats join + 1-row query broadcast
    "text_hybrid_batch", // batched bm25 1-row stats join
    "text_hybrid_filtered", // bm25 1-row stats join, allowed-gated
    "hybrid_search_sql", // control-plane expr; result is a literal array
    "text_backoff_lm", // broadcast 1-row (N, V) total
    "pipeline_ppl_buckets", // backoff 1-row total + broadcast thresholds
    "corpus_drift", // broadcast 1-row embedding-shift join
    "pipeline_drift_response", // 1-row shift + 1-row global-verdict joins
    "hybrid_batch_sql", // control-plane expr; result is a literal array
    "text_pmi_bigrams", // broadcast 1-row (B, T) totals join
    "text_bm25_stats", // 1-row x 1-row stats struct join
    "pipeline_curation", "pipeline_pretrain", // chain includes tfidf-style total
    "pipeline_pretrain_html", // same chain over extracted HTML
    "pipeline_pretrain_pdf", // same chain over extracted PDF text
    "pipeline_pretrain_main", // same chain over main content
    "pipeline_pagerank", // 1-row N + per-iteration dangling broadcasts
    "pipeline_pagerank_incremental", // same rank; edges from the store
    "pipeline_crawl_priority") // composes the pagerank broadcasts

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf())
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
      // plan-regression guard: no accidental O(n²) join shape may appear
      // outside the documented anchors — a dropped equi-join condition
      // (typo'd column, renamed key) degrades silently to a nested-loop
      // plan that "works" at sf0.001 and dies at scale
      if (!quadraticByDesign(name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          s"$name plans an all-pairs join:\n${plan.take(1500)}")
      }
      // single-partition-window backstop: an UNPARTITIONED window moves
      // its whole input to one partition — legal only when that input is
      // already bounded (a limit/top-k, a global one-row aggregate, or
      // driver-local rows), never on unbounded data. Every current site
      // is bounded by construction; this pins that a future global
      // window cannot hide among the WindowExec warnings.
      physicalNodes(df).foreach {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty =>
          assert(boundedBelow(w.child),
            s"$name has a global window over UNBOUNDED input:\n" +
              w.treeString.take(1200))
        case _ => ()
      }
    }
  }

  /** True when every path below `p` passes a row-bounding operator: a
    * limit/top-k, a grouping-free aggregate (≤ 1 row), or driver-local
    * rows. The walk descends through AQE wrappers like
    * [[SparkSpec.physicalNodes]].
    */
  private def boundedBelow(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    def walk(x: SparkPlan): Boolean = x match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case agg: HashAggregateExec if agg.groupingExpressions.isEmpty => true
      case agg: ObjectHashAggregateExec
          if agg.groupingExpressions.isEmpty => true
      case agg: SortAggregateExec if agg.groupingExpressions.isEmpty => true
      case _: LocalTableScanExec => true
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(walk)
    }
    walk(p)
  }

  test("pipeline_ppl_buckets: per-source terciles are value-ordered " +
      "(every head >= every middle >= every tail) and near-thirds") {
    val rows = Queries.all("pipeline_ppl_buckets")(spark, sf())
      .select("source", "avg_logprob", "bucket").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      def scores(b: String) = rs.filter(_._3 == b).map(_._2)
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, s"$src missing a bucket")
      assert(h.min >= m.max, s"$src: a middle doc outscores a head doc")
      assert(m.min >= t.max, s"$src: a tail doc outscores a middle doc")
      // threshold semantics: buckets are near-thirds, off only by
      // boundary-score ties (which share the boundary bucket)
      val n = rs.length
      assert(h.length >= n / 3 - 1 && (h.length + m.length) >= 2 * n / 3 - 1,
        s"$src: bucket sizes ${h.length}/${m.length}/${t.length} of $n")
    }
  }

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
