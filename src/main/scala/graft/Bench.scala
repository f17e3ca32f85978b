package graft

/** Benchmark main: runs the headline queries (Queries.headline) against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query and total
  * wall-clock seconds. Failed queries are excluded from the total and
  * listed under `"failed"` — a broken query must read as breakage, not as
  * a time. Session config comes from [[GraftSession]] (the engine's one
  * place for scale settings).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(s"local[$cpus]", cores = cpus)

    // Warm the session before timing: JVM/codegen/parquet-footer paths are
    // steady-state on a long-lived cluster, not part of query cost.
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables(spark, sfDir, t).limit(1).count())

    // Default: execute the query's own physical plan (all output columns,
    // final sort included) — a count() on top lets Catalyst prune
    // deterministic projections and measures little more than the scan for
    // map-only queries. SPARK_GRAFT_BENCH_COUNT=1 restores the count()
    // timing for apples-to-apples comparison against older rounds.
    //
    // Contention robustness: each query runs SPARK_GRAFT_BENCH_RUNS times
    // (default 2, back-to-back) and reports the per-query MIN, with the
    // max-min spread alongside — a one-off contended pass (r4's driver
    // run read 94 s where two clean runs minutes apart read 57 s) then
    // shows up as a large spread on a normal min instead of masquerading
    // as a 60% regression. min-of-2 is also the steadier steady-state
    // estimate: pass 1 absorbs first-use JIT/codegen for plans unique to
    // a query.
    val legacyCount = sys.env.contains("SPARK_GRAFT_BENCH_COUNT")
    val trace = sys.env.contains("SPARK_GRAFT_BENCH_TRACE")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val results = Queries.headline.map { name =>
      if (trace) System.err.println(s"[bench-trace] start $name")
      val fn = Queries.all(name)
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (legacyCount) df.count() else df.queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name: ${e.getMessage}"); None
        }
      }
      (name, times)
    }
    val good = results.filter(_._2.length == runs)
    val failed = results.filterNot(_._2.length == runs).map(_._1)
    val qs = good.map { case (k, ts) => "\"" + k + "\":" + ts.min }
      .mkString("{", ",", "}")
    val spread = good.map { case (k, ts) => "\"" + k + "\":" + (ts.max - ts.min) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map(_._2.min).sum
    // the round-1..3 headline subset, for like-for-like cross-round compare
    val legacy = good.filter(r => Queries.headlineLegacy.contains(r._1))
      .map(_._2.min).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","legacy_total":$legacy,"method":"min-of-$runs","queries":$qs,"spread":$spread,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
