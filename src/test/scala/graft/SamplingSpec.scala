package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling: same rows under any partitioning, fraction
  * accuracy, per-stratum quotas.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(10000).select(col("id"))

  test("byFraction is deterministic and partition-invariant") {
    val a = Sampling.byFraction(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.byFraction(ids.repartition(13), "id", 0.3)
      .as[Long].collect().toSet
    assert(a == b)
    // within 3% of the requested fraction on 10k rows
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.03, s"got ${a.size}")
  }

  test("byFraction is monotone: a smaller fraction is a subset") {
    val small = Sampling.byFraction(ids, "id", 0.1).as[Long].collect().toSet
    val big = Sampling.byFraction(ids, "id", 0.4).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("mixture keeps ~the per-stratum fraction; unknown strata use default") {
    val df = spark.range(30000).select(col("id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("src"))
    val weights = Map("s0" -> 0.8, "s1" -> 0.2) // s2 falls to defaultFrac=0
    val out = Sampling.mixture(df, "src", weights, "id")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("s0") / 10000.0 - 0.8) < 0.03, s"s0 got ${out("s0")}")
    assert(math.abs(out("s1") / 10000.0 - 0.2) < 0.03, s"s1 got ${out("s1")}")
    assert(!out.contains("s2"))
    // per-stratum draw equals byFraction on that stratum (same hash order)
    val s1direct = Sampling.byFraction(df.filter(col("src") === "s1"), "id", 0.2)
      .select("id").as[Long].collect().toSet
    val s1mix = Sampling.mixture(df, "src", weights, "id")
      .filter(col("src") === "s1").select("id").as[Long].collect().toSet
    assert(s1mix == s1direct)
  }

  test("tokenBudget: every stratum keeps at least the budget (boundary " +
      "doc included), kept set is the hash-order prefix") {
    val df = (1L to 600L).map(i => (i, "s" + (i % 3), 5L + (i % 40)))
      .toDF("doc_id", "source", "n_tokens")
    val budget = 1000L
    val out = Sampling.tokenBudget(df, budget)
      .select("doc_id", "source", "n_tokens", "tok_before")
      .as[(Long, String, Long, Long)].collect()
    assert(out.forall(_._4 < budget))
    out.groupBy(_._2).foreach { case (src, rs) =>
      val kept = rs.map(r => r._3 + r._4).max // straddler's end offset
      assert(kept >= budget, s"$src kept only $kept tokens")
      // nothing kept beyond the straddler: kept count = docs with off<budget
      assert(rs.map(_._1).distinct.length == rs.length)
    }
    // prefix property: a smaller budget selects a subset
    val smaller = Sampling.tokenBudget(df, 400L)
      .select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(out.map(_._1).toSet))
    // deterministic across partitioning
    val again = Sampling.tokenBudget(df.repartition(11), budget)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("tokenBudget is a FILTER over df: extra columns and custom " +
      "column names survive") {
    val df = (1L to 100L).map(i => (i, "s" + (i % 2), 5L, "payload" + i))
      .toDF("url_id", "lang", "toks", "text")
    val out = Sampling.tokenBudget(df, 50L, strataCol = "lang",
      tokensCol = "toks", idCol = "url_id")
    assert(out.columns.toSet ==
      Set("url_id", "lang", "toks", "text", "tok_before"),
      "caller columns and names must pass through, plus tok_before")
    assert(out.count() > 0)
  }

  test("fraction 1.0 keeps a stratum WHOLE: the sentinel threshold " +
      "admits every hash prefix, incl. a maximal one") {
    assert(Sampling.fracThreshold(1.0) == "g")
    val df = (1L to 500L).map(i => (i, "s")).toDF("doc_id", "source")
    assert(Sampling.byFraction(df, "doc_id", 1.0).count() == 500)
    // temperatureMixture: a tiny target forces big-source flattening,
    // a huge target clamps every f_s to 1.0 -> the whole corpus
    val t = (1L to 300L).map(i => (i, "s" + (i % 3), 10L))
      .toDF("doc_id", "source", "n_tokens")
    val all = Sampling.temperatureMixture(t, targetTokens = 1000000L)
    assert(all.count() == 300,
      "f = 1.0 must short-circuit the hash compare")
  }

  test("temperatureMixture accepts non-string stratum columns; " +
      "epochs validates defaultFactor") {
    val t = (1L to 200L).map(i => (i, (i % 3).toInt, 10L))
      .toDF("doc_id", "lang_id", "n_tokens")
    val out = Sampling.temperatureMixture(t, strataCol = "lang_id",
      targetTokens = 100L)
    assert(out.count() > 0, "an int stratum column must not throw")
    intercept[IllegalArgumentException] {
      Sampling.epochs(t.withColumn("source", lit("s")), "source",
        Map("s" -> 2.0), "doc_id", defaultFactor = 500.0)
    }
  }

  test("temperatureMixture: sqrt-weighted fractions — big sources " +
      "flattened, small kept whole, rows = byFraction at the same rate") {
    val df = ((1L to 4000L).map(i => (i, "big", 10L)) ++
      (4001L to 4100L).map(i => (i, "small", 10L)))
      .toDF("doc_id", "source", "n_tokens")
    // totals: big 40000, small 1000; Z = 200 + 31.6227766...
    val target = 20000L
    val out = Sampling.temperatureMixture(df, targetTokens = target)
    val fr = out.select("source", "mix_frac").distinct()
      .as[(String, Double)].collect().toMap
    val z = math.sqrt(40000.0) + math.sqrt(1000.0)
    def expected(tot: Double) =
      BigDecimal(math.min(1.0, target / (z * math.sqrt(tot))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fr("big") == expected(40000.0), s"big ${fr("big")}")
    assert(fr("small") == expected(1000.0)) // clamps to 1.0: kept whole
    assert(fr("small") == 1.0)
    // the kept rows of a stratum are exactly byFraction at mix_frac
    // (same md5 space; threshold rounding differs by < 1 in 2^32)
    val bigKept = out.filter(col("source") === "big")
      .select("doc_id").as[Long].collect().toSet
    val direct = Sampling.byFraction(
      df.filter(col("source") === "big"), "doc_id", fr("big"))
      .select("doc_id").as[Long].collect().toSet
    assert(bigKept == direct)
    // deterministic across partitioning
    val again = Sampling.temperatureMixture(df.repartition(13),
      targetTokens = target).select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("weighted: exact Efraimidis–Spirakis winners, ranked, " +
      "partition-invariant") {
    val df = (1L to 2000L).map(i => (i, 1L + (i % 50)))
      .toDF("doc_id", "w")
    val out = Sampling.weighted(df, n = 100, "w", "doc_id")
      .select("doc_id", "w", "rk").as[(Long, Long, Int)].collect()
    assert(out.length == 100)
    assert(out.map(_._3).sorted.toSeq == (1 to 100))
    // replay the race locally: u from the md5 prefix, -ln(u)/w ascending
    def pr(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1) / 4503599627370496.0
      BigDecimal(-math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (1L to 2000L).map(i => (i, 1L + (i % 50)))
      .sortBy { case (id, w) => (pr(id, w), id) }.take(100)
    assert(out.sortBy(_._3).map(t => (t._1, t._2)).toSeq == expect)
    // partition-invariant
    val again = Sampling.weighted(df.repartition(17), n = 100, "w", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("weighted: weight ∝ win probability — a dominant weight always " +
      "wins; zero/null weights never do") {
    val df = ((1L to 500L).map(i => (i, 1L)) :+ (999L, 1000000000L))
      .toDF("doc_id", "w")
    val out = Sampling.weighted(df, n = 5, "w", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(999L)) // P(miss) < 1e-6 at this weight ratio
    val withBad = df.union(Seq((1001L, 0L), (1002L, -3L)).toDF("doc_id", "w"))
      .unionByName(Seq(Tuple1(1003L)).toDF("doc_id")
        .withColumn("w", lit(null).cast("long")))
    val out2 = Sampling.weighted(withBad, n = 600, "w", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(!out2.contains(1001L) && !out2.contains(1002L) &&
      !out2.contains(1003L))
    assert(out2.size == 501) // every positive-weight row wins when n >= corpus
  }

  test("weightedStratified: per-stratum quotas == the global race run " +
      "on each stratum alone") {
    val df = (1L to 3000L).map(i => (i, "s" + (i % 3), 1L + (i % 40)))
      .toDF("doc_id", "src", "w")
    val out = Sampling.weightedStratified(df, "src", 50, "w", "doc_id")
      .select("doc_id", "src", "rk").as[(Long, String, Int)].collect()
    val bySrc = out.groupBy(_._2)
    assert(bySrc.keySet == Set("s0", "s1", "s2"))
    bySrc.foreach { case (src, rs) =>
      assert(rs.length == 50, s"$src quota")
      assert(rs.map(_._3).sorted.toSeq == (1 to 50), s"$src ranks")
      // equals the global race restricted to that stratum
      val alone = Sampling.weighted(df.filter(col("src") === src),
          n = 50, "w", "doc_id")
        .select("doc_id", "rk").as[(Long, Int)].collect().toSet
      assert(rs.map(t => (t._1, t._3)).toSet == alone, s"$src != global race")
    }
  }

  test("stratified takes exactly n per stratum (or all when smaller)") {
    val df = Tables.documents(spark, sf())
    val out = Sampling.stratified(df, "source", 7, "doc_id")
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val full = df.groupBy("source").count().as[(String, Long)].collect().toMap
    full.foreach { case (src, n) =>
      assert(counts(src) == math.min(7L, n), s"stratum $src")
    }
    // deterministic across invocations
    val again = Sampling.stratified(df, "source", 7, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("weighted/weightedStratified: null keys never win a slot (the " +
      "ascending priority sort is NULLS FIRST — an unfiltered null " +
      "priority would beat every weighted row)") {
    val base = (1L to 100L).map(i => (i.toString, 1L, "s" + (i % 2)))
      .toDF("k", "w", "src")
    val withNulls = base.unionByName(
      Seq(("ignored", 1000000L, "s0"), ("ignored2", 1000000L, "s1"))
        .toDF("k", "w", "src")
        .withColumn("k", lit(null).cast("string")))
    val out = Sampling.weighted(withNulls, n = 10, "w", "k")
      .select("k").as[String].collect()
    assert(out.length == 10 && out.forall(_ != null))
    val out2 = Sampling.weightedStratified(withNulls, "src", 10, "w", "k")
      .select("k").as[String].collect()
    assert(out2.length == 20 && out2.forall(_ != null))
  }

  test("StreamingSample: every prefix's reservoir == the one-shot race " +
      "over rows seen so far; a retried fold and a re-delivered row " +
      "change nothing") {
    import graft.streaming.StreamingSample
    val all = spark.range(5000).select(col("id").as("k"),
      (pmod(col("id") * 37 + 11, lit(97)) + 1).cast("long").as("w"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("payload"))
    val w1 = all.filter(col("k") % 3 =!= 2)
    val w2 = all.filter(col("k") % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_rsv").toString
    def sampleRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(_.toSeq).toSeq
    def oneShot(df: org.apache.spark.sql.DataFrame) =
      sampleRows(Sampling.weighted(df, 50, "w", "k"))
    StreamingSample.foldBatch(spark, dir, w1, 0L, 50, "w", "k")
    assert(StreamingSample.committedStates(dir) == Seq(0L))
    assert(sampleRows(StreamingSample.currentSample(spark, dir).get) ==
      oneShot(w1), "prefix 1 reservoir must equal the one-shot race")
    StreamingSample.foldBatch(spark, dir, w2, 1L, 50, "w", "k")
    val afterB1 = sampleRows(StreamingSample.currentSample(spark, dir).get)
    assert(afterB1 == oneShot(all),
      "end-of-stream reservoir must equal the one-shot race over all rows")
    // retry of batch 1: reads only states < 1 (its predecessor), not its
    // own landed directory — bit-identical outcome
    StreamingSample.foldBatch(spark, dir, w2, 1L, 50, "w", "k")
    assert(sampleRows(StreamingSample.currentSample(spark, dir).get)
      == afterB1)
    assert(StreamingSample.committedStates(dir) == Seq(0L, 1L))
    // at-least-once source: a batch re-delivering already-seen rows is
    // folded out (same key -> same priority -> same slot)
    StreamingSample.foldBatch(spark, dir, w1.limit(200), 2L, 50, "w", "k")
    assert(sampleRows(StreamingSample.currentSample(spark, dir).get)
      == afterB1)
  }

  test("reservoir: a checkpoint reset over a USED stateDir is rejected " +
      "by name, never a silently-stale sample") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rsv").toString
    val rows = (1L to 50L).map(i => (i, 5L)).toDF("doc_id", "n_tokens")
    // a previous run committed batches 3 and 4
    graft.streaming.StreamingSample.foldBatch(spark, dir, rows, 3L, 10,
      "n_tokens", "doc_id")
    graft.streaming.StreamingSample.foldBatch(spark, dir, rows, 4L, 10,
      "n_tokens", "doc_id")
    // batch ids restart at 0 (fresh checkpoint): must reject
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingSample.foldBatch(spark, dir, rows, 0L, 10,
        "n_tokens", "doc_id")
    }
    assert(e.getMessage.contains("checkpoint was reset"))
    // a RETRY of the newest batch stays fine
    graft.streaming.StreamingSample.foldBatch(spark, dir, rows, 4L, 10,
      "n_tokens", "doc_id")
  }
}
