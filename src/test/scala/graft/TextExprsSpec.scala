package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Native text expressions vs their declarative formulations — the
  * replacements must be bit-identical, not merely close, because the
  * DuckDB oracles recompute the declarative form.
  */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def spanDigests(toks: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.SpanDigestsExpr(
      org.apache.spark.sql.GraftBridge.expression(toks), k))

  /** The HOF form the native expression replaced (and the oracle's shape). */
  private def spanDigestsHof(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), (size(toks) - (k - 1)).cast("int")),
        i => md5(concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h i j k l m n o p",
    "short",
    "", // empty text
    "exactly eight tokens in this doc right here",
    "Üñíçødé tökens résumé naïve 北京 москва ωμέγα mixed in the stream",
    "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
    (1 to 200).map(i => s"tok$i").mkString(" "))

  test("span_digests is bit-identical to the HOF md5-window form") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.normTokens(col("text")).as("toks"))
    for (k <- Seq(1, 2, 8, 16)) {
      val rows = docs.select(col("doc_id"),
          spanDigests(col("toks"), k).as("native"),
          spanDigestsHof(col("toks"), k).as("hof"))
        .as[(Long, Seq[String], Seq[String])].collect()
      rows.foreach { case (id, native, hof) =>
        assert(native == hof, s"doc $id, k=$k")
      }
    }
  }

  test("span_digests window count and content match a hand computation") {
    val out = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(spanDigests(TextOps.normTokens(col("text")), 2))
      .as[Seq[String]].head()
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Seq(m("a b"), m("b c")))
  }

  test("span_digests: arrays shorter than k yield an empty array, not null") {
    val out = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(spanDigests(TextOps.normTokens(col("text")), 8).as("d"))
      .select(size(col("d"))).as[Int].head()
    assert(out == 0)
  }

  private def spanHashes(toks: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.SpanHashesExpr(
      org.apache.spark.sql.GraftBridge.expression(toks), k))

  test("span_hashes: same equality structure as span_digests, long-width") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.normTokens(col("text")).as("toks"))
    for (k <- Seq(1, 2, 8)) {
      val rows = docs.select(
          spanDigests(col("toks"), k).as("md5"),
          spanHashes(col("toks"), k).as("xx"))
        .as[(Seq[String], Seq[Long])].collect()
      rows.foreach { case (md5, xx) =>
        assert(md5.length == xx.length) // same window count
        // equal windows <=> equal fingerprints, in BOTH kinds
        def classes[T](s: Seq[T]) =
          s.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
        assert(classes(md5) == classes(xx))
      }
    }
  }

  test("span_hashes windows hash the joined byte stream (hand check)") {
    import org.apache.spark.unsafe.Platform
    val out = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(spanHashes(TextOps.normTokens(col("text")), 2))
      .as[Seq[Long]].head()
    def h(s: String): Long = {
      val b = s.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    assert(out == Seq(h("a b"), h("b c")))
  }

  test("property: span fingerprints match the reference windows (2000 samples)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val r = new scala.util.Random(20260812L)
    def randTok(): String = r.nextInt(6) match {
      case 0 => "" // empty token (consecutive delimiters upstream)
      case 1 => "漢字" + r.nextInt(10) // multi-byte UTF-8
      case _ => r.alphanumeric.take(1 + r.nextInt(6)).mkString
    }
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to 2000).foreach { i =>
      val n = r.nextInt(24)
      // small vocabulary → frequent repeated windows (the equality classes
      // the operators consume)
      val vocab = Vector.fill(1 + r.nextInt(5))(randTok())
      val toks = Seq.fill(n)(vocab(r.nextInt(vocab.length)))
      val k = 1 + r.nextInt(10)
      val lit = Literal.create(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        ArrayType(StringType))
      val md5s = graft.functions.SpanDigestsExpr(lit, k).eval(null)
        .asInstanceOf[ArrayData].toObjectArray(StringType).map(_.toString).toSeq
      val expected =
        if (n < k) Seq.empty
        else (0 to n - k).map(j => md5hex(toks.slice(j, j + k).mkString(" ")))
      assert(md5s == expected, s"case $i: toks=$toks k=$k")
      val xxs = graft.functions.SpanHashesExpr(lit, k).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSeq
      assert(xxs.length == expected.length, s"case $i window count")
      def classes[T](s: Seq[T]) =
        s.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
      assert(classes(xxs) == classes(expected), s"case $i equality classes")
    }
  }

  test("native text expressions reject wrong-typed inputs at analysis " +
      "time with the function's name") {
    GraftExtensions.register(spark)
    val df = Seq(1).toDF("i")
    Seq("word_shingles(i, 2)", "simhash64(i)", "token_stats(i)",
      "span_digests(i, 2)", "span_hashes(i, 2)", "hashed_shingles(i, 3)",
      "minhash_sig(i, 4)").foreach { exprStr =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.selectExpr(exprStr).collect()
      }
      assert(e.getMessage.contains("expects"), s"$exprStr: ${e.getMessage}")
    }
  }

  test("bpe_encode strips boundary-marker characters from the INPUT " +
      "(guarantee holds without cleanText running first)") {
    import graft.functions.TextOps
    val m1 = 1.toChar; val m2 = 2.toChar
    val merges = Seq(("l", "o"), ("lo", "w"))
    // a doc carrying the markers must encode exactly like the same doc
    // with them removed — previously they corrupted the wrapped encoding
    // (mis-split tokens, silently wrong counts/ids)
    val df = Seq(
      (s"lo${m1}w lo${m2}wer", "low lower"),
      (s"${m1}${m2}", ""),
      (s"a${m1} ${m2}b", "a b")).toDF("noisy", "clean")
    val diff = df.select(
      TextOps.bpeEncode(col("noisy"), merges).as("n"),
      TextOps.bpeEncode(col("clean"), merges).as("c"))
      .filter(col("n") =!= col("c"))
    assert(diff.count() == 0)
    // and the token stream is the expected one
    val toks = Seq(s"lo${m1}w").toDF("text")
      .select(TextOps.bpeEncodeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("low", "</w>"))
  }

  test("span_digests registered as a SQL function") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT span_digests(array('a','b','c'), 2) AS d").as[Seq[String]].head()
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Seq(m("a b"), m("b c")))
    val err = intercept[Exception] {
      spark.sql("SELECT span_digests(array('a'), 1 + 1)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("char n-grams iterate CODE POINTS: a surrogate pair is one " +
      "unit, never sliced") {
    // one astral char (U+1D11E) + 'abc': 4 code points -> 2 trigrams
    val astral = new String(Character.toChars(0x1D11E)) + "abc"
    val grams = Seq(astral).toDF("text")
      .select(TextOps.charNgrams(col("text"), 3)).as[Seq[String]].head()
    assert(grams.length == 2, s"4 code points give 2 trigrams: $grams")
    assert(grams.head == new String(Character.toChars(0x1D11E)) + "ab")
    assert(grams.forall(g =>
      !g.exists(c => Character.isSurrogate(c) && g.length == 1)))
  }

  test("span expressions skip NULL tokens exactly like concat_ws " +
      "(no separator either)") {
    val toks = Seq((1L, Seq("a", null, "b"))).toDF("doc_id", "toks")
    val native = toks.select(spanDigests(col("toks"), 3))
      .as[Seq[String]].head()
    val declarative = toks
      .select(md5(concat_ws(" ", col("toks"))).as("d"))
      .as[String].head()
    assert(native == Seq(declarative),
      "the window digest must equal md5(concat_ws(' ', window))")
  }

  test("the md5 minhash family rejects out-of-range inputs by name " +
      "instead of returning negative garbage signatures") {
    val e = intercept[Exception] {
      Seq(Seq(-42L)).toDF("hs")
        .select(org.apache.spark.sql.GraftBridge.column(
          graft.functions.MinHashFromHashesExpr(
            org.apache.spark.sql.GraftBridge.expression(col("hs")),
            4, "md5"))).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("30-bit") ||
        Option(e.getCause).exists(_.getMessage.contains("30-bit"))))
  }

  test("BPE trainers strip boundary markers from corpus words, so " +
      "trained rules always pass the encoders' marker-free gate") {
    val poisoned = Seq((1L, "low low low \u0001ow\u0002 lower lower"))
      .toDF("doc_id", "text")
    val merges = TextOps.bpeTrainMergesLocal(poisoned, steps = 5,
        maxVocab = 0)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // encoding with the trained rules must construct (the require
    // would throw on a marker-carrying rule)
    val enc = poisoned.select(TextOps.bpeEncode(col("text"), merges))
      .as[String].head()
    assert(enc.nonEmpty)
  }
}
