package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** M5 text analysis: token counting, quality features, language ID,
  * fingerprints. All pure Column expressions — asserted on literal rows.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  test("token and subword counts") {
    assert(one[Long](TextOps.tokenCount(col("text")), "a b c") == 3L)
    // subwords: ceil(len/4) per token, min 1: "hello"(2) "hi"(1) "abcdefgh"(2)
    assert(one[Long](TextOps.subwordCount(col("text")), "hello hi abcdefgh") == 5L)
  }

  test("quality features: exact ratios") {
    val feats = TextOps.qualityFeatures(col("text")).toMap
    val text = "the cat the cat" // 4 tokens, 2 stopwords, 2 distinct
    assert(one[Long](feats("n_tokens"), text) == 4L)
    assert(one[Double](feats("stopword_ratio"), text) == 0.5)
    assert(one[Double](feats("distinct_ratio"), text) == 0.5)
    assert(one[Double](feats("avg_token_len"), text) == 3.0)
  }

  test("quality score is in [0, 1]") {
    val docs = Tables.documents(spark, sf())
    val mm = docs.select(TextOps.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).as[(Double, Double)].head()
    assert(mm._1 >= 0.0 && mm._2 <= 1.0)
  }

  test("language ID picks the profile with most marker hits") {
    assert(one[String](TextOps.langId(col("text")),
      "the cat is on the mat and the dog") == "en")
    assert(one[String](TextOps.langId(col("text")),
      "der hund ist nicht das problem und die katze") == "de")
    assert(one[String](TextOps.langId(col("text")),
      "el perro de la casa que los gatos") == "es")
    assert(one[String](TextOps.langId(col("text")),
      "le chat est dans les maisons et des chiens") == "fr")
  }

  test("bpe-ish regex tokenizer splits letter/digit/symbol runs") {
    val toks = Seq("Hello, world42!").toDF("text")
      .select(TextOps.bpeTokens(col("text")).as("v")).as[Seq[String]].head()
    assert(toks == Seq("hello", ",", "world", "42", "!"))
    assert(one[Long](TextOps.bpeTokenCount(col("text")), "a1b2") == 4L)
  }

  test("char n-grams: distinct, order of first occurrence, space-normalized") {
    val tris = Seq("ab  cab").toDF("text")
      .select(TextOps.charNgrams(col("text"), 3).as("v")).as[Seq[String]].head()
    assert(tris == Seq("ab ", "b c", " ca", "cab")) // "ab  cab" -> "ab cab"
    assert(Seq("ab").toDF("text")
      .select(TextOps.charNgrams(col("text"), 3).as("v"))
      .as[Seq[String]].head().isEmpty)
  }

  test("n-gram language ID distinguishes languages by trigram profiles") {
    assert(one[String](TextOps.langIdNgram(col("text")),
      "the cat is sitting on the mat and singing") == "en")
    assert(one[String](TextOps.langIdNgram(col("text")),
      "der hund und die katze sind nicht schlecht") == "de")
    assert(one[String](TextOps.langIdNgram(col("text")),
      "el perro de la casa que ladra") == "es")
  }

  test("unicode: CJK marker voting and char-ngram langid pick zh") {
    val zh = "我 有 不 是 了 在 的"
    assert(one[String](TextOps.langId(col("text")), zh) == "zh")
    assert(one[String](TextOps.langIdNgram(col("text")), "的是了在我有不") == "zh")
  }

  test("unicode: shingles and simhash survive non-ASCII text") {
    val sh = Seq("héllo wörld héllo naïve").toDF("text")
      .select(TextOps.shingles(col("text"), 2).as("v")).as[Seq[String]].head()
    assert(sh.contains("héllo wörld"))
    val sig = graft.operators.Dedup.simhash(
      Seq((1L, "日本語 テキスト の 処理"), (2L, "日本語 テキスト の 処理"))
        .toDF("doc_id", "text")).as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
  }

  test("md5 fingerprint is whitespace/case normalized") {
    val df = Seq("Hello  World", "hello world ", "other").toDF("text")
    val fps = df.select(TextOps.fingerprintMd5(col("text")).as("f"))
      .as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("rolling fingerprint: stable, bounded to 31 bits, order-sensitive") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fps = df.select(TextOps.fingerprintRolling(col("text")).as("f"))
      .as[Long].collect()
    assert(fps(0) == fps(2))
    assert(fps(0) != fps(1)) // order matters (rolling, not bag-of-words)
    assert(fps.forall(f => f >= 0 && f < (1L << 31)))
  }

  test("pii: counts per kind and full redaction") {
    val text = "mail a.b+c@ex-1.org or x@y.io, call +1-555-123-4567, " +
      "ssn 123-45-6789, host 10.0.255.3 end"
    val df = Seq(text).toDF("text")
    val counts = df.select(TextOps.piiCounts(col("text"))
        .map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long)].head()
    assert(counts == ((2L, 1L, 1L, 1L)))
    val red = df.select(TextOps.redactPii(col("text"))).as[String].head()
    assert(red == "mail <EMAIL> or <EMAIL>, call <PHONE>, ssn <SSN>, " +
      "host <IP> end")
    // nothing PII-shaped survives redaction
    val recount = Seq(red).toDF("text")
      .select(TextOps.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Long, Long)].head()
    assert(recount == ((0L, 0L, 0L, 0L)))
  }

  test("unigram LM: rarer tokens score lower, counts match tokenization") {
    val df = Seq((1L, "common common common rare"), (2L, "common common"))
      .toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(df).orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 4L), (2L, 2L)))
    // doc 2 is all 'common' (p=5/6); doc 1 mixes in 'rare' (p=1/6) → lower
    assert(out(0)._3 < out(1)._3)
    assert(out.forall(_._3 <= 0.0))
  }

  test("shingles: distinct n-grams of consecutive tokens") {
    def shingles(n: Int, text: String): Seq[String] =
      Seq(text).toDF("text")
        .select(TextOps.shingles(col("text"), n).as("v"))
        .as[Seq[String]].head()
    assert(shingles(2, "a b c b c").toSet == Set("a b", "b c", "c b"))
    assert(shingles(3, "a b").isEmpty)
  }

  test("bpeTrainMerges: hand-computed merges on the classic low/lower corpus") {
    val docs = Seq("low low low", "lower lower").toDF("text")
    val out = TextOps.bpeTrainMerges(docs, steps = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    // words: low×3, lower×2 (+ </w> marker per word)
    // pair counts: (l,o)=5 (o,w)=5 (w,</w>)=3 (w,e)=2 (e,r)=2 (r,</w>)=2
    // ties break on the encoded pair string ascending
    assert(out(0) == ((1L, "l", "o", 5L)))
    assert(out(1) == ((2L, "lo", "w", 5L)))
    assert(out(2) == ((3L, "low", "</w>", 3L)))
    assert(out(3) == ((4L, "e", "r", 2L)))
  }

  test("bpeTrainMerges: counts non-increasing, deterministic, on real docs") {
    val docs = Tables.documents(spark, sf())
    val a = TextOps.bpeTrainMerges(docs, steps = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(a.length == 6)
    // the best pair's count can never rise: merging only removes pair
    // occurrences or creates pairs bounded by the merged pair's count
    a.sliding(2).foreach {
      case Array(x, y) => assert(x._4 >= y._4)
      case _ => ()
    }
    val b = TextOps.bpeTrainMerges(docs.repartition(7), steps = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("bpeTrainMergesLocal: identical output to the distributed trainer") {
    val corpus = Tables.documents(spark, sf())
    val dist = TextOps.bpeTrainMerges(corpus, steps = 10)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val local = TextOps.bpeTrainMergesLocal(corpus, steps = 10)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(local.toSeq == dist.toSeq)
    // and on a tie-heavy toy corpus (tie-break order is the risky part)
    val toy = Seq("ab ab ba ba", "cd cd dc dc").toDF("text")
    val d2 = TextOps.bpeTrainMerges(toy, steps = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val l2 = TextOps.bpeTrainMergesLocal(toy, steps = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(l2.toSeq == d2.toSeq)
  }

  test("bpeTrainMergesLocal: hundreds of steps stay fast and consistent") {
    val corpus = Tables.documents(spark, sf())
    val t0 = System.nanoTime()
    val m = TextOps.bpeTrainMergesLocal(corpus, steps = 300)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val secs = (System.nanoTime() - t0) / 1e9
    // the tiny-SF vocabulary fully merges before 300 steps — exhaustion
    // (no pairs left) is the correct stop, same as the distributed loop
    assert(m.length >= 100 && m.length <= 300)
    m.sliding(2).foreach {
      case Array(x, y) => assert(x._4 >= y._4)
      case _ => ()
    }
    // the distributed loop would spend ~60 s of job latency on this many
    // steps; the local loop must be well under that even on a cold JVM
    assert(secs < 30.0, s"local trainer took $secs s for 300 steps")
    // maxVocab cap keeps determinism
    val capped = TextOps.bpeTrainMergesLocal(corpus, steps = 5, maxVocab = 50)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val capped2 = TextOps.bpeTrainMergesLocal(
      corpus.repartition(5), steps = 5, maxVocab = 50)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(capped.toSeq == capped2.toSeq)
  }

  test("bpeEncode: applies learned merges greedily, words independent") {
    val corpus = Seq("low low low", "lower lower").toDF("text")
    val m = TextOps.bpeTrainMerges(corpus, steps = 4)
      .orderBy("step").as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    // merges: (l,o) (lo,w) (low,</w>) (e,r)
    val toks = Seq("low lower", "", "newest").toDF("text")
      .select(TextOps.bpeEncodeTokens(col("text"), m).as("t"))
      .as[Seq[String]].collect()
    assert(toks(0) == Seq("low</w>", "low", "er", "</w>"))
    assert(toks(1).isEmpty)
    // unseen word gets only the merges that apply (none here: no adjacent
    // e-r, no l-o)
    assert(toks(2) == Seq("n", "e", "w", "e", "s", "t", "</w>"))
  }

  test("bpeEncode: native expression bit-identical to the declarative chain") {
    val corpus = Tables.documents(spark, sf())
    val m = TextOps.bpeTrainMerges(corpus, steps = 8)
      .orderBy("step").as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    // real docs plus adversarial rows: empties, runs of spaces, multi-byte
    // code points incl. beyond-BMP (surrogate pairs), repeated merge targets
    val edge = Seq("", " ", "   ", "a  b", "aaaa aaaa", "𝕏x 𝕏𝕏", "löw löwer",
      "的是 的的是", "low low low lower").toDF("text")
    Seq(corpus.select(col("text")), edge).foreach { df =>
      val diff = df.select(
        TextOps.bpeEncode(col("text"), m).as("nat"),
        TextOps.bpeEncodeDeclarative(col("text"), m).as("dec"))
        .filter(col("nat") =!= col("dec") ||
          col("nat").isNull =!= col("dec").isNull)
      assert(diff.count() == 0)
    }
  }

  test("bpeVocab: dense deterministic ids — base code points, terminal, merges") {
    val corpus = Seq("low low low", "lower lower").toDF("text")
    val m = TextOps.bpeTrainMergesLocal(corpus, steps = 4)
      .orderBy("step").as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    val v = TextOps.bpeVocab(corpus, m)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(v.map(_._2).toSeq ==
      Seq("e", "l", "o", "r", "w", "</w>", "lo", "low", "low</w>", "er"))
    assert(v.map(_._1).toSeq == (0L until v.length).map(_.toLong).toSeq)
    assert(v.count(_._3 == "base") == 6 && v.count(_._3 == "merge") == 4)
  }

  test("property: native encode ≡ declarative chain and local ≡ distributed " +
      "trainer on seeded random corpora") {
    val r = new scala.util.Random(20260813L)
    // words stress every boundary class: a tight ASCII core (so merges
    // actually repeat), salted with 2-byte (é), 3-byte (白) and beyond-BMP
    // surrogate-pair (𝕏) code points
    def randWord(): String = {
      val sb = new StringBuilder
      val n = 1 + r.nextInt(6)
      var i = 0
      while (i < n) {
        sb.append(('a' + r.nextInt(5)).toChar)
        if (r.nextInt(10) == 0) sb.append("é")
        if (r.nextInt(10) == 0) sb.append("白")
        if (r.nextInt(12) == 0) sb.append("𝕏")
        i += 1
      }
      sb.toString
    }
    def randDoc(): String = {
      val n = r.nextInt(12)
      (1 to n).map(_ => randWord()).mkString(
        if (r.nextBoolean()) " " else "  ") +
        (if (r.nextInt(4) == 0) " " else "")
    }
    (1 to 6).foreach { round =>
      val corpus = (1 to 120).map(_ => randDoc()).toDF("text")
      val steps = 1 + r.nextInt(8)
      val dist = TextOps.bpeTrainMerges(corpus, steps)
        .as[(Long, String, String, Long)].collect().sortBy(_._1)
      val local = TextOps.bpeTrainMergesLocal(corpus, steps)
        .as[(Long, String, String, Long)].collect().sortBy(_._1)
      assert(local.toSeq == dist.toSeq,
        s"round $round: trainers diverge\nd=${dist.toSeq}\nl=${local.toSeq}")
      val m = dist.map(t => (t._2, t._3)).toSeq
      val probe = ((1 to 80).map(_ => randDoc()) ++ Seq("", " ", "𝕏 𝕏𝕏"))
        .toDF("text")
      val diff = probe.select(
        TextOps.bpeEncode(col("text"), m).as("nat"),
        TextOps.bpeEncodeDeclarative(col("text"), m).as("dec"))
        .filter(col("nat") =!= col("dec")).collect()
      assert(diff.isEmpty,
        s"round $round: encode diverges on ${diff.take(2).mkString(" | ")}")
    }
  }

  test("bigramLogProb: conditional MLE per doc, short docs excluded") {
    // c12: (a,b)=3 (b,a)=1 (b,c)=1; first-position marginals: a=3, b=2
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLogProb(df)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // 1-token doc has no bigrams
    assert(out(0)._2 == 3L && out(1)._2 == 2L)
    // doc 1: ln(3/3) + ln(1/2) + ln(3/3) over 3; doc 2: ln(3/3) + ln(1/2) over 2
    assert(out(0)._3 == r4(math.log(0.5) / 3))
    assert(out(1)._3 == r4(math.log(0.5) / 2))
    // deterministic under repartitioning
    val again = TextOps.bigramLogProb(df.repartition(5))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
  }

  test("bpeEncodeIds: native ids pass ≡ encode→tokens→vocab lookup, " +
      "unknown symbols → -1 sentinel") {
    val corpus = Seq("low low low", "lower lower", "wide 𝕏ide").toDF("text")
    val m = TextOps.bpeTrainMergesLocal(corpus, steps = 6)
      .orderBy("step").as[(Long, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    val vocab = TextOps.bpeVocab(corpus, m)
      .select("symbol", "token_id").as[(String, Long)].collect().toSeq
    val vmap = vocab.toMap
    // probe includes corpus docs, empties, and a doc with code points the
    // vocabulary has never seen (→ -1, where an id join would drop them)
    val probe = Seq("low lower", "", "  ", "wide 𝕏ide low",
      "zebra? ünseen", "的是").toDF("text")
    val both = probe.select(
      TextOps.bpeEncodeIds(col("text"), m, vocab).as("ids"),
      TextOps.bpeEncodeTokens(col("text"), m).as("toks"))
      .as[(Seq[Long], Seq[String])].collect()
    both.foreach { case (ids, toks) =>
      assert(ids == toks.map(t => vmap.getOrElse(t, -1L)),
        s"ids $ids vs toks $toks")
    }
    assert(both(1)._1.isEmpty && both(2)._1.isEmpty)
    assert(both(4)._1.contains(-1L)) // genuinely-unknown code points
  }

  test("bpeEncode: zero merges = character symbols + terminal per word") {
    val toks = Seq("ab c").toDF("text")
      .select(TextOps.bpeEncodeTokens(col("text"), Nil).as("t"))
      .as[Seq[String]].collect()
    assert(toks(0) == Seq("a", "b", "</w>", "c", "</w>"))
  }

  test("bpeVocab: duplicate merged surfaces dedup to the lowest token_id") {
    // two merge paths surface the same string: (b,c)→bc then (a,bc)→abc,
    // and (a,b)→ab then (ab,c)→abc — without the dedup, a symbol→id join
    // would fan every "abc" occurrence into two rows
    val corpus = Seq("abc abc").toDF("text")
    val dupMerges = Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c"))
    val v = TextOps.bpeVocab(corpus, dupMerges)
      .as[(Long, String, String)].collect().sortBy(_._1)
    // base: a b c </w> = ids 0..3; merges: bc=4, abc=5, ab=6, abc(dup, id 7)
    // dropped — first (lowest-id) occurrence wins
    assert(v.map(_._2).toSeq == Seq("a", "b", "c", "</w>", "bc", "abc", "ab"))
    assert(v.map(_._2).distinct.length == v.length)
    assert(v.find(_._2 == "abc").get._1 == 5L)
    assert(!v.map(_._1).contains(7L)) // the duplicate's id leaves a gap
  }

  test("bpeTrainMergesLocal: maxVocab caps the collected histogram " +
      "(top-N by count desc, word asc)") {
    // known histogram: aa×5 bb×4 cc×3 dd×2 ee×1 (+ad/bd tie fodder below)
    val corpus = Seq("aa aa aa aa aa", "bb bb bb bb", "cc cc cc", "dd dd", "ee")
      .toDF("text")
    // the capped trainer must behave EXACTLY like training on a corpus
    // containing only the top-2 words — proof the cap truncated the
    // driver-collected histogram, not just reordered it
    // 6 steps: the top-2 histogram exhausts after 4 merges (aa</w> and
    // bb</w> fully fused), while the uncapped histogram still has cc
    // pairs to learn — so the runs must diverge iff the cap bound
    val top2 = Seq("aa aa aa aa aa", "bb bb bb bb").toDF("text")
    val capped = TextOps.bpeTrainMergesLocal(corpus, steps = 6, maxVocab = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val onTop2 = TextOps.bpeTrainMergesLocal(top2, steps = 6, maxVocab = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(capped.toSeq == onTop2.toSeq)
    // and the cap genuinely bound: uncapped training sees cc/dd/ee too
    val uncapped = TextOps.bpeTrainMergesLocal(corpus, steps = 6, maxVocab = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(capped.toSeq != uncapped.toSeq)
    // count ties truncate word-ascending (UTF-8): ad and bd both ×2 —
    // maxVocab=1 over {ad×2, bd×2} keeps ad
    val tied = Seq("ad ad", "bd bd").toDF("text")
    val keptAd = TextOps.bpeTrainMergesLocal(tied, steps = 2, maxVocab = 1)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val onlyAd = TextOps.bpeTrainMergesLocal(Seq("ad ad").toDF("text"),
      steps = 2, maxVocab = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(keptAd.toSeq == onlyAd.toSeq)
  }

  test("minPairCount: both trainers stop at the same min-frequency floor") {
    // pair counts: (a,a)=5 then (aa,</w>)=5, (b,b)=4, (bb,</w>)=4, then
    // cc-family at 3 — a floor of 4 must stop both trainers after 4 merges
    val corpus = Seq("aa aa aa aa aa", "bb bb bb bb", "cc cc cc").toDF("text")
    val dist = TextOps.bpeTrainMerges(corpus, steps = 10, minPairCount = 4L)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val local = TextOps.bpeTrainMergesLocal(corpus, steps = 10,
      minPairCount = 4L)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(dist.length == 4 && dist.forall(_._4 >= 4L))
    assert(local.toSeq == dist.toSeq)
    // default floor of 1 = merge to exhaustion (prior behavior unchanged)
    val full = TextOps.bpeTrainMergesLocal(corpus, steps = 10)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(full.length > 4 && full.take(4).toSeq == local.toSeq)
  }

  test("bpeTrainMergesLocal: the default cap is finite and a no-op below it") {
    assert(TextOps.DefaultMaxVocab == (1 << 20))
    val corpus = Seq("low low low", "lower lower").toDF("text")
    val default = TextOps.bpeTrainMergesLocal(corpus, steps = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val optOut = TextOps.bpeTrainMergesLocal(corpus, steps = 4, maxVocab = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(default.toSeq == optOut.toSeq)
  }

  test("unicodeNormalize: NFC composes, NFKC folds compatibility forms") {
    def norm(s: String, form: String): String =
      Seq(s).toDF("text")
        .select(TextOps.unicodeNormalize(col("text"), form)).as[String].head()
    assert(norm("é", "NFC") == "é") // e + combining acute → é
    assert(norm("é", "NFD") == "é")
    assert(norm("ﬁ", "NFKC") == "fi") // ﬁ ligature
    assert(norm("ascii stays", "NFC") == "ascii stays")
    // agrees with java.text.Normalizer on mixed content
    val s = "näive ﬃx é́"
    assert(norm(s, "NFKC") ==
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
  }

  test("cleanText: NFC + control strip + whitespace collapse + trim, idempotent") {
    def clean(s: String): String =
      Seq(s).toDF("text")
        .select(TextOps.cleanText(col("text"))).as[String].head()
    assert(clean("  a \u0007 b\t\tć  ") == "a b ć")
    assert(clean("a\u0000b") == "ab")
    assert(clean("plain text") == "plain text")
    val once = clean("  é\u0007  x \t y ")
    assert(clean(once) == once) // idempotent: a second pass is a no-op
  }

  test("backoffLogProb: every backoff level fires with hand-computed " +
      "values; short batch docs are excluded") {
    val train = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val batch = Seq((100L, "a b c x b d"), (101L, "a b")).toDF("doc_id", "text")
    val out = TextOps.backoffLogProb(train, batch)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    // train counts: c123 abc/bca/cab/abd=1; c12 ab=2,bc=1,ca=1;
    // c23 ab=2,bc=1,ca=1,bd=1; c2 a=2,b=2,c=1; uni a=2,b=2,c=1,d=1; N=6 V=4
    // batch trigrams: (a,b,c) seen -> ln(1/2)
    //   (b,c,x): tri+bi unseen, x unseen        -> ln(.16 * 1/10)
    //   (c,x,b): tri+bi unseen, b seen (c3=2)   -> ln(.16 * 3/10)
    //   (x,b,d): tri unseen, bigram bd=1, c2[b]=2 -> ln(.4 * 1/2)
    val lps = Seq(math.log(1.0 / 2),
      math.log(0.4 * 0.4 * (1.0 / 10)),
      math.log(0.4 * 0.4 * (3.0 / 10)),
      math.log(0.4 * (1.0 / 2)))
    val expect = BigDecimal(lps.sum / lps.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = TextOps.backoffLogProb(train, batch)
      .filter(col("doc_id") === 100L)
      .as[(Long, Long, Double)].head()
    assert(row._2 == 4L, s"expected 4 trigrams, got ${row._2}")
    assert(row._3 == expect, s"avg_logprob ${row._3} != $expect")
    assert(!out.contains(101L), "a 2-token doc carries no trigrams")
  }

  test("bm25TopK: matches a local reference ranking, micro-exact") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana banana"),
      (3L, "apple apple apple apple apple apple apple apple"),
      (4L, "cherry plum grape kiwi mango lime fig date pear peach"),
      (5L, "plum grape")).toDF("doc_id", "text")
    val terms = Seq("apple", "banana")
    val out = TextOps.bm25TopK(docs, terms, k = 3)
      .select("doc_id", "n_hit", "score_micro", "rk")
      .as[(Long, Int, Long, Int)].collect().sortBy(_._4)
    // local reference: same formula, same micro-rounding
    val corpus = Map(1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "banana", "banana"),
      3L -> Seq.fill(8)("apple"),
      4L -> "cherry plum grape kiwi mango lime fig date pear peach".split(" ").toSeq,
      5L -> Seq("plum", "grape"))
    val n = corpus.size.toLong
    val avgdl = corpus.values.map(_.size.toLong).sum.toDouble / n
    def score(toks: Seq[String]): Long = terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      val df = corpus.values.count(_.contains(t)).toLong
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      math.round(idf * (tf * (1.2 + 1)) /
        (tf + 1.2 * (0.25 + 0.75 * (toks.size / avgdl))) * 1e6)
    }.sum
    val expect = corpus.toSeq
      .map { case (id, toks) => (id, score(toks)) }
      .sortBy { case (id, s) => (-s, id) }.take(3)
    assert(out.map(t => (t._1, t._3)).toSeq == expect)
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
    // n_hit counts present terms; zero-hit docs score exactly 0
    assert(out.head._2 >= 1)
    val all = TextOps.bm25TopK(docs, terms, k = 5)
      .select("doc_id", "n_hit", "score_micro")
      .as[(Long, Int, Long)].collect()
    val doc4 = all.find(_._1 == 4L).get
    assert(doc4._2 == 0 && doc4._3 == 0L)
    // partition-invariant
    val again = TextOps.bm25TopK(docs.repartition(7), terms, k = 3)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toSet
    assert(again == out.map(t => (t._1, t._3)).toSet)
  }

  test("pmiBigrams: hand-computed PMI on a planted collocation, floor " +
      "excludes rare pairs, ranking deterministic") {
    // "strong coffee" always collocates; "weak" pairs stay under the floor
    val docs = (1L to 6L).map(i => (i, "strong coffee is good and " +
        "strong coffee is cheap")) :+
      (7L, "weak tea is rare")
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.pmiBigrams(df, topN = 5, minCount = 6)
      .orderBy("rk")
      .select("w1", "w2", "n_pair", "pmi", "rk")
      .as[(String, String, Long, Double, Int)].collect()
    // corpus: 6 docs x 9 tokens + 4 = 58 tokens, 6 x 8 + 3 = 51 bigrams
    // "strong coffee" occurs 12x; c(strong) = c(coffee) = 12
    val t = 58.0; val b = 51.0
    val expectSC = BigDecimal(math.log(12.0 * t * t / (b * 12.0 * 12.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sc = out.find(r => r._1 == "strong" && r._2 == "coffee").get
    assert(sc._3 == 12L)
    assert(math.abs(sc._4 - expectSC) < 1e-9, s"pmi ${sc._4} vs $expectSC")
    // the floor excludes everything from the 1-occurrence doc
    assert(!out.exists(r => r._1 == "weak" || r._2 == "tea"))
    // every surviving pair occurs >= 6 times; ranks are 1..n
    assert(out.forall(_._3 >= 6L))
    assert(out.map(_._5).toSeq == (1 to out.length))
    // partition-invariant
    val again = TextOps.pmiBigrams(df.repartition(5), topN = 5,
        minCount = 6)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect().toSet
    assert(again == out.map(r => (r._1, r._2, r._4)).toSet)
  }
  test("langIdFrom: weighted sums decide, profile order breaks ties, " +
      "the artifact pin swaps verdicts") {
    import spark.implicits._
    val profiles = Seq(
      "en" -> Seq("the" -> 4L, "and" -> 3L),
      "de" -> Seq("der" -> 4L, "und" -> 3L))
    val df = Seq(
      (1L, "the cat und der hund"),   // en 4 vs de 7 -> de
      (2L, "the the and x"),          // en 11 vs de 0 -> en
      (3L, "no markers at all"),      // 0 vs 0 tie -> first profile
      (4L, "und der der")             // de 11 -> de
    ).toDF("id", "text")
    val out = df.select($"id",
        graft.functions.TextOps.langIdFrom($"text", profiles).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "de" && out(2L) == "en" && out(4L) == "de")
    assert(out(3L) == "en", "an all-zero tie must pick the first profile")
    // the artifact path: two pinned versions resolve differently
    val dir = java.nio.file.Files.createTempDirectory("langid_spec").toString
    val v1 = graft.functions.LangProfileStore.save(dir, profiles.take(1))
    val v2 = graft.functions.LangProfileStore.save(dir, profiles)
    val both = df.filter($"id" === 4L).select(
        graft.functions.TextOps.langIdFromArtifact($"text", dir, v1).as("a"),
        graft.functions.TextOps.langIdFromArtifact($"text", dir, v2).as("b"))
      .as[(String, String)].head()
    assert(both == (("en", "de")),
      "v1 has no de profile, v2 must re-classify the same text")
    // version 0 is invalid by the shared store convention
    val e = intercept[IllegalArgumentException](
      graft.functions.TextOps.langIdFromArtifact($"text", dir, 0))
    assert(e.getMessage.contains("version 0"))
  }

}
