package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** [[graft.functions.ScriptCountsExpr]] vs the declarative per-script
  * `regexp_replace` length deltas it replaced — must be bit-identical on
  * every range, because the DuckDB oracles recompute the declarative
  * form (and the langid/profile verdict ladders compare the counts).
  */
class ScriptCountsSpec extends SparkSpec {
  import spark.implicits._

  private def inRange(c: Column, lo: Char, hi: Char): Column =
    (length(c) - length(regexp_replace(c, s"[$lo-$hi]", ""))).cast("long")

  private val texts = Seq(
    "plain ascii text with UPPER and lower",
    "漢字文書かな mixed 한국어 and latin",
    "อักษรไทย देवनागरी кириллица مرحبا بالعالم",
    "", // empty
    " \t\n\f\r ", // every Java \s char
    "  　", // unicode spaces — NOT Java non-unicode \s
    "boundary 一鿿぀ヿ가힣฀๿" +
      "ऀॿЀӿ؀ۿ", // exact range endpoints
    "outside ䷿ꀀ〿㄀꯿힤෿຀" +
      "ࣿঀϿԀ׿܀", // one past each endpoint
    "supplementary 😀 𠀀 emoji and CJK-ext-B", // no BMP class may match
    "ＡＢＣ full-width latin does not count", // U+FF21.. not in A-Z
    ("กขค ลิง" * 40) + " tail",
    "digits 0123456789 punct !?")

  test("script_counts is bit-identical to the regexp length-delta form") {
    val t = col("text")
    val sc = TextOps.scriptCounts(t)
    val rows = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"),
        sc.getField("n_chars") - length(t).cast("long"),
        sc.getField("n_latin") -
          (inRange(t, 'A', 'Z') + inRange(t, 'a', 'z')),
        sc.getField("n_han") - inRange(t, '一', '鿿'),
        sc.getField("n_kana") - inRange(t, '぀', 'ヿ'),
        sc.getField("n_hangul") - inRange(t, '가', '힣'),
        sc.getField("n_thai") - inRange(t, '฀', '๿'),
        sc.getField("n_devanagari") - inRange(t, 'ऀ', 'ॿ'),
        sc.getField("n_cyrillic") - inRange(t, 'Ѐ', 'ӿ'),
        sc.getField("n_arabic") - inRange(t, '؀', 'ۿ'),
        sc.getField("n_nonws") -
          length(regexp_replace(t, "\\s+", "")).cast("long"))
      .collect()
    rows.foreach { r =>
      (1 until r.length).foreach { f =>
        assert(r.getLong(f) == 0L,
          s"text ${r.getLong(0)} field $f delta ${r.getLong(f)}")
      }
    }
  }

  test("combined cjk class [han+kana] equals the fused sum") {
    val t = col("text")
    val sc = TextOps.scriptCounts(t)
    val rows = texts.toDF("text")
      .select((sc.getField("n_han") + sc.getField("n_kana")) -
        (length(t) - length(regexp_replace(t, "[一-鿿぀-ヿ]", "")))
          .cast("long"))
      .as[Long].collect()
    assert(rows.forall(_ == 0L))
  }

  test("script_counts of null text is null (UnaryExpression null contract)") {
    val out = Seq[(Long, Option[String])]((1L, None)).toDF("id", "text")
      .select(TextOps.scriptCounts(col("text")).getField("n_chars"))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("n_stop_<i> is bit-identical to the translate length-delta form") {
    // the pretrain gates' actual sets plus adversarial ones: duplicates
    // in the matching string (translate's dict keeps the first — counts
    // only need membership), a set whose chars are also script-classed
    // (kana: membership must be independent of the script chain), an
    // empty set, and a supplementary-plane set member
    val sets = Seq(Queries.CjkMainFixture.jaStopChars.mkString,
      "กขอ", "ああかか", "", "😀a")
    val t = col("text")
    val sc = TextOps.scriptCounts(t, stopSets = sets)
    val deltas = sets.zipWithIndex.map { case (set, i) =>
      sc.getField(s"n_stop_$i") -
        (length(t) - length(translate(t, set, ""))).cast("long")
    }
    val rows = (texts :+ "stop chars は が を の に と した😀")
      .toDF("text").select(deltas: _*).collect()
    rows.foreach { r =>
      (0 until r.length).foreach { f =>
        assert(r.getLong(f) == 0L, s"set $f delta ${r.getLong(f)}")
      }
    }
  }

  test("script fields are unchanged by stopSets; whole-stage codegen holds") {
    val t = col("text")
    val plain = TextOps.scriptCounts(t)
    val withSets = TextOps.scriptCounts(t, stopSets = Seq("abc"))
    val rows = texts.toDF("text")
      .select((plain.getField("n_chars") - withSets.getField("n_chars")) +
        (plain.getField("n_nonws") - withSets.getField("n_nonws")) +
        (plain.getField("n_kana") - withSets.getField("n_kana")))
      .as[Long].collect()
    assert(rows.forall(_ == 0L))
    // the projection must STAY inside WholeStageCodegen (the expression
    // is no longer CodegenFallback) — the ingest-gate scan fusion claim.
    // A Range input, not a LocalRelation: local rows constant-fold into
    // a LocalTableScan and nothing would be code-generated either way
    val tl = typedlit(texts)
    val df = spark.range(texts.size)
      .select(TextOps.scriptCounts(
        element_at(tl, (col("id") + 1).cast("int"))).getField("n_latin"))
    // the `*(n)` operator prefix IS the WholeStageCodegen span marker in
    // the simple plan string — a fallback expression would print a bare
    // `Project` outside any span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"script_counts projection fell out of codegen:\n$plan")
    df.collect() // and the generated code must actually run
  }
}
