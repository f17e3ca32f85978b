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
}
