package graft

import org.apache.spark.sql.functions._

import graft.functions.{HtmlExtract, TextOps}

/** The [[HtmlExtract]] contract on the cases the planted-wrapper oracle
  * cannot reach: malformed markup recovery, raw-text edge cases,
  * entity-decode boundaries, and the link-density rule at its margins.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String = HtmlExtract.extract(html)._1
  private def counts(html: String): (Int, Int) = {
    val (_, k, dr) = HtmlExtract.extract(html)
    (k, dr)
  }

  test("tags strip, blocks segment, inline tags concatenate") {
    assert(text("<p>one <b>two</b> three</p><div>four</div>")
      == "one two three\nfour")
    assert(text("a<br>b<br/>c") == "a\nb\nc")
    // h1..h6, li are boundaries; span/em are not
    assert(text("<h2>t</h2><ul><li>x</li><li><em>y</em>z</li></ul>")
      == "t\nx\nyz")
  }

  test("whitespace collapses per block; empty blocks vanish silently") {
    assert(text("<p>  a \n\t b  </p><p>   </p><p>c</p>") == "a b\nc")
    assert(counts("<p>  </p><p></p>") == ((0, 0)))
    assert(text("") == "")
  }

  test("comments, doctype and PIs are removed; unterminated comment " +
      "swallows the rest") {
    assert(text("<!DOCTYPE html><p>a<!-- <p>b</p> -->c</p>") == "ac")
    assert(text("<?xml version=\"1.0\"?><p>a</p>") == "a")
    assert(text("<p>a</p><!-- open forever <p>gone</p>") == "a")
  }

  test("raw-text elements drop with content; close tag is " +
      "case-insensitive; lookalike close tags inside don't end them") {
    assert(text("<p>a</p><script>if (1 < 2) say(\"</p><p>\")</script><p>b</p>")
      == "a\nb")
    assert(text("<style>p { x: y; }</style><p>a</p>") == "a")
    assert(text("<title>t</title><p>a</p>") == "a")
    assert(text("<SCRIPT>x</SCRIPT><p>a</p>") == "a")
    assert(text("<script>x</ScRiPt ><p>a</p>") == "a")
    // unterminated raw text swallows the rest (parse-error recovery)
    assert(text("<p>a</p><script>var x = 1; <p>gone</p>") == "a")
  }

  test("quoted attribute values may contain '>' and '<'") {
    assert(text("<p data-x=\"a > b\">c</p>") == "c")
    assert(text("<p data-x='1 < 2'>c</p>") == "c")
    assert(text("<a href=\"/x?a=1&b=2\">t</a><p>c</p>") == "c")
  }

  test("stray '<' not opening a tag is literal text") {
    assert(text("<p>1 < 2 and 3 <= 4</p>") == "1 < 2 and 3 <= 4")
    assert(text("<p>ends with <</p>") == "ends with <")
  }

  test("character references decode AFTER structure; unknown and bare " +
      "ampersands stay literal") {
    assert(text("<p>&lt;p&gt;not a tag&lt;/p&gt;</p>") == "<p>not a tag</p>")
    assert(text("<p>&amp;&quot;&apos;</p>") == "&\"'")
    assert(text("<p>A&#66;&#x43;&#X44;</p>") == "ABCD")
    assert(text("<p>&nbsp;a&nbsp;</p>") == "a", "nbsp is collapsible space")
    assert(text("<p>&bogus; &amp &#; &#xZZ; & x</p>")
      == "&bogus; &amp &#; &#xZZ; & x")
    // astral-plane numeric reference
    assert(text("<p>&#128512;</p>") == new String(Character.toChars(128512)))
  }

  test("link-density boilerplate: majority-anchor blocks drop, " +
      "half-anchor blocks survive") {
    // all-anchor nav: dropped
    assert(counts("<nav><a href=\"/\">Home</a> <a href=\"/b\">B</a></nav>" +
      "<p>kept text</p>") == ((1, 1)))
    // exactly half anchored (4 of 8 non-ws chars): 2*4 > 8 is false — kept
    assert(counts("<p><a>abcd</a> efgh</p>") == ((1, 0)))
    // majority anchored: dropped
    assert(counts("<p><a>abcde</a> efgh</p>") == ((0, 1)))
    // a stray close before any open is clamped, never negative
    assert(counts("</a><p><a><a>x</a>y</a>z w1</p>") == ((1, 0)))
  }

  test("a new <a> implicitly closes an open one (WHATWG a-in-body): " +
      "one unclosed anchor can't poison the rest of the document") {
    // old depth-counting would mark 'three real text' as anchor text
    // (depth stuck at 1 after the single </a>) and drop the block
    assert(text("<p><a href=/1>one <a href=/2>two</a> three real text</p>")
      == "one two three real text")
    // the unclosed-anchor document shape: later blocks stay clean
    assert(text("<p><a href=/x>broken link" +
      "</p><p>full article paragraph text</p>")
      == "full article paragraph text")
  }

  test("a trailing / before > is ignored (WHATWG): <a/> opens an " +
      "anchor, unquoted hrefs ending in / can't defeat the " +
      "boilerplate rule") {
    // '<a .../>' opens the anchor; its text is all anchor chars ->
    // the link-furniture block drops
    assert(counts("<p><a href=\"x\"/>t u v w</p>") == ((0, 1)))
    // the real-world shape: an UNQUOTED href whose value ends in '/'
    assert(counts("<p><a href=http://spam.example/>Read more</a></p>")
      == ((0, 1)))
    // '<script/>' opens script raw text: its content is DATA, not text
    assert(text("<p>ok</p><script/>if(x){render()}</script>") == "ok")
  }

  test("raw text ends only at the MATCHING close tag: a longer tag " +
      "name is content, not a terminator") {
    assert(text("<p>a</p><script>s=\"</scripts>\";f()</script><p>b</p>")
      == "a\nb")
    // whitespace and '/' after the name do close it
    assert(text("<p>a</p><style>x</style ><p>b</p>") == "a\nb")
  }

  test("abruptly-closed comments <!--> and <!---> are complete " +
      "(WHATWG), not document-swallowing") {
    assert(text("<p>before</p><!--><p>after</p>") == "before\nafter")
    assert(text("<p>before</p><!---><p>after</p>") == "before\nafter")
    assert(text("<p>a<!-- normal --->b</p>") == "ab")
    // genuinely unterminated still swallows
    assert(text("<p>a</p><!-- open<p>never</p>") == "a")
  }

  test("numeric refs to NUL, surrogates and past U+10FFFF are " +
      "consumed as U+FFFD; negatives stay literal") {
    assert(text("<p>a&#xD800;b</p>") == "a�b")
    assert(text("<p>a&#0;b</p>") == "a�b")
    assert(text("<p>a&#x110000;b</p>") == "a�b")
    assert(text("<p>a&#-5;b</p>") == "a&#-5;b")
  }

  test("the expression form matches the object form on a real doc") {
    val html = "<div><h1>T &amp; t</h1><p>body text here</p>" +
      "<p><a href=\"/m\">more</a></p></div>"
    val row = Seq(html).toDF("html")
      .select(TextOps.extractHtml(col("html")).as("e"))
      .select("e.text", "e.n_blocks", "e.n_dropped").head()
    val (t, k, dr) = HtmlExtract.extract(html)
    assert(row.getString(0) == t && t == "T & t\nbody text here")
    assert(row.getInt(1) == k && k == 2)
    assert(row.getInt(2) == dr && dr == 1)
    // null html -> null struct, never a throw
    assert(Seq[Option[String]](None).toDF("html")
      .select(TextOps.extractHtml(col("html")).as("e")).head().isNullAt(0))
  }

  test("hyphenated custom elements are their own tags (WHATWG " +
    "tag-name state): <p-foo> is not a block, <a-card> not an anchor") {
    // '<p-x>' must not flush a block; '<a-card>' must not count its
    // text as anchor text for the boilerplate rule
    val (t, k, _) = graft.functions.HtmlExtract.extract(
      "<div>a<p-x>b</p-x>c</div>")
    assert(t == "abc" && k == 1)
    val (t2, k2, dr2) = graft.functions.HtmlExtract.extract(
      "<p><a-card href='/x'>all of this text stays body</a-card></p>")
    assert(t2 == "all of this text stays body" && k2 == 1 && dr2 == 0)
  }
}
