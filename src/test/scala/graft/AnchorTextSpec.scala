package graft

import graft.functions.HtmlExtract

/** [[HtmlExtract.anchors]] — the anchor-text capture riding the block
  * scanner: close semantics (explicit, implicit, block boundary),
  * href cleaning parity with the link scanner, decode/collapse rules.
  */
class AnchorTextSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def as(html: String): Seq[(String, String)] =
    HtmlExtract.anchors(html).map(a => (a.href, a.text))

  test("hrefs with decoded, collapsed text in document order") {
    assert(as("""<p><a href="/a">One  two</a> x <a href='/b'>&amp; three</a></p>""") ==
      Seq("/a" -> "One two", "/b" -> "& three"))
  }

  test("a new <a> implicitly closes the open one (WHATWG a-in-body)") {
    assert(as("""<a href="/a">first <a href="/b">second</a>""") ==
      Seq("/a" -> "first", "/b" -> "second"))
  }

  test("a block boundary bounds an unclosed anchor's text") {
    assert(as("""<a href="/a">head<div>tail</div>""") ==
      Seq("/a" -> "head"))
  }

  test("href-less anchors are targets, never links; image-only links " +
      "emit with empty text") {
    assert(as("""<a name="top">target text</a><a href="/i"><img src=x></a>""") ==
      Seq("/i" -> ""))
  }

  test("href cleaning matches HtmlLinks: entities decode, tab/newline " +
      "strip, edges trim") {
    val html = "<a href=\" /p?a=1&amp;b=2\t\">t</a>"
    assert(as(html) == Seq("/p?a=1&b=2" -> "t"))
    val (_, links) = graft.functions.HtmlLinks.links(html)
    assert(links.toSeq == Seq("/p?a=1&b=2"),
      "the two scanners must emit identical hrefs (they join)")
  }

  test("raw-text content cannot contribute anchors") {
    assert(as("""<script>var s='<a href="/no">x</a>';</script><a href="/yes">y</a>""") ==
      Seq("/yes" -> "y"))
  }

  test("anchorsWithBase: first <base href> wins, cleaned; absent → " +
      "null; capture-less scans ignore it") {
    val (b1, as1) = HtmlExtract.anchorsWithBase(
      "<base href=\" https://b.org/x/ \"><base href=\"https://c.org/\">" +
        "<a href=\"p\">t</a>")
    assert(b1 == "https://b.org/x/" && as1 == IndexedSeq(
      HtmlExtract.Anchor("p", "t")))
    assert(HtmlExtract.anchorsWithBase("<a href=\"p\">t</a>")._1 == null)
  }

  test("blocks() and extract() are unchanged by a capture-less scan") {
    val html = """<p><a href="/a">linky</a> words here</p><p>more</p>"""
    val bs = HtmlExtract.blocks(html)
    assert(bs.map(_.text) == IndexedSeq("linky words here", "more"))
    assert(bs.head.anchorChars == 5)
  }
}
