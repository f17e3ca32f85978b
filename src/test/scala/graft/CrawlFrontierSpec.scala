package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HtmlLinks, RobotsOps, SitemapParse, UrlOps}

/** The crawl-discovery primitives: link extraction, RFC 3986 reference
  * resolution, robots directives, sitemap parsing.
  */
class CrawlFrontierSpec extends AnyFunSuite {

  // ------------------------------------------------------ url_resolve

  /** RFC 3986 §5.4.1 normal examples, against the spec's own base. */
  test("resolveRef matches every RFC 3986 §5.4.1 normal example") {
    val base = "http://a/b/c/d;p?q"
    val vectors = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    vectors.foreach { case (ref, want) =>
      assert(UrlOps.resolveRef(base, ref) == want, s"ref=$ref")
    }
  }

  /** §5.4.2 abnormal examples — strict-parser column. */
  test("resolveRef matches every RFC 3986 §5.4.2 abnormal example") {
    val base = "http://a/b/c/d;p?q"
    val vectors = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      "http:g" -> "http:g") // strict parser, per the spec's note
    vectors.foreach { case (ref, want) =>
      assert(UrlOps.resolveRef(base, ref) == want, s"ref=$ref")
    }
  }

  test("resolveRef: relative base is NULL; empty-path base merges at root") {
    assert(UrlOps.resolveRef("/b/c", "g") == null)
    assert(UrlOps.resolveRef("http://h", "g") == "http://h/g")
    assert(UrlOps.resolveRef("http://h?q=1", "g") == "http://h/g")
    assert(UrlOps.resolveRef("http://h/x", "mailto:u@e.com") ==
      "mailto:u@e.com")
  }

  // ------------------------------------------------------- html_links

  test("htmlLinks extracts hrefs in document order with entity decode") {
    val html = "<html><head><base href='/b/'><base href='/ignored/'>" +
      "<script>var s = '<a href=\"/not-a-link\">';</script></head>" +
      "<body><a href=\"/x?a=1&amp;b=2\">one</a>" +
      "<A HREF='two.html'>two</A>" +
      "<a name=anchor>no href</a>" +
      "<a data-x=\"y>z\" href=unquoted/3>three</a>" +
      "<!-- <a href='/commented'>out</a> -->" +
      "<a href=\"  ./sp&#97;ced\t\">four</a></body></html>"
    val (base, links) = HtmlLinks.links(html)
    assert(base == "/b/")
    assert(links.toSeq == Seq("/x?a=1&b=2", "two.html", "unquoted/3",
      "./spaced"))
  }

  test("htmlLinks: hyphenated custom elements are neither anchors " +
    "nor base (WHATWG tag-name state)") {
    // '<a-card href>' must not emit a link; '<base-select href>' must
    // not hijack the base used to resolve every relative link
    val (base, links) = HtmlLinks.links(
      "<base-select href=\"https://evil.example/\">" +
        "<a-card href=\"/internal\">x</a-card>" +
        "<a href=\"/real\">r</a>")
    assert(base == null)
    assert(links.toSeq == Seq("/real"))
  }

  test("htmlLinks: empty href is a link, raw-text and comments are not") {
    val (base, links) = HtmlLinks.links(
      "<a href=''>self</a><style>a{content:'<a href=/s>'}</style>" +
        "<textarea><a href='/t'></textarea><a href='/real'>r</a>")
    assert(base == null)
    assert(links.toSeq == Seq("", "/real"))
  }

  test("pageMeta: first canonical link wins, rel token list and meta " +
    "robots content list are case/comma tolerant, comments inert") {
    val HtmlLinks.PageMeta(c1, n1, _, _) = HtmlLinks.pageMeta(
      "<link rel='stylesheet' href='/s.css'>" +
        "<LINK REL='Alternate Canonical' HREF='/canon?a=1&amp;b=2'>" +
        "<link rel=canonical href=/second>" +
        "<meta name=viewport content='width=1'>")
    assert(c1 == "/canon?a=1&b=2" && !n1)
    val HtmlLinks.PageMeta(c2, n2, _, _) = HtmlLinks.pageMeta(
      "<meta name=' Robots ' content='NOFOLLOW, NoIndex'>" +
        "<!-- <link rel=canonical href=/commented> -->" +
        "<script>var x = \"<link rel=canonical href=/js>\"</script>")
    assert(c2 == null && n2)
    // 'none' is the noindex+nofollow shorthand; rel without href and
    // canonical with EMPTY href contribute nothing
    val HtmlLinks.PageMeta(c3, n3, _, _) = HtmlLinks.pageMeta(
      "<meta name=robots content=none><link rel=canonical>" +
        "<link rel=canonical href=''>")
    assert(c3 == null && n3)
    // an unrelated meta (description) never sets noindex
    val HtmlLinks.PageMeta(c4, n4, _, _) = HtmlLinks.pageMeta(
      "<meta name=description content='noindex talk'>" +
        "<link rel=canonical href='/ok'>")
    assert(c4 == "/ok" && !n4)
  }

  test("pageMeta: meta-refresh grammar — integer seconds, ;/, " +
      "separators, optional case-insensitive url= and quotes; a " +
      "url-less refresh is a self-reload, not a redirect") {
    def r(html: String) = {
      val m = HtmlLinks.pageMeta(html)
      (m.refreshSecs, m.refreshUrl)
    }
    assert(r("<meta http-equiv=refresh content='0; url=/next'>") ==
      (0, "/next"))
    assert(r("<meta HTTP-EQUIV='Refresh' content='3;URL=\"b\"'>") ==
      (3, "b"))
    assert(r("<meta http-equiv=refresh content='5, url = /c'>") ==
      (5, "/c"))
    // bare URL after the separator (no url=) is legal
    assert(r("<meta http-equiv=refresh content='2;/bare'>") ==
      (2, "/bare"))
    // a bare URL that merely STARTS with the letters 'url' (no '='):
    // WHATWG jumps back to parse with the WHOLE remainder as the URL
    assert(r("<meta http-equiv=refresh content='2;urlencoded.html'>") ==
      (2, "urlencoded.html"))
    // fractional seconds truncate; first refresh wins
    assert(r("<meta http-equiv=refresh content='1.9;url=/f'>" +
      "<meta http-equiv=refresh content='0;url=/second'>") ==
      (1, "/f"))
    // self-reload, bad grammar, and empty url contribute nothing
    assert(r("<meta http-equiv=refresh content='30'>") == (-1, null))
    assert(r("<meta http-equiv=refresh content='x; url=/n'>") ==
      (-1, null))
    assert(r("<meta http-equiv=refresh content='3; url='>") ==
      (-1, null))
    // refresh and canonical/robots coexist in one pass
    val m = HtmlLinks.pageMeta(
      "<link rel=canonical href=/c>" +
        "<meta http-equiv=refresh content='0;url=/r'>" +
        "<meta name=robots content=noindex>")
    assert(m.canonical == "/c" && m.noindex &&
      m.refreshSecs == 0 && m.refreshUrl == "/r")
  }

  // ------------------------------------------------ robots directives

  test("directivesFor: named group shadows *, max delay, sitemaps global") {
    val txt =
      """Sitemap: http://s.com/a.xml
        |User-agent: graftbot
        |Crawl-delay: 2
        |Disallow: /x
        |Crawl-delay: 5.5
        |# comment Sitemap: http://s.com/not.xml
        |User-agent: *
        |Crawl-delay: 9
        |Disallow: /
        |Sitemap: http://s.com/b.xml
        |""".stripMargin
    val (delay, maps) = RobotsOps.directivesFor(txt, "GraftBot")
    assert(delay.contains(5.5))
    assert(maps == Seq("http://s.com/a.xml", "http://s.com/b.xml"))
  }

  test("directivesFor: named group without a delay yields None even " +
    "when * has one; invalid values ignored; * selected otherwise") {
    val txt =
      """User-agent: graftbot
        |Disallow: /x
        |Crawl-delay: fast
        |User-agent: *
        |Crawl-delay: 3
        |Disallow: /y
        |""".stripMargin
    assert(RobotsOps.directivesFor(txt, "graftbot")._1.isEmpty)
    assert(RobotsOps.directivesFor(txt, "otherbot")._1.contains(3.0))
    assert(RobotsOps.directivesFor("", "x") == (None, Seq()))
  }

  test("directivesFor: a delay line does not split a user-agent run " +
    "(the rulesFor run contract)") {
    // the delay is read while only agent-a is in the run; agent-b
    // joins the SAME group afterwards, so b gets the group's rules
    // but not a delay recorded before its membership
    val txt =
      """User-agent: a
        |Crawl-delay: 4
        |User-agent: b
        |Disallow: /x
        |""".stripMargin
    assert(RobotsOps.directivesFor(txt, "a")._1.contains(4.0))
    assert(RobotsOps.directivesFor(txt, "b")._1.isEmpty)
    // and the rules still bind both agents (run not split)
    assert(!RobotsOps.allowed(txt, "/x/1", "b"))
  }

  // ---------------------------------------------------- sitemap parse

  test("sitemap parse: urlset with loc/lastmod/priority and entities") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<!-- generated -->
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://e.com/a?x=1&amp;y=2</loc>
        |    <lastmod>2026-01-15</lastmod><priority>0.8</priority>
        |    <changefreq>daily</changefreq></url>
        |  <url><loc> http://e.com/b </loc></url>
        |</urlset>""".stripMargin
    val Right((kind, entries)) = SitemapParse.parse(xml)
    assert(kind == "urlset")
    assert(entries.length == 2)
    assert(entries(0).loc == "http://e.com/a?x=1&y=2")
    assert(entries(0).lastmod == "2026-01-15")
    assert(entries(0).priority == 0.8)
    assert(entries(1).loc == "http://e.com/b")
    assert(entries(1).lastmod == null && entries(1).priority == null)
  }

  test("sitemap parse: namespaced index, named rejections") {
    val Right((kind, entries)) = SitemapParse.parse(
      "<sm:sitemapindex xmlns:sm=\"x\"><sm:sitemap>" +
        "<sm:loc>http://e.com/s1.xml</sm:loc></sm:sitemap>" +
        "</sm:sitemapindex>")
    assert(kind == "sitemapindex" && entries.head.loc == "http://e.com/s1.xml")
    assert(SitemapParse.parse("<rss></rss>") == Left("sitemap:bad-root"))
    assert(SitemapParse.parse("<urlset><sitemap></sitemap></urlset>") ==
      Left("sitemap:bad-entry"))
    assert(SitemapParse.parse("<urlset><url><lastmod>x</lastmod></url>" +
      "</urlset>") == Left("sitemap:entry-missing-loc"))
    assert(SitemapParse.parse("<urlset><url><loc>u</loc>" +
      "<priority>1.5</priority></url></urlset>") ==
      Left("sitemap:bad-priority"))
    assert(SitemapParse.parse("<urlset><url><loc>u</loc>") ==
      Left("sitemap:malformed"))
    assert(SitemapParse.parse("<urlset></urlset>trailing") ==
      Left("sitemap:malformed"))
    val Right((emptyKind, emptyEntries)) = SitemapParse.parse("<urlset/>")
    assert(emptyKind == "urlset" && emptyEntries.isEmpty)
  }

  test("sitemap parse: extension subtrees (image/video blocks) skip " +
    "whole; strict decimal rejects Java-only numeric forms") {
    // a Google image-extension sitemap: nested children inside <url>
    val Right((_, entries)) = SitemapParse.parse(
      "<urlset><url><loc>http://e.com/</loc>" +
        "<image:image><image:loc>http://e.com/i.jpg</image:loc>" +
        "<image:caption>cap <b>x</b></image:caption></image:image>" +
        "<changefreq>daily</changefreq></url></urlset>")
    assert(entries.length == 1 && entries.head.loc == "http://e.com/")
    // hex-float / suffix forms must be bad-priority, not numbers
    assert(SitemapParse.parse("<urlset><url><loc>u</loc>" +
      "<priority>0x1.999ap-1</priority></url></urlset>") ==
      Left("sitemap:bad-priority"))
    assert(SitemapParse.parse("<urlset><url><loc>u</loc>" +
      "<priority>1f</priority></url></urlset>") ==
      Left("sitemap:bad-priority"))
    assert(SitemapParse.parse("<urlset><url><loc>u</loc>" +
      "<priority>.5</priority></url></urlset>").isRight)
    // crawl-delay: '7d' is lenient-ignored, not parsed as 7.0
    assert(RobotsOps.directivesFor(
      "User-agent: *\nCrawl-delay: 7d\nDisallow: /x\n", "b")._1.isEmpty)
  }

  test("sitemap parse: CDATA sections carry raw content (loc, skip, " +
    "and unterminated → malformed)") {
    // several real generators wrap <loc> in CDATA
    val Right((_, e1)) = SitemapParse.parse(
      "<urlset><url><loc><![CDATA[http://e.com/a?x=1&y=2]]></loc>" +
        "</url></urlset>")
    assert(e1.head.loc == "http://e.com/a?x=1&y=2") // raw, no entity pass
    // CDATA mixed with ordinary text on either side
    val Right((_, e2)) = SitemapParse.parse(
      "<urlset><url><loc>http://e.com/<![CDATA[p?a=1&b=2]]>#frag</loc>" +
        "</url></urlset>")
    assert(e2.head.loc == "http://e.com/p?a=1&b=2#frag")
    // CDATA inside a skipped extension subtree, content containing '>'
    val Right((_, e3)) = SitemapParse.parse(
      "<urlset><url><loc>u</loc><image:caption>" +
        "<![CDATA[a > b </fake>]]></image:caption></url></urlset>")
    assert(e3.head.loc == "u")
    // unterminated CDATA is structurally broken
    assert(SitemapParse.parse(
      "<urlset><url><loc><![CDATA[http://e.com/x</loc></url></urlset>") ==
      Left("sitemap:malformed"))
  }
}
