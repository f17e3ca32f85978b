package graft

import graft.functions.CharsetDecode

/** [[CharsetDecode]] beyond the planted-fixture oracle: the label
  * table, both label parsers' edge cases, the strict-UTF-8 validator's
  * rejection classes (overlong, surrogate, > U+10FFFF, truncation),
  * the five WHATWG-pinned windows-1252 positions the JDK leaves
  * undefined, precedence corners, and the replacement contract for
  * malformed units under a chosen charset.
  */
class CharsetDecodeSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def sniff(body: Array[Byte], ct: String = null) =
    CharsetDecode.sniffDecode(body, ct)

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---------------------------------------------------------- labels

  test("label table: WHATWG aliases collapse; unknown is None") {
    assert(CharsetDecode.normalizeLabel(" UTF-8 ").contains("utf-8"))
    assert(CharsetDecode.normalizeLabel("utf8").contains("utf-8"))
    assert(CharsetDecode.normalizeLabel("UTF-16").contains("utf-16le"))
    assert(CharsetDecode.normalizeLabel("utf-16be").contains("utf-16be"))
    for (l <- Seq("ISO-8859-1", "latin1", "l1", "US-ASCII", "cp1252",
        "x-cp1252", "iso-ir-100", "ibm819"))
      assert(CharsetDecode.normalizeLabel(l).contains("windows-1252"), l)
    assert(CharsetDecode.normalizeLabel("shift_jis").isEmpty)
    assert(CharsetDecode.normalizeLabel("koi8-r").isEmpty)
  }

  test("charset param: quotes, spaces, case, first-wins, absence") {
    assert(CharsetDecode.charsetParam("text/html; charset=utf-8")
      .contains("utf-8"))
    assert(CharsetDecode.charsetParam("text/html; CHARSET = \"UTF-8\" ")
      .contains("UTF-8"))
    assert(CharsetDecode.charsetParam("text/html; charset='latin1'; x=1")
      .contains("latin1"))
    assert(CharsetDecode.charsetParam("text/html; charset=a; charset=b")
      .contains("a"))
    assert(CharsetDecode.charsetParam("text/html").isEmpty)
    assert(CharsetDecode.charsetParam("text/html; charset=").isEmpty)
    // parameter-name boundary: a longer name CONTAINING 'charset'
    // must not donate a label
    assert(CharsetDecode.charsetParam(
      "text/html; internal-charset=sjis").isEmpty)
    assert(CharsetDecode.charsetParam(
      "text/html; xcharset=sjis; charset=utf-8").contains("utf-8"))
  }

  test("a UTF-16 label found by the META prescan is changed to UTF-8 " +
      "(WHATWG 13.2.3.2) — the label was READ as ASCII") {
    val (t, cs, m) =
      sniff("<meta charset=utf-16>ok".getBytes("US-ASCII"))
    assert(cs == "utf-8" && m == "meta")
    assert(t == "<meta charset=utf-16>ok")
    // the TRANSPORT label is not remapped: a header can legitimately
    // describe a BOM-less UTF-16 body
    val hdr = sniff("hé".getBytes("UTF-16LE"), "x; charset=utf-16")
    assert(hdr == (("hé", "utf-16le", "header")))
  }

  test("meta prescan: quoted + unquoted, case, the 1024-byte window") {
    assert(CharsetDecode.metaCharset(
      "<meta charset=\"windows-1252\">".getBytes("US-ASCII"))
      .contains("windows-1252"))
    assert(CharsetDecode.metaCharset(
      "<META CHARSET=utf-8>".getBytes("US-ASCII")).contains("utf-8"))
    assert(CharsetDecode.metaCharset(
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=iso-8859-1\">").getBytes("US-ASCII"))
      .contains("iso-8859-1"))
    // outside the window: ignored
    val far = (" " * 1024) + "<meta charset=utf-8>"
    assert(CharsetDecode.metaCharset(far.getBytes("US-ASCII")).isEmpty)
    // straddling the window boundary: the label is cut off by the
    // window (the '=' is byte 1023), never read past it
    val straddle = (" " * 1010) + "<meta charset=utf-8>"
    assert(CharsetDecode.metaCharset(straddle.getBytes("US-ASCII")).isEmpty)
    // a label whose TOKEN is cut mid-way by the window must not come
    // back as a partial ('utf' for 'utf-8' would NULL-reject the page)
    val cut = (" " * 1006) + "<meta charset=utf-8>more content after"
    assert(CharsetDecode.metaCharset(cut.getBytes("US-ASCII")).isEmpty)
    val (_, cs, m) = CharsetDecode.sniffDecode(
      cut.getBytes("US-ASCII"), null)
    assert(cs == "utf-8" && m == "valid-utf8",
      "a truncated meta label must fall through to sniffing")
  }

  test("prescan only reads <meta> tags: charset mentions in comments, " +
      "script bodies and text donate nothing") {
    def meta(s: String) = CharsetDecode.metaCharset(s.getBytes("US-ASCII"))
    assert(meta("<!-- charset=shift_jis --><meta charset=utf-8>")
      .contains("utf-8"),
      "a commented label must not shadow the real meta tag")
    assert(meta("<!-- <meta charset=shift_jis> --><meta charset=utf-8>")
      .contains("utf-8"),
      "a commented-OUT meta tag must not donate its label")
    assert(meta("<!-- <meta charset=shift_jis> -->plain body").isEmpty)
    // unterminated comment: everything after the opener is masked
    assert(meta("<!-- <meta charset=gbk> <meta charset=utf-8>").isEmpty)
    assert(meta("<script>var s = 'charset=koi8-r';</script>").isEmpty)
    assert(meta("documentation about charset=gbk parameters").isEmpty)
    assert(meta("<p>use charset=utf-8</p>").isEmpty,
      "an occurrence inside a non-meta tag's CONTENT is between tags")
    // the tag-name boundary: '<metadata charset=..' is NOT a meta tag
    assert(meta("<metadata charset=utf-8>").isEmpty)
    assert(meta("<meta/charset=utf-8>").contains("utf-8"),
      "'/' is a valid boundary after the tag name")
    // a comment-only shift_jis mention no longer NULL-rejects a page
    // whose body is plain valid UTF-8
    val page = "<!-- charset=shift_jis -->plain ascii body"
    val (t, cs, m) = CharsetDecode.sniffDecode(
      page.getBytes("US-ASCII"), null)
    assert(cs == "utf-8" && m == "valid-utf8" && t == page)
    // a REAL unsupported meta label still honestly rejects
    val (t2, cs2, m2) = CharsetDecode.sniffDecode(
      "<meta charset=shift_jis>body".getBytes("US-ASCII"), null)
    assert(t2 == null && cs2 == "shift_jis" && m2 == "unsupported-label")
  }

  test("the full WHATWG windows-1252 alias family is honored " +
      "(glibc's ANSI_X3.4-1968 included)") {
    for (l <- Seq("ansi_x3.4-1968", "iso88591", "iso_8859-1:1987",
        "csisolatin1", "cp819"))
      assert(CharsetDecode.normalizeLabel(l).contains("windows-1252"), l)
  }

  // ------------------------------------------------------ utf-8 DFA

  test("strict UTF-8: accepts ASCII, 2/3/4-byte, boundary codepoints") {
    assert(CharsetDecode.isValidUtf8("plain".getBytes("US-ASCII")))
    assert(CharsetDecode.isValidUtf8("é€𝄞".getBytes("UTF-8")))
    // U+07FF, U+0800, U+FFFF, U+10000, U+10FFFF
    assert(CharsetDecode.isValidUtf8(bytes(0xDF, 0xBF)))
    assert(CharsetDecode.isValidUtf8(bytes(0xE0, 0xA0, 0x80)))
    assert(CharsetDecode.isValidUtf8(bytes(0xEF, 0xBF, 0xBF)))
    assert(CharsetDecode.isValidUtf8(bytes(0xF0, 0x90, 0x80, 0x80)))
    assert(CharsetDecode.isValidUtf8(bytes(0xF4, 0x8F, 0xBF, 0xBF)))
  }

  test("strict UTF-8: rejects overlongs, surrogates, >U+10FFFF, " +
      "truncation, bare continuation") {
    assert(!CharsetDecode.isValidUtf8(bytes(0xC0, 0xAF))) // overlong /
    assert(!CharsetDecode.isValidUtf8(bytes(0xC1, 0xBF)))
    assert(!CharsetDecode.isValidUtf8(bytes(0xE0, 0x9F, 0xBF))) // overlong
    assert(!CharsetDecode.isValidUtf8(bytes(0xED, 0xA0, 0x80))) // surrogate
    assert(!CharsetDecode.isValidUtf8(bytes(0xF0, 0x8F, 0xBF, 0xBF))) // overlong
    assert(!CharsetDecode.isValidUtf8(bytes(0xF4, 0x90, 0x80, 0x80))) // >max
    assert(!CharsetDecode.isValidUtf8(bytes(0xF5, 0x80, 0x80, 0x80)))
    assert(!CharsetDecode.isValidUtf8(bytes(0xE2, 0x82))) // truncated
    assert(!CharsetDecode.isValidUtf8(bytes(0x97))) // bare continuation
    assert(!CharsetDecode.isValidUtf8(bytes(0x41, 0xFF)))
  }

  // -------------------------------------------------- windows-1252

  test("windows-1252: the 0x80-0x9F table incl. the five positions " +
      "WHATWG pins to C1 controls") {
    val (t, cs, m) = sniff(bytes(0x80, 0x81, 0x8D, 0x8F, 0x90, 0x9D,
      0x91, 0x92, 0x9F))
    assert(cs == "windows-1252" && m == "fallback")
    assert(t == "\u20AC\u0081\u008D\u008F\u0090\u009D\u2018\u2019\u0178")
  }

  test("windows-1252: latin-1 identity above 0x9F, ASCII below 0x80") {
    val (t, _, _) = sniff(bytes('A', 0xA0, 0xE9, 0xFF))
    assert(t == "A\u00A0\u00E9\u00FF")
  }

  // ------------------------------------------------------ precedence

  test("BOM beats a contradicting transport label; BOM is stripped") {
    val body = bytes(0xEF, 0xBB, 0xBF) ++ "é".getBytes("UTF-8")
    val (t, cs, m) = sniff(body, "text/html; charset=iso-8859-1")
    assert((t, cs, m) == (("é", "utf-8", "bom")))
  }

  test("utf-16 BOMs: LE and BE decode, bare utf-16 label means LE") {
    val le = bytes(0xFF, 0xFE) ++ "hé".getBytes("UTF-16LE")
    assert(sniff(le) == (("hé", "utf-16le", "bom")))
    val be = bytes(0xFE, 0xFF) ++ "hé".getBytes("UTF-16BE")
    assert(sniff(be) == (("hé", "utf-16be", "bom")))
    val labeled = sniff("hé".getBytes("UTF-16LE"), "x; charset=utf-16")
    assert(labeled == (("hé", "utf-16le", "header")))
  }

  test("header beats meta; meta beats sniffing; unlabeled valid " +
      "UTF-8 sniffs as utf-8") {
    val metaDecoy =
      "<meta charset=\"utf-8\">".getBytes("US-ASCII") ++ bytes(0x97)
    // header says 1252 -> 0x97 is em dash, the meta decoy is shadowed
    val (t1, cs1, m1) = sniff(metaDecoy, "text/plain; charset=latin1")
    assert(cs1 == "windows-1252" && m1 == "header" && t1.endsWith("—"))
    // no header -> the meta label decides (utf-8; 0x97 is malformed ->
    // one replacement char)
    val (t2, cs2, m2) = sniff(metaDecoy)
    assert(cs2 == "utf-8" && m2 == "meta" && t2.endsWith("�"))
    assert(sniff("just ascii".getBytes("US-ASCII"))._3 == "valid-utf8")
    assert(sniff("é".getBytes("UTF-8")) == (("é", "utf-8", "valid-utf8")))
  }

  test("unsupported label rejects by name from header and from meta") {
    val (t1, cs1, m1) =
      sniff("x".getBytes("US-ASCII"), "a/b; charset=Shift_JIS")
    assert(t1 == null && cs1 == "shift_jis" && m1 == "unsupported-label")
    val (t2, cs2, m2) =
      sniff("<meta charset=gbk>x".getBytes("US-ASCII"))
    assert(t2 == null && cs2 == "gbk" && m2 == "unsupported-label")
  }

  // ---------------------------------------------------- replacement

  test("malformed units under a chosen charset replace, never throw") {
    // utf-8 by BOM with a bad byte after it
    val (t, _, _) = sniff(bytes(0xEF, 0xBB, 0xBF, 0x41, 0xFF, 0x42))
    assert(t == "A\uFFFDB")
    // odd trailing byte under utf-16le
    val (t2, _, _) = sniff(bytes(0xFF, 0xFE, 0x41, 0x00, 0x42))
    assert(t2 == "A�")
    // empty body: BOM-only utf-8 decodes to empty; fully empty body
    // falls through sniffing to valid-utf8 (vacuously valid)
    assert(sniff(bytes(0xEF, 0xBB, 0xBF)) == (("", "utf-8", "bom")))
    assert(sniff(Array.emptyByteArray) == (("", "utf-8", "valid-utf8")))
  }
}
