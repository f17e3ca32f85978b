package graft.operators

import java.util.zip.{DataFormatException, Inflater}

/** PDF → text extraction — after HTML, the next-largest text payload
  * in a real crawl; without this operator every PDF byte in a 100 TB
  * archive is dark data. This is the BOUNDED, offline-verifiable core
  * of ISO 32000-1 (PDF 1.x), the [[WebpCodec]] honest-rejection
  * discipline applied to documents: the deterministic majority path
  * decodes exactly, everything whose reference tables or crypto cannot
  * be verified offline is a NAMED rejection, never a silent guess —
  * a mis-decoded page poisons every downstream fingerprint, a named
  * null is auditable.
  *
  * SUPPORTED (the closed-form core):
  *  - classic cross-reference TABLES (multi-section, `/Prev` chains;
  *    later sections win, exactly the incremental-update rule);
  *  - the document tree: trailer `/Root` → catalog → `/Pages` tree
  *    (nested `Pages` nodes, `/Resources` inheritance) → `Page`;
  *  - content streams stored raw or `/FlateDecode` (RFC 1950 zlib via
  *    the JVM `Inflater` — the [[PixelCodec]] discipline), `/Length`
  *    direct or indirect, `/Contents` single or array;
  *  - text operators `BT ET Tf Td TD T* Tm TL Tj TJ ' "` plus the
  *    ignorable state ops (`Tc Tw Tz Ts Tr`, graphics ops): strings
  *    concatenate in content order; `Td TD T* Tm '` start a NEW LINE
  *    when text was emitted since the last line start; TJ kerning
  *    numbers are positioning, not text, and are skipped; pages join
  *    with `\f` (the pdftotext convention);
  *  - string syntax in full: nested literal parens, the eight escapes,
  *    octal `\ddd`, line continuations, hex strings with odd-length
  *    padding;
  *  - byte → char: 0x00–0x7F are ASCII under every simple-font
  *    encoding; bytes ≥ 0x80 decode through the WinAnsi (cp1252)
  *    table ONLY when the CURRENT font (tracked through `Tf`)
  *    declares `/Encoding /WinAnsiEncoding` — under any other or
  *    absent encoding a high byte is a named rejection (the tables
  *    differ and guessing mojibakes the page).
  *
  * REJECTED BY NAME (`PdfReject.kind`):
  *  - `encrypted` — `/Encrypt` in the trailer (no offline-verifiable
  *    crypto);
  *  - `xref-stream` — cross-reference streams and `/XRefStm` hybrids
  *    (PDF 1.5 compressed xref; needs `/W` stream decoding whose
  *    fixtures cannot be independently constructed here);
  *  - `objstm` — objects living in compressed object streams;
  *  - `filter` — any content filter other than FlateDecode (DCT, LZW,
  *    ASCII85, crypt filters …);
  *  - `type0-font` — composite/CID fonts: multi-byte CMaps cannot be
  *    decoded without their mapping tables;
  *  - `encoding` — a high byte under a non-WinAnsi encoding, a
  *    `/Differences` remap, or a WinAnsi-undefined code;
  *  - `inline-image` — `BI … EI` carries arbitrary binary that cannot
  *    be safely skipped without filter knowledge;
  *  - `malformed` — everything structurally broken (bad header, bad
  *    xref, truncated stream, unbalanced tokens …).
  *
  * Scale shape: one record = one document, decode is a pure
  * per-row function in the scan projection
  * ([[graft.functions.PdfTextExpr]]) — the map-only stage a 100 TB
  * crawl runs, no UDF, no driver loop, composes with the charset/HTML
  * tier's funnel exactly like [[graft.sources.WarcCodec]] output does.
  */
object PdfCodec {

  /** Named rejection: `kind` is the stable machine-checkable name. */
  final class PdfReject(val kind: String, detail: String)
      extends IllegalArgumentException(s"pdf: $kind: $detail")

  private def reject(kind: String, detail: String): Nothing =
    throw new PdfReject(kind, detail)

  final case class PdfText(nPages: Int, text: String)

  // ------------------------------------------------------------ model

  private sealed trait Obj
  private case class PNum(v: Double) extends Obj { def toInt: Int = v.toInt }
  private case class PName(v: String) extends Obj
  private case class PStr(bytes: Array[Byte]) extends Obj
  private case class PArr(items: Vector[Obj]) extends Obj
  private case class PDict(m: Map[String, Obj]) extends Obj
  private case class PRef(num: Int, gen: Int) extends Obj
  private case class PBool(v: Boolean) extends Obj
  private case object PNull extends Obj
  private case class PStream(dict: PDict, data: Array[Byte]) extends Obj

  // ------------------------------------------------------------ lexer

  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Cursor over the raw bytes; both the object parser and the
    * content-stream interpreter run on it.
    */
  private final class Lex(val b: Array[Byte], var at: Int) {

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (at < b.length && isWs(b(at) & 0xFF)) at += 1
        if (at < b.length && b(at) == '%') { // comment to EOL
          while (at < b.length && b(at) != '\n' && b(at) != '\r') at += 1
        } else go = false
      }
    }

    def peek: Int = if (at < b.length) b(at) & 0xFF else -1

    /** A regular token (number / keyword / operator name): bytes up to
      * the next whitespace or delimiter.
      */
    def token(): String = {
      skipWs()
      val s = at
      while (at < b.length && !isWs(b(at) & 0xFF) &&
        !isDelim(b(at) & 0xFF)) at += 1
      if (at == s) reject("malformed", s"expected token at offset $s")
      new String(b, s, at - s, "ISO-8859-1")
    }

    def expect(kw: String): Unit = {
      val t = token()
      if (t != kw) reject("malformed", s"expected '$kw', got '$t'")
    }

    /** Literal string `(...)`: nesting, escapes, octal, continuations. */
    def literalString(): Array[Byte] = {
      // at '('
      at += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (at >= b.length) reject("malformed", "unterminated string")
        val c = b(at) & 0xFF
        at += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case '\\' =>
            if (at >= b.length) reject("malformed", "dangling escape")
            val e = b(at) & 0xFF
            at += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => // continuation: swallow optional \n
                if (at < b.length && b(at) == '\n') at += 1
              case '\n' => () // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && at < b.length && b(at) >= '0' &&
                  b(at) <= '7') { v = v * 8 + (b(at) - '0'); at += 1; k += 1 }
                out.write(v & 0xFF)
              case other => out.write(other) // spec: backslash dropped
            }
          case other => out.write(other)
        }
      }
      out.toByteArray
    }

    /** Hex string `<...>` (caller consumed nothing; `at` is on '<'
      * and the next char is NOT '<').
      */
    def hexString(): Array[Byte] = {
      at += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (at >= b.length) reject("malformed", "unterminated hex string")
        val c = b(at) & 0xFF
        at += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd count: pad 0
          done = true
        } else if (!isWs(c)) {
          val v =
            if (c >= '0' && c <= '9') c - '0'
            else if (c >= 'a' && c <= 'f') c - 'a' + 10
            else if (c >= 'A' && c <= 'F') c - 'A' + 10
            else reject("malformed", s"bad hex digit '${c.toChar}'")
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      out.toByteArray
    }
  }

  // ----------------------------------------------------- object parse

  /** One object at the cursor; `refs` allowed (the `N G R` shape is
    * resolved by lookahead). `depth` guards container nesting — a
    * '[[[[…' or '<<…<<…' tower must be a named rejection, not a
    * StackOverflowError (fatal, escapes the expression's catch).
    */
  private def parseObj(lx: Lex, depth: Int = 0): Obj = {
    if (depth > 64) reject("malformed", "object nesting past depth 64")
    lx.skipWs()
    lx.peek match {
      case '(' => PStr(lx.literalString())
      case '<' =>
        if (lx.at + 1 < lx.b.length && lx.b(lx.at + 1) == '<') {
          lx.at += 2
          parseDictBody(lx, depth + 1)
        } else PStr(lx.hexString())
      case '[' =>
        lx.at += 1
        val items = Vector.newBuilder[Obj]
        var done = false
        while (!done) {
          lx.skipWs()
          if (lx.peek == ']') { lx.at += 1; done = true }
          else items += parseObj(lx, depth + 1)
        }
        PArr(items.result())
      case '/' =>
        lx.at += 1
        val s = lx.at
        while (lx.at < lx.b.length && !isWs(lx.b(lx.at) & 0xFF) &&
          !isDelim(lx.b(lx.at) & 0xFF)) lx.at += 1
        PName(new String(lx.b, s, lx.at - s, "ISO-8859-1"))
      case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
        val t = lx.token()
        val n = try t.toDouble catch {
          case _: NumberFormatException =>
            reject("malformed", s"bad number '$t'")
        }
        // lookahead for `G R` (an indirect reference)
        if (n >= 0 && n == n.floor && !t.contains('.')) {
          val save = lx.at
          lx.skipWs()
          val c2 = lx.peek
          if (c2 >= '0' && c2 <= '9') {
            val t2 = lx.token()
            if (t2.forall(_.isDigit)) {
              lx.skipWs()
              if (lx.peek == 'R') {
                val save2 = lx.at
                val t3 = lx.token()
                if (t3 == "R") return PRef(n.toInt, t2.toInt)
                lx.at = save2
              }
            }
          }
          lx.at = save
        }
        PNum(n)
      case _ =>
        val t = lx.token()
        t match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case other => reject("malformed", s"unexpected token '$other'")
        }
    }
  }

  /** Dict body after `<<`, through `>>`. */
  private def parseDictBody(lx: Lex, depth: Int = 0): PDict = {
    val m = Map.newBuilder[String, Obj]
    var done = false
    while (!done) {
      lx.skipWs()
      if (lx.peek == '>' && lx.at + 1 < lx.b.length &&
        lx.b(lx.at + 1) == '>') { lx.at += 2; done = true }
      else {
        parseObj(lx, depth + 1) match {
          case PName(k) => m += (k -> parseObj(lx, depth + 1))
          case other =>
            reject("malformed", s"dict key is not a name: $other")
        }
      }
    }
    PDict(m.result())
  }

  // ------------------------------------------------------------ xref

  /** objnum → byte offset for in-file objects, from the classic xref
    * table chain (later sections shadow `/Prev` ones), plus the merged
    * trailer.
    */
  private def readXref(b: Array[Byte]): (Map[Int, Long], PDict) = {
    // find startxref near the end
    val tailAt = math.max(0, b.length - 2048)
    val tail = new String(b, tailAt, b.length - tailAt, "ISO-8859-1")
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) reject("malformed", "no startxref")
    var at = {
      val lx = new Lex(b, tailAt + sx)
      lx.expect("startxref")
      val t = lx.token()
      if (!t.forall(_.isDigit)) reject("malformed", s"bad startxref '$t'")
      t.toLong
    }
    val offsets = scala.collection.mutable.HashMap.empty[Int, Long]
    var trailer: Map[String, Obj] = Map.empty
    var guard = 0
    while (at >= 0) {
      guard += 1
      if (guard > 64) reject("malformed", "xref /Prev cycle")
      if (at > b.length - 4) reject("malformed", "startxref out of range")
      val lx = new Lex(b, at.toInt)
      lx.skipWs()
      // a cross-reference STREAM starts with `N G obj` here
      if (lx.peek >= '0' && lx.peek <= '9')
        reject("xref-stream",
          "cross-reference streams (PDF 1.5) unsupported")
      lx.expect("xref")
      var inSections = true
      while (inSections) {
        lx.skipWs()
        val t = lx.token()
        if (t == "trailer") inSections = false
        else {
          if (!t.forall(_.isDigit))
            reject("malformed", s"bad xref subsection '$t'")
          val start = t.toInt
          val count = {
            val c = lx.token()
            if (!c.forall(_.isDigit))
              reject("malformed", s"bad xref count '$c'")
            c.toInt
          }
          var i = 0
          while (i < count) {
            val off = lx.token()
            val gen = lx.token()
            val kind = lx.token()
            if (!off.forall(_.isDigit) || !gen.forall(_.isDigit) ||
              (kind != "n" && kind != "f"))
              reject("malformed", s"bad xref entry '$off $gen $kind'")
            if (kind == "n" && !offsets.contains(start + i))
              offsets(start + i) = off.toLong
            i += 1
          }
        }
      }
      lx.skipWs()
      if (lx.peek != '<') reject("malformed", "trailer is not a dict")
      lx.at += 2
      val tdict = parseDictBody(lx).m
      if (tdict.contains("XRefStm"))
        reject("xref-stream", "hybrid /XRefStm xref unsupported")
      // earlier trailers only fill keys the latest one lacks
      tdict.foreach { case (k, v) =>
        if (!trailer.contains(k)) trailer += (k -> v)
      }
      at = tdict.get("Prev") match {
        case Some(PNum(p)) => p.toLong
        case _ => -1L
      }
    }
    if (trailer.contains("Encrypt"))
      reject("encrypted", "/Encrypt present; no offline-verifiable crypto")
    (offsets.toMap, PDict(trailer))
  }

  // ------------------------------------------------- document loading

  private final class Doc(val b: Array[Byte], offsets: Map[Int, Long]) {
    private val cache = scala.collection.mutable.HashMap.empty[Int, Obj]

    def load(num: Int): Obj = cache.getOrElseUpdate(num, {
      val off = offsets.getOrElse(num,
        reject("malformed", s"object $num not in xref"))
      if (off < 0 || off >= b.length)
        reject("malformed", s"object $num offset $off out of range")
      val lx = new Lex(b, off.toInt)
      val n = lx.token()
      val g = lx.token()
      if (!n.forall(_.isDigit) || !g.forall(_.isDigit) || n.toInt != num)
        reject("malformed", s"object header mismatch at $off: '$n $g'")
      lx.expect("obj")
      val obj = parseObj(lx)
      lx.skipWs()
      val save = lx.at
      val kw = scala.util.Try(lx.token()).getOrElse("")
      if (kw == "stream") {
        val dict = obj match {
          case d: PDict => d
          case _ => reject("malformed", "stream without a dict")
        }
        if (dict.m.get("Type").contains(PName("ObjStm")))
          reject("objstm", "compressed object streams unsupported")
        // EOL after `stream`: CRLF or LF
        if (lx.peek == '\r') lx.at += 1
        if (lx.peek == '\n') lx.at += 1
        else reject("malformed", "stream keyword not followed by EOL")
        val len = resolve(dict.m.getOrElse("Length",
          reject("malformed", "stream without /Length"))) match {
          case PNum(v) if v >= 0 => v.toInt
          case _ => reject("malformed", "bad stream /Length")
        }
        if (lx.at + len > b.length)
          reject("malformed", "stream data truncated")
        val data = java.util.Arrays.copyOfRange(b, lx.at, lx.at + len)
        lx.at += len
        lx.skipWs()
        lx.expect("endstream")
        PStream(dict, data)
      } else {
        lx.at = save
        obj
      }
    })

    def resolve(o: Obj): Obj = resolve(o, 0)

    // depth-guarded: a self- or mutually-referential indirect object
    // ('5 0 obj 6 0 R endobj' + '6 0 obj 5 0 R endobj') must be a
    // NAMED rejection, not a StackOverflowError (fatal, so it would
    // escape the expression's catch and kill the task)
    private def resolve(o: Obj, depth: Int): Obj = o match {
      case PRef(n, _) =>
        if (depth > 64)
          reject("malformed", s"indirect-reference chain past depth 64")
        resolve(load(n), depth + 1)
      case other => other
    }
  }

  // -------------------------------------------------------- filters

  /** Decoded stream bytes: raw, or FlateDecode (zlib, RFC 1950). */
  private def streamBytes(doc: Doc, st: PStream): Array[Byte] = {
    val filters: Seq[String] = doc.resolve(
      st.dict.m.getOrElse("Filter", PNull)) match {
      case PNull => Seq.empty
      case PName(f) => Seq(f)
      case PArr(items) => items.map {
        case PName(f) => f
        case other => reject("malformed", s"bad /Filter entry $other")
      }
      case other => reject("malformed", s"bad /Filter $other")
    }
    filters match {
      case Seq() => st.data
      case Seq("FlateDecode") => inflateZlib(st.data)
      case other => reject("filter",
        s"unsupported filter chain ${other.mkString("/")}")
    }
  }

  /** Inflate cap: a content stream bigger than this is a
    * decompression bomb, not a document — the [[graft.sources.WarcGz]]
    * `maxMemberBytes` discipline (an OOM is fatal and would escape the
    * expression's per-row catch; the cap keeps it a named rejection).
    */
  val maxStreamBytes: Int = 1 << 30

  private def inflateZlib(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater() // zlib wrapper per RFC 1950
    try {
      inf.setInput(data)
      val buf = new Array[Byte](64 * 1024)
      val out = new java.io.ByteArrayOutputStream()
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch {
            case e: DataFormatException =>
              reject("malformed", s"corrupt flate stream: ${e.getMessage}")
          }
        if (n > 0) {
          if (out.size().toLong + n > maxStreamBytes)
            reject("malformed",
              s"flate stream inflates past the $maxStreamBytes-byte cap")
          out.write(buf, 0, n)
        } else if (!inf.finished())
          reject("malformed", "truncated flate stream")
      }
      out.toByteArray
    } finally inf.end()
  }

  // ----------------------------------------------------- text decode

  /** WHATWG/cp1252 mapping for 0x80–0x9F; the five undefined WinAnsi
    * positions are 0 here and reject (same table discipline as
    * [[graft.functions.CharsetDecode]], independently derived from the
    * published code chart).
    */
  private val winAnsiHigh: Array[Char] = {
    val a = new Array[Char](32)
    val defined = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    defined.foreach { case (k, v) => a(k - 0x80) = v.toChar }
    a
  }

  private def decodeStringBytes(bytes: Array[Byte],
                                winAnsi: Boolean): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xFF
      if (c < 0x80) sb.append(c.toChar)
      else if (!winAnsi)
        reject("encoding",
          f"byte 0x$c%02x under a non-WinAnsi font encoding")
      else if (c >= 0xA0) sb.append(c.toChar) // latin-1 identity range
      else {
        val ch = winAnsiHigh(c - 0x80)
        if (ch == 0)
          reject("encoding", f"WinAnsi-undefined code 0x$c%02x")
        sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  // ------------------------------------------------------ page walk

  /** Per-page font map: font resource name → decodes-as-WinAnsi. */
  private def pageFonts(doc: Doc, resources: Obj): Map[String, Boolean] =
    doc.resolve(resources) match {
      case PDict(res) =>
        doc.resolve(res.getOrElse("Font", PNull)) match {
          case PDict(fonts) =>
            fonts.map { case (fname, fref) =>
              val fd = doc.resolve(fref) match {
                case PDict(m) => m
                case _ => reject("malformed", s"font $fname not a dict")
              }
              doc.resolve(fd.getOrElse("Subtype", PNull)) match {
                case PName("Type0") =>
                  reject("type0-font",
                    s"composite font $fname needs CMap tables")
                case _ => ()
              }
              val winAnsi = doc.resolve(fd.getOrElse("Encoding", PNull)) match {
                case PName("WinAnsiEncoding") => true
                case PNull => false
                case PName(_) => false
                case PDict(_) =>
                  reject("encoding",
                    s"font $fname carries a /Differences remap")
                case other =>
                  reject("malformed", s"bad /Encoding $other")
              }
              fname -> winAnsi
            }
          case PNull => Map.empty[String, Boolean]
          case _ => reject("malformed", "/Font is not a dict")
        }
      case PNull => Map.empty[String, Boolean]
      case _ => reject("malformed", "/Resources is not a dict")
    }

  /** Depth-first page collection with /Resources inheritance. */
  private def collectPages(doc: Doc, node: Obj, inheritedRes: Obj,
                           out: scala.collection.mutable.ArrayBuffer[(PDict, Obj)],
                           depth: Int): Unit = {
    if (depth > 64) reject("malformed", "page tree too deep")
    val d = doc.resolve(node) match {
      case pd: PDict => pd
      case _ => reject("malformed", "page-tree node is not a dict")
    }
    val res = d.m.getOrElse("Resources", inheritedRes)
    doc.resolve(d.m.getOrElse("Type", PNull)) match {
      case PName("Pages") =>
        doc.resolve(d.m.getOrElse("Kids",
          reject("malformed", "Pages without /Kids"))) match {
          case PArr(kids) =>
            kids.foreach(k => collectPages(doc, k, res, out, depth + 1))
          case _ => reject("malformed", "/Kids is not an array")
        }
      case PName("Page") => out += ((d, res))
      case other => reject("malformed", s"page-tree node type $other")
    }
  }

  // ------------------------------------------- content interpretation

  /** Run the text operators over one page's (already decoded,
    * concatenated) content bytes.
    */
  private def extractPageText(content: Array[Byte],
                              fonts: Map[String, Boolean]): String = {
    val lx = new Lex(content, 0)
    val sb = new java.lang.StringBuilder()
    var lineHasText = false
    var curWinAnsi = false

    def newLine(): Unit =
      if (lineHasText) { sb.append('\n'); lineHasText = false }
    def emit(bytes: Array[Byte]): Unit = {
      val s = decodeStringBytes(bytes, curWinAnsi)
      if (s.nonEmpty) { sb.append(s); lineHasText = true }
    }

    // operand stack: only strings, names and the TJ array matter
    val operands = scala.collection.mutable.ArrayBuffer.empty[Obj]
    while ({ lx.skipWs(); lx.peek != -1 }) {
      lx.peek match {
        case '(' => operands += PStr(lx.literalString())
        case '<' =>
          if (lx.at + 1 < content.length && content(lx.at + 1) == '<') {
            lx.at += 2; operands += parseDictBody(lx)
          } else operands += PStr(lx.hexString())
        case '[' | '/' => operands += parseObj(lx)
        case c if c == '+' || c == '-' || c == '.' ||
          (c >= '0' && c <= '9') =>
          val t = lx.token()
          operands += PNum(
            try t.toDouble
            catch {
              case _: NumberFormatException =>
                reject("malformed", s"bad content number '$t'")
            })
        case _ =>
          val op = lx.token()
          op match {
            case "BT" | "ET" => ()
            case "Tf" => operands.headOption match {
              case Some(PName(f)) =>
                curWinAnsi = fonts.getOrElse(f,
                  reject("malformed", s"Tf names unknown font /$f"))
              case _ => reject("malformed", "Tf without a font name")
            }
            case "Td" | "TD" | "T*" | "Tm" => newLine()
            case "Tj" => operands.lastOption match {
              case Some(PStr(s)) => emit(s)
              case _ => reject("malformed", "Tj without a string")
            }
            case "'" =>
              newLine()
              operands.lastOption match {
                case Some(PStr(s)) => emit(s)
                case _ => reject("malformed", "' without a string")
              }
            case "\"" =>
              newLine()
              operands.lastOption match {
                case Some(PStr(s)) => emit(s)
                case _ => reject("malformed", "\" without a string")
              }
            case "TJ" => operands.lastOption match {
              case Some(PArr(items)) => items.foreach {
                case PStr(s) => emit(s)
                case PNum(_) => () // kerning adjustment, not text
                case other =>
                  reject("malformed", s"TJ array holds $other")
              }
              case _ => reject("malformed", "TJ without an array")
            }
            case "BI" =>
              reject("inline-image",
                "BI/EI carries un-skippable binary")
            // every other operator (graphics/path/color/text state)
            // has no text effect
            case _ => ()
          }
          operands.clear()
      }
    }
    sb.toString
  }

  // ------------------------------------------------------------ api

  /** Extract all text. Any unsupported or broken construct throws
    * [[PdfReject]] with its named kind.
    */
  def extractText(bytes: Array[Byte]): PdfText = {
    if (bytes.length < 8 ||
      !new String(bytes, 0, 7, "ISO-8859-1").startsWith("%PDF-1."))
      reject("malformed", "missing %PDF-1.x header")
    val (offsets, trailer) = readXref(bytes)
    val doc = new Doc(bytes, offsets)
    val root = doc.resolve(trailer.m.getOrElse("Root",
      reject("malformed", "trailer without /Root"))) match {
      case PDict(m) => m
      case _ => reject("malformed", "/Root is not a dict")
    }
    val pagesRoot = root.getOrElse("Pages",
      reject("malformed", "catalog without /Pages"))
    val pages = scala.collection.mutable.ArrayBuffer.empty[(PDict, Obj)]
    collectPages(doc, pagesRoot, PNull, pages, 0)
    val texts = pages.map { case (page, res) =>
      val fonts = pageFonts(doc, res)
      val content = doc.resolve(page.m.getOrElse("Contents", PNull)) match {
        case PNull => Array.emptyByteArray
        case st: PStream => streamBytes(doc, st)
        case PArr(parts) =>
          val out = new java.io.ByteArrayOutputStream()
          parts.foreach { p =>
            doc.resolve(p) match {
              case st: PStream =>
                out.write(streamBytes(doc, st))
                out.write('\n') // spec: parts divide at token boundaries
              case other =>
                reject("malformed", s"/Contents part is $other")
            }
          }
          out.toByteArray
        case other => reject("malformed", s"/Contents is $other")
      }
      extractPageText(content, fonts)
    }
    PdfText(pages.length, texts.mkString("\f"))
  }

  // -------------------------------------------------- fixture encoder

  /** Reverse WinAnsi: char → byte, for the fixture writer. */
  private val winAnsiRev: Map[Char, Int] =
    (winAnsiHigh.zipWithIndex.collect {
      case (c, i) if c != 0 => c -> (i + 0x80)
    }).toMap

  /** Escape + encode one text line as a literal PDF string under
    * WinAnsiEncoding.
    */
  private def pdfString(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('(')
    s.foreach { c =>
      val b: Int =
        if (c < 0x80) c.toInt
        else if (c >= 0xA0 && c <= 0xFF) c.toInt
        else winAnsiRev.getOrElse(c,
          throw new IllegalArgumentException(
            s"fixture char not in WinAnsi: U+${c.toInt.toHexString}"))
      b match {
        case '(' | ')' | '\\' => out.write('\\'); out.write(b)
        case '\n' => out.write('\\'); out.write('n')
        case '\r' => out.write('\\'); out.write('r')
        case v if v >= 0x80 =>
          out.write('\\')
          out.write(('0' + ((v >> 6) & 7)))
          out.write(('0' + ((v >> 3) & 7)))
          out.write(('0' + (v & 7)))
        case v => out.write(v)
      }
    }
    out.write(')')
    out.toByteArray
  }

  /** Fixture encoder: a REAL multi-page PDF 1.4 (classic xref, one
    * WinAnsi Type1 font, one content stream per page — optionally
    * FlateDecode-compressed) whose extracted text is, by construction,
    * the page lines joined with `\n`, pages joined with `\f`. Every
    * byte offset in the xref is computed, so the file round-trips
    * through any conforming reader.
    */
  def encodePdf(pages: Seq[Seq[String]], flate: Boolean = false,
                encrypted: Boolean = false,
                type0: Boolean = false,
                badFilter: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    def obj(body: Array[Byte]): Unit = {
      offsets += out.size().toLong
      out.write(body)
    }
    def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    out.write(ascii("%PDF-1.4\n"))
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font,
    // 4..3+n page dicts, 4+n..3+2n content streams
    obj(ascii("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    val kids = (0 until nPages).map(i => s"${4 + i} 0 R").mkString(" ")
    obj(ascii(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] " +
      s"/Count $nPages /Resources << /Font << /F1 3 0 R >> >> " +
      ">>\nendobj\n"))
    val subtype = if (type0) "Type0" else "Type1"
    obj(ascii(s"3 0 obj\n<< /Type /Font /Subtype /$subtype " +
      "/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n"))
    pages.zipWithIndex.foreach { case (_, i) =>
      obj(ascii(s"${4 + i} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [ 0 0 612 792 ] /Contents ${4 + nPages + i} 0 R " +
        ">>\nendobj\n"))
    }
    pages.zipWithIndex.foreach { case (lines, i) =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(ascii("BT /F1 12 Tf 72 720 Td\n"))
      lines.zipWithIndex.foreach { case (l, i) =>
        body.write(pdfString(l))
        // no trailing T*: a line advance after the LAST string would
        // (faithfully) extract as a trailing newline
        body.write(ascii(if (i == lines.length - 1) " Tj\n"
          else " Tj T*\n"))
      }
      body.write(ascii("ET\n"))
      val raw = body.toByteArray
      val data = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end()
        bos.toByteArray
      } else raw
      val filter =
        if (badFilter) " /Filter /DCTDecode"
        else if (flate) " /Filter /FlateDecode"
        else ""
      obj(ascii(s"${4 + nPages + i} 0 obj\n" +
        s"<< /Length ${data.length}$filter >>\nstream\n"))
      out.write(data)
      out.write(ascii("\nendstream\nendobj\n"))
    }
    val xrefAt = out.size()
    val n = offsets.length + 1
    out.write(ascii(s"xref\n0 $n\n0000000000 65535 f \n"))
    offsets.foreach { o =>
      out.write(ascii(f"$o%010d 00000 n \n"))
    }
    val enc = if (encrypted) " /Encrypt 99 0 R" else ""
    out.write(ascii(s"trailer\n<< /Size $n /Root 1 0 R$enc >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }
}
