package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemap.xml parsing — the crawl frontier's third discovery channel
  * (robots `Sitemap:` directives point here; the file enumerates the
  * site's own URL inventory). Bounded core of the sitemaps.org
  * protocol as one native expression, the codec-family discipline:
  * everything parseable parses deterministically, everything outside
  * the bounded core is a NAMED rejection in a relational `err` column
  * (never a silent partial result, never a thrown error for hostile
  * bytes).
  *
  * Supported, per the protocol schema:
  *  - root `<urlset>` (kind `urlset`) with `<url>` entries, or root
  *    `<sitemapindex>` (kind `sitemapindex`) with `<sitemap>` entries
  *    — an index file's entries point at further sitemap FILES, which
  *    is why `kind` is first-class: the frontier recurses on index
  *    entries and enqueues urlset entries;
  *  - element names match on their LOCAL name (any `ns:` prefix), the
  *    usual namespaced-document shape; attributes (xmlns, …) are
  *    accepted and ignored;
  *  - per entry: `<loc>` (required), `<lastmod>` (optional, kept as
  *    its trimmed string — W3C datetime validation belongs to the
  *    caller's quality tier), `<priority>` (optional, a strict
  *    decimal in [0.0, 1.0] — Java-only numeric forms like hex
  *    floats reject); other children (`<changefreq>`, and WHOLE
  *    extension subtrees like `<image:image>…</image:image>`) are
  *    skipped; text content decodes the XML predefined entities
  *    (amp lt gt quot apos) and numeric character references, and
  *    CDATA sections (`<![CDATA[…]]>`) append their raw content
  *    verbatim (several real generators wrap `<loc>` values in one);
  *  - XML declaration, comments and whitespace between elements skip.
  *
  * Named rejections (`err` column, entries NULL):
  *  - `sitemap:bad-root` — root element is neither urlset nor
  *    sitemapindex;
  *  - `sitemap:bad-entry` — a child of the root that is not the
  *    root's entry element;
  *  - `sitemap:entry-missing-loc` — an entry without `<loc>`;
  *  - `sitemap:bad-priority` — priority not a number in [0, 1];
  *  - `sitemap:malformed` — structurally broken XML (unterminated
  *    tag/comment, mismatched close, trailing content).
  *
  * A 50 000-entry cap (the protocol's own per-file limit) rejects as
  * `sitemap:too-many-entries` — honest refusal beats unbounded
  * allocation on hostile input.
  */
object SitemapParse {

  def parseSitemap(xml: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SitemapParseExpr(org.apache.spark.sql.GraftBridge.expression(xml)))

  final case class Entry(loc: String, lastmod: String,
                         priority: java.lang.Double)

  /** Left = named rejection, Right = (kind, entries). */
  def parse(xml: String): Either[String, (String, Array[Entry])] = {
    val p = new Parser(xml)
    p.run()
  }

  private val MaxEntries = 50000

  /** Decode XML predefined entities + numeric character references;
    * anything else is `sitemap:malformed` territory but — matching
    * the lenient text handling of real sitemap consumers — an
    * unknown `&name;` stays literal.
    */
  private[functions] def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        var consumed = false
        if (semi > i + 1 && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          if (body.charAt(0) == '#') {
            val hex = body.length > 1 &&
              (body.charAt(1) == 'x' || body.charAt(1) == 'X')
            val digits = if (hex) body.substring(2) else body.substring(1)
            try {
              val cp = java.lang.Long.parseLong(digits, if (hex) 16 else 10)
              if (cp > 0 && cp <= 0x10FFFF &&
                !(cp >= 0xD800 && cp <= 0xDFFF)) {
                out.append(Character.toChars(cp.toInt)); consumed = true
              }
            } catch { case _: NumberFormatException => }
          } else body match {
            case "amp" => out.append('&'); consumed = true
            case "lt" => out.append('<'); consumed = true
            case "gt" => out.append('>'); consumed = true
            case "quot" => out.append('"'); consumed = true
            case "apos" => out.append('\''); consumed = true
            case _ => ()
          }
        }
        if (consumed) i = semi + 1
        else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def localName(name: String): String = {
    val c = name.indexOf(':')
    if (c < 0) name else name.substring(c + 1)
  }

  /** Tiny pull scanner over the sitemap XML subset. */
  private final class Parser(xml: String) {
    private var i = 0
    private val n = xml.length

    private def skipMisc(): Boolean = {
      var progress = true
      while (progress) {
        progress = false
        while (i < n && Character.isWhitespace(xml.charAt(i))) i += 1
        if (xml.startsWith("<?", i)) {
          val e = xml.indexOf("?>", i + 2)
          if (e < 0) return false
          i = e + 2; progress = true
        } else if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4)
          if (e < 0) return false
          i = e + 3; progress = true
        } else if (xml.startsWith("<!", i)) {
          val e = xml.indexOf('>', i + 2)
          if (e < 0) return false
          i = e + 1; progress = true
        }
      }
      true
    }

    /** At `<name …>` → Some((localName, selfClosing)); at `</…>` or
      * not at a start tag → None (position unchanged unless consumed).
      */
    private def startTag(): Option[(String, Boolean)] = {
      if (i >= n || xml.charAt(i) != '<') return None
      if (i + 1 < n && xml.charAt(i + 1) == '/') return None
      var j = i + 1
      val ns = j
      while (j < n && xml.charAt(j) != '>' && xml.charAt(j) != '/' &&
        !Character.isWhitespace(xml.charAt(j))) j += 1
      if (j == ns) return None
      val name = xml.substring(ns, j)
      // attributes until '>' honoring quotes
      var quote = 0.toChar
      var end = -1
      var k = j
      while (k < n && end < 0) {
        val ch = xml.charAt(k)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        else if (ch == '>') end = k
        k += 1
      }
      if (end < 0) return None
      val selfClosing = end > i && xml.charAt(end - 1) == '/'
      i = end + 1
      Some((localName(name), selfClosing))
    }

    /** Consume `</name>` for the given local name; false on mismatch. */
    private def endTag(local: String): Boolean = {
      if (!xml.startsWith("</", i)) return false
      var j = i + 2
      val ns = j
      while (j < n && xml.charAt(j) != '>' &&
        !Character.isWhitespace(xml.charAt(j))) j += 1
      val name = localName(xml.substring(ns, j))
      while (j < n && Character.isWhitespace(xml.charAt(j))) j += 1
      if (j >= n || xml.charAt(j) != '>' || name != local) return false
      i = j + 1
      true
    }

    /** Text content up to the next markup '<' — except CDATA sections
      * (`<![CDATA[…]]>`, emitted by several real sitemap generators),
      * whose raw content appends verbatim with no entity decoding
      * (XML 1.0 §2.7). An unterminated CDATA leaves `i` at its '<', so
      * the caller's endTag fails → `sitemap:malformed`.
      */
    private def text(): String = {
      val out = new java.lang.StringBuilder()
      var more = true
      while (more) {
        val s = i
        while (i < n && xml.charAt(i) != '<') i += 1
        out.append(decodeXml(xml.substring(s, i)))
        if (xml.startsWith("<![CDATA[", i)) {
          val e = xml.indexOf("]]>", i + 9)
          if (e < 0) more = false
          else {
            out.append(xml, i + 9, e)
            i = e + 3
          }
        } else more = false
      }
      out.toString
    }

    /** Consume `</…>` regardless of name (structural skip). */
    private def closeAny(): Boolean = {
      if (!xml.startsWith("</", i)) return false
      var j = i + 2
      while (j < n && xml.charAt(j) != '>') j += 1
      if (j >= n) return false
      i = j + 1
      true
    }

    /** Skip the REST of an already-opened unknown element — nested
      * children and all (extension blocks like `<image:image>` carry
      * whole subtrees). Depth-counted with a 64 cap; well-formed XML
      * pairs its tags, so structural counting is the correct skip.
      */
    private def skipSubtree(): Boolean = {
      var depth = 1
      while (depth > 0) {
        while (i < n && xml.charAt(i) != '<') i += 1 // character data
        if (i >= n) return false
        if (xml.startsWith("</", i)) {
          if (!closeAny()) return false
          depth -= 1
        } else if (xml.startsWith("<![CDATA[", i)) {
          // may contain '>' — must close on the ]]> marker, not '>'
          val e = xml.indexOf("]]>", i + 9)
          if (e < 0) return false
          i = e + 3
        } else if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4)
          if (e < 0) return false
          i = e + 3
        } else if (xml.startsWith("<?", i)) {
          val e = xml.indexOf("?>", i + 2)
          if (e < 0) return false
          i = e + 2
        } else if (xml.startsWith("<!", i)) {
          val e = xml.indexOf('>', i + 2)
          if (e < 0) return false
          i = e + 1
        } else startTag() match {
          case Some((_, self)) =>
            if (!self) depth += 1
            if (depth > 64) return false
          case None => return false
        }
      }
      true
    }

    def run(): Either[String, (String, Array[Entry])] = {
      if (!skipMisc()) return Left("sitemap:malformed")
      val root = startTag() match {
        case Some((name, false)) => name
        case Some((name, true)) =>
          // an empty self-closing root is a complete, empty document
          return if (name == "urlset" || name == "sitemapindex")
            Right((name, Array.empty)) else Left("sitemap:bad-root")
        case None => return Left("sitemap:malformed")
      }
      if (root != "urlset" && root != "sitemapindex")
        return Left("sitemap:bad-root")
      val entryName = if (root == "urlset") "url" else "sitemap"
      val entries = Array.newBuilder[Entry]
      var count = 0
      while (true) {
        if (!skipMisc()) return Left("sitemap:malformed")
        if (i >= n) return Left("sitemap:malformed")
        if (xml.startsWith("</", i)) {
          if (!endTag(root)) return Left("sitemap:malformed")
          if (!skipMisc()) return Left("sitemap:malformed")
          if (i < n) return Left("sitemap:malformed")
          return Right((root, entries.result()))
        }
        startTag() match {
          case Some((name, self)) =>
            if (name != entryName) return Left("sitemap:bad-entry")
            count += 1
            if (count > MaxEntries) return Left("sitemap:too-many-entries")
            if (self) return Left("sitemap:entry-missing-loc")
            var loc: String = null
            var lastmod: String = null
            var priority: java.lang.Double = null
            var closed = false
            while (!closed) {
              if (!skipMisc()) return Left("sitemap:malformed")
              if (i >= n) return Left("sitemap:malformed")
              if (xml.startsWith("</", i)) {
                if (!endTag(entryName)) return Left("sitemap:malformed")
                closed = true
              } else startTag() match {
                case Some((child, selfC))
                    if child == "loc" || child == "lastmod" ||
                      child == "priority" =>
                  // the protocol fields are LEAF elements
                  val value = if (selfC) "" else {
                    val v = text()
                    if (!endTag(child)) return Left("sitemap:malformed")
                    v
                  }
                  child match {
                    case "loc" => loc = value.trim
                    case "lastmod" => lastmod = value.trim
                    case _ =>
                      val p = StrictNum.decimal(value.trim)
                      if (p == null || p < 0.0 || p > 1.0)
                        return Left("sitemap:bad-priority")
                      priority = p
                  }
                case Some((_, selfC)) =>
                  // changefreq, extension subtrees (image/video/news
                  // blocks with nested children): skipped WHOLE
                  if (!selfC && !skipSubtree())
                    return Left("sitemap:malformed")
                case None => return Left("sitemap:malformed")
              }
            }
            if (loc == null || loc.isEmpty)
              return Left("sitemap:entry-missing-loc")
            entries += Entry(loc, lastmod, priority)
          case None => return Left("sitemap:malformed")
        }
      }
      Left("sitemap:malformed") // unreachable
    }
  }
}

/** `sitemap_parse(xml)` → struct<kind: string, entries:
  * array<struct<loc, lastmod, priority>>, err: string> — `err` NULL on
  * success, kind/entries NULL on a named rejection
  * ([[SitemapParse]] contract; the [[graft.operators.PdfCodec]]
  * err-column discipline).
  */
case class SitemapParseExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("kind", StringType, nullable = true),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("loc", StringType, nullable = false),
      StructField("lastmod", StringType, nullable = true),
      StructField("priority", DoubleType, nullable = true))),
      containsNull = false), nullable = true),
    StructField("err", StringType, nullable = true)))
  override def prettyName: String = "sitemap_parse"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "a string xml child",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    SitemapParse.parse(input.asInstanceOf[UTF8String].toString) match {
      case Left(err) =>
        new GenericInternalRow(
          Array[Any](null, null, UTF8String.fromString(err)))
      case Right((kind, entries)) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(kind),
          new GenericArrayData(entries.map { e =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(e.loc),
              if (e.lastmod == null) null
              else UTF8String.fromString(e.lastmod),
              e.priority))
          }.toArray[Any]),
          null))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SitemapParseExpr =
    copy(child = newChild)
}

/** Strict decimal parsing shared by the crawl-policy surfaces
  * ([[SitemapParse]] priority, [[RobotsOps]] crawl-delay): ONLY
  * `digits[.digits]` or `.digits` — `java.lang.Double.parseDouble`
  * alone would admit hex floats, `1f` suffixes and `Infinity`, making
  * "parses as a number" implementation-defined instead of
  * oracle-replayable.
  */
private[functions] object StrictNum {
  def decimal(s: String): java.lang.Double = {
    if (s.isEmpty || s.length > 32) return null // bound hostile runs
    val dot = s.indexOf('.')
    val intPart = if (dot < 0) s else s.substring(0, dot)
    val fracPart = if (dot < 0) "" else s.substring(dot + 1)
    if (dot >= 0 && fracPart.isEmpty) return null
    if (intPart.isEmpty && fracPart.isEmpty) return null
    if (!intPart.forall(c => c >= '0' && c <= '9')) return null
    if (!fracPart.forall(c => c >= '0' && c <= '9')) return null
    java.lang.Double.parseDouble(s)
  }
}
