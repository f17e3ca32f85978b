package graft.sources

/** WARC (ISO 28500 / WARC/1.x) record parsing — the container a web
  * crawl actually arrives in (Common Crawl et al.): a record is a
  * version line, CRLF-terminated named headers, an empty line, then a
  * `Content-Length`-delimited content block; `response` records carry
  * an HTTP/1.x message (status line + headers + body) as that block.
  * One record per row is the operator unit here — splitting a
  * multi-record (usually per-record-gzipped) WARC file into records is
  * the file source's job, exactly like parquet row groups.
  *
  * Parsing contract ([[parseRecord]]):
  *  - version line `WARC/0.18|1.0|1.1`; header names case-insensitive,
  *    values trimmed; `Content-Length` REQUIRED and must fit the
  *    payload (a truncated block is a broken record, not a short one);
  *  - obs-fold (continuation lines) is rejected, not guessed;
  *  - `response` records whose `Content-Type` is
  *    `application/http` parse the HTTP message too: status code from
  *    the status line, `Content-Type` from the HTTP headers, body =
  *    the bytes after the header terminator (trusting the HTTP
  *    `Content-Length` when present and consistent, else the rest of
  *    the block);
  *  - other record types (`warcinfo`, `request`, `metadata`, …) keep
  *    their raw block as the body with no HTTP facts.
  * Malformed input throws — the extraction layer nulls the row, the
  * codec-family contract ([[graft.operators.WebpCodec]] discipline).
  */
object WarcCodec {

  final case class WarcRecord(warcType: String,
                              targetUri: String,
                              httpStatus: Integer,
                              contentType: String,
                              location: String,
                              body: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"warc: $msg")

  /** Index of the next CRLF at/after `from`, or -1. */
  private def crlfAt(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse CRLF-terminated `Name: value` headers starting at `from`
    * until the empty line; returns (lowercased name → trimmed value,
    * offset past the empty line).
    */
  private def parseHeaders(b: Array[Byte], from: Int)
      : (Map[String, String], Int) = {
    var at = from
    val out = Map.newBuilder[String, String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    while (true) {
      val eol = crlfAt(b, at)
      if (eol < 0) fail("unterminated header block")
      if (eol == at) return (out.result(), at + 2) // empty line
      val line = new String(b, at, eol - at, "ISO-8859-1")
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t')
        fail("obs-fold header continuation unsupported")
      val colon = line.indexOf(':')
      if (colon <= 0) fail(s"malformed header line '$line'")
      val name = line.substring(0, colon).toLowerCase.trim
      // a duplicated framing header is a smuggling-shaped ambiguity —
      // silently keeping either occurrence picks a side; reject instead
      // (headers that legally repeat, e.g. WARC-Concurrent-To, are not
      // framing-critical and keep last-wins)
      if ((name == "content-length" || name == "content-type") &&
          !seen.add(name))
        fail(s"duplicate $name header")
      out += (name -> line.substring(colon + 1).trim)
      at = eol + 2
    }
    sys.error("unreachable")
  }

  def parseRecord(bytes: Array[Byte]): WarcRecord = {
    val verEnd = crlfAt(bytes, 0)
    if (verEnd < 0) fail("missing version line")
    val version = new String(bytes, 0, verEnd, "US-ASCII")
    if (version != "WARC/1.0" && version != "WARC/1.1" &&
        version != "WARC/0.18")
      fail(s"unsupported version '$version'")
    val (headers, blockAt) = parseHeaders(bytes, verEnd + 2)
    val warcType = headers.getOrElse("warc-type", fail("missing WARC-Type"))
    val lenStr = headers.getOrElse("content-length",
      fail("missing Content-Length"))
    if (!lenStr.forall(c => c >= '0' && c <= '9'))
      fail(s"bad Content-Length '$lenStr'")
    val len = lenStr.toInt
    if (blockAt + len > bytes.length) fail("content block truncated")
    val block = java.util.Arrays.copyOfRange(bytes, blockAt, blockAt + len)
    val uri = headers.getOrElse("warc-target-uri", null)
    val recCt = headers.getOrElse("content-type", "")
    // MIME types are case-insensitive (RFC 2045) — header NAMES are
    // lowercased by parseHeaders but VALUES arrive verbatim, and a
    // case-sensitive check would silently skip the HTTP parse and
    // leak raw headers into the body
    if (warcType == "response" && recCt.toLowerCase(java.util.Locale.ROOT)
        .startsWith("application/http")) {
      // the block is an HTTP/1.x response message
      val stEnd = crlfAt(block, 0)
      if (stEnd < 0) fail("http: missing status line")
      val status = new String(block, 0, stEnd, "ISO-8859-1")
      val parts = status.split(" ", 3)
      if (parts.length < 2 || !parts(0).startsWith("HTTP/"))
        fail(s"http: bad status line '$status'")
      if (!parts(1).forall(c => c >= '0' && c <= '9'))
        fail(s"http: bad status code '${parts(1)}'")
      val (httpHeaders, bodyAt) = parseHeaders(block, stEnd + 2)
      val body0 = java.util.Arrays.copyOfRange(block, bodyAt, block.length)
      val body = httpHeaders.get("content-length") match {
        case Some(cl) if cl.forall(c => c >= '0' && c <= '9') =>
          val n = cl.toInt
          if (n > body0.length) fail("http: body truncated")
          java.util.Arrays.copyOfRange(body0, 0, n)
        case _ => body0
      }
      WarcRecord(warcType, uri, parts(1).toInt,
        httpHeaders.getOrElse("content-type", null),
        // the redirect-discovery channel's input: 3xx responses name
        // their successor here (RFC 9110 §10.2.2; may be RELATIVE —
        // resolution against the target URI is the caller's step)
        httpHeaders.getOrElse("location", null), body)
    } else WarcRecord(warcType, uri, null, null, null, block)
  }

  /** Fixture encoder — a real single WARC record, response or plain;
    * `location` adds the HTTP Location header (redirect fixtures).
    */
  def encodeResponse(uri: String, status: Int, contentType: String,
                     body: Array[Byte],
                     date: String = "2026-01-01T00:00:00Z",
                     location: String = null): Array[Byte] = {
    val http = new java.io.ByteArrayOutputStream()
    val loc = if (location == null) "" else s"Location: $location\r\n"
    http.write((s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" + loc +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII"))
    http.write(body)
    val block = http.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write((s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("US-ASCII"))
    out.write(block)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  def encodeInfo(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII"))
    out.write(body)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }
}
