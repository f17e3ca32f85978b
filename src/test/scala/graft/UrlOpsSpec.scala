package graft

import graft.functions.UrlOps

/** [[UrlOps]] beyond the planted-fixture oracle: parser edge cases,
  * the tracking-param policy, suffix-list boundaries, and the NULL
  * contract for everything that is not an absolute URL.
  */
class UrlOpsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def canon(u: String) = Option(UrlOps.canonical(u))

  test("case normalization touches scheme and host only") {
    assert(canon("HTTPS://WWW.Example.COM/Path/File?Q=V")
      .contains("https://www.example.com/Path/File?Q=V"))
  }

  test("default ports drop per scheme; explicit ports survive") {
    assert(canon("http://a.com:80/x").contains("http://a.com/x"))
    assert(canon("https://a.com:443/x").contains("https://a.com/x"))
    assert(canon("http://a.com:443/x").contains("http://a.com:443/x"))
    assert(canon("https://a.com:8080/x").contains("https://a.com:8080/x"))
    assert(canon("ftp://a.com:21/x").contains("ftp://a.com:21/x"))
  }

  test("fragments drop; empty path becomes /") {
    assert(canon("http://a.com#top").contains("http://a.com/"))
    assert(canon("http://a.com?b=1#x").contains("http://a.com/?b=1"))
    assert(canon("http://a.com").contains("http://a.com/"))
  }

  test("query canonicalization: tracking dropped, survivors sorted, " +
      "empties removed, all-tracking drops the '?'") {
    assert(canon("http://a.com/p?z=2&utm_source=x&a=1&&fbclid=q")
      .contains("http://a.com/p?a=1&z=2"))
    assert(canon("http://a.com/p?utm_campaign=x&gclid=1")
      .contains("http://a.com/p"))
    // a bare flag param (no '=') participates in the sort
    assert(canon("http://a.com/p?flag&a=1")
      .contains("http://a.com/p?a=1&flag"))
    // percent-encoding is NOT normalized
    assert(canon("http://a.com/p?a=%2F").contains("http://a.com/p?a=%2F"))
    // tracking-name match is ASCII-case-insensitive like the rest of
    // the parser: '?UTM_Source=x' keys identically to '?utm_source=x'
    assert(canon("http://a.com/p?UTM_Source=x&FBCLID=y&a=1")
      .contains("http://a.com/p?a=1"))
    assert(canon("http://a.com/p?GcLiD=z")
      .contains("http://a.com/p"))
    // survivors keep their original case (only the NAME check folds)
    assert(canon("http://a.com/p?Keep=Val&utm_x=1")
      .contains("http://a.com/p?Keep=Val"))
  }

  test("NULL contract: relative refs, missing host, junk, bad ports") {
    assert(canon("not a url 7").isEmpty)
    assert(canon("/relative/path").isEmpty)
    assert(canon("http:///nohost").isEmpty)
    assert(canon("http://a.com:80x/").isEmpty)
    assert(canon("1http://a.com/").isEmpty)
    assert(canon("").isEmpty)
  }

  test("overlong or out-of-range ports are junk -> NULL, never a " +
      "thrown task") {
    assert(canon("http://example.com:99999999999/").isEmpty)
    assert(canon("http://example.com:65536/").isEmpty)
    assert(canon("http://example.com:65535/x")
      .contains("http://example.com:65535/x"))
  }

  test("userinfo drops from the canonical key; a credential-spoof " +
      "host keys on the REAL domain") {
    assert(canon("http://bob@example.com/")
      .contains("http://example.com/"))
    assert(canon("http://u:p@example.com:8080/x")
      .contains("http://example.com:8080/x"))
    val spoof = UrlOps.parseCanonical("http://trusted.com@evil.com/")
    assert(spoof._2 == "evil.com")
    assert(UrlOps.domainOf(spoof._2) == "evil.com")
  }

  test("trailing-dot FQDN normalizes to the undotted host") {
    assert(canon("http://example.com./x")
      .contains("http://example.com/x"))
    assert(UrlOps.parseCanonical("http://example.com./")._2
      == "example.com")
  }

  test("bracketed IPv6 literals: consistent keys with and without " +
      "the default port; domain passes through") {
    assert(canon("http://[::1]/x").contains("http://[::1]/x"))
    assert(canon("http://[::1]:80/x").contains("http://[::1]/x"))
    assert(canon("http://[2001:DB8::1]:8080/x")
      .contains("http://[2001:db8::1]:8080/x"))
    assert(canon("http://[::1/x").isEmpty) // unclosed bracket
    assert(UrlOps.domainOf("[::1]") == "[::1]")
  }

  test("query params sort by UTF-8 BYTE order, not UTF-16 units") {
    // U+FFFD (EF BF BD) sorts BEFORE U+10000 (F0 90 80 80) in bytes,
    // AFTER it in UTF-16 code units (� > \uD800)
    val u = "http://a.com/p?a=𐀀&a=�"
    assert(canon(u).contains("http://a.com/p?a=�&a=𐀀"))
  }

  test("registrable domain: two labels by default, three over the " +
      "multi-label suffix snapshot, IPv4 and single labels pass through") {
    assert(UrlOps.domainOf("www.example.com") == "example.com")
    assert(UrlOps.domainOf("a.b.deep.example.org") == "example.org")
    assert(UrlOps.domainOf("www.example.co.uk") == "example.co.uk")
    assert(UrlOps.domainOf("user.github.io") == "user.github.io")
    assert(UrlOps.domainOf("x.user.github.io") == "user.github.io")
    // the suffix pair alone (no registrable label) keeps its two labels
    assert(UrlOps.domainOf("co.uk") == "co.uk")
    assert(UrlOps.domainOf("192.168.0.1") == "192.168.0.1")
    assert(UrlOps.domainOf("localhost") == "localhost")
  }
}
