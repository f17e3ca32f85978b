package graft

import graft.functions.RobotsOps

/** [[RobotsOps]] beyond the planted oracle: RFC 9309 group selection,
  * longest-match/tie rules, idioms and the wildcard refusal.
  */
class RobotsOpsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def ok(robots: String, path: String, agent: String = "bot") =
    RobotsOps.allowed(robots, path, agent)

  test("no rules / no match / empty Disallow => allowed") {
    assert(ok("", "/x"))
    assert(ok("User-agent: *\nDisallow: /private\n", "/public"))
    assert(ok("User-agent: *\nDisallow:\n", "/anything"))
  }

  test("named group shadows *; agent match is case-insensitive; " +
      "consecutive User-agent lines share a group") {
    val r = "User-agent: OtherBot\nUser-agent: Bot\nDisallow: /a\n\n" +
      "User-agent: *\nDisallow: /\n"
    assert(!ok(r, "/a", "BOT"))
    assert(ok(r, "/b", "BOT"), "the * catch-all must be ignored")
    assert(!ok(r, "/b", "stranger"), "* applies to unnamed agents")
    // all groups naming the agent merge
    val merged = "User-agent: bot\nDisallow: /a\n\n" +
      "User-agent: bot\nDisallow: /b\n"
    assert(!ok(merged, "/a") && !ok(merged, "/b") && ok(merged, "/c"))
  }

  test("longest match decides; Allow wins an equal-length tie") {
    val r = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert(!ok(r, "/a/x") && ok(r, "/a/b/deep"))
    val tie = "User-agent: *\nDisallow: /dup\nAllow: /dup\n"
    assert(ok(tie, "/dup/page"))
  }

  test("comments and unknown directives are ignored; RFC 9309 " +
      "wildcards match for real (the $ anchor no longer over-blocks)") {
    val r = "# intro\nUser-agent: *\nCrawl-delay: 10\n" +
      "Disallow: /a # trailing\nDisallow: /b*\nDisallow: /c$\n"
    assert(!ok(r, "/a/x"))
    assert(!ok(r, "/b/anything"), "star absorbs the rest")
    assert(!ok(r, "/c"), "the anchored pattern matches /c exactly")
    assert(ok(r, "/c/deep"),
      "the $ anchor does NOT match past the path end — the page the " +
        "old fail-closed approximation over-blocked is crawlable")
    assert(ok(r, "/d"), "unrelated paths stay allowed")
  }

  test("disallow-all idioms block everything; a wildcard Allow " +
      "carves real holes now") {
    assert(!ok("User-agent: *\nDisallow: /*\n", "/any/page"))
    assert(!ok("User-agent: *\nDisallow: *\n", "/any/page"))
    // a wildcard Allow matches and, at 12 octets vs 8, outranks the
    // Disallow (the old approximation dropped it and over-blocked)
    val r = "User-agent: *\nDisallow: /private\nAllow: /private/ok*\n"
    assert(ok(r, "/private/ok/page"),
      "a longer wildcard Allow carves a hole in the Disallow")
    assert(!ok(r, "/private/x"))
    assert(ok(r, "/public"))
    // most-octets precedence: 'Disallow: /private*' (9 octets)
    // outranks the equal-prefix 'Allow: /private' (8)
    val tie = "User-agent: *\nAllow: /private\nDisallow: /private*\n"
    assert(!ok(tie, "/private/x"),
      "the wildcard pattern is MORE specific than the equal prefix")
    assert(!ok(tie, "/private"))
    // but a genuinely LONGER Allow still wins, as RFC 9309 says
    val longer = "User-agent: *\nAllow: /private/ok\nDisallow: /priv*\n"
    assert(ok(longer, "/private/ok/page"))
    assert(!ok(longer, "/private/other"))
  }

  test("RFC 9309 §2.2.3 pattern vectors: mid-pattern stars, the end " +
      "anchor, literal mid-pattern $, greedy backtracking") {
    import RobotsOps.patternMatches
    // the published /fish* family
    for (path <- Seq("/fish", "/fishheads", "/fish.html",
      "/fish/salmon")) {
      assert(patternMatches("/fish*", path), path)
      assert(patternMatches("/fish", path), s"prefix form: $path")
    }
    assert(!patternMatches("/fish*", "/Fish"), "matching is case-sensitive")
    // the /*.php family
    assert(patternMatches("/*.php", "/index.php"))
    assert(patternMatches("/*.php", "/folder/filename.php"))
    assert(patternMatches("/*.php", "/filename.php?parameters"),
      "unanchored pattern is a prefix — the query tail may follow")
    assert(!patternMatches("/*.php", "/windows.PHP"))
    assert(!patternMatches("/*.php", "/php/"), "suffix must appear")
    // anchored: /*.php$ matches only paths ENDING in .php
    assert(patternMatches("/*.php$", "/filename.php"))
    assert(!patternMatches("/*.php$", "/filename.php?parameters"))
    assert(!patternMatches("/*.php$", "/filename.php5"))
    // greedy backtracking: the FIRST .php try must not eat the second
    assert(patternMatches("/*.php$", "/a.php/b.php"))
    // a $ not at the end is a literal octet
    assert(patternMatches("/a$b", "/a$b/c"))
    assert(!patternMatches("/a$b", "/ab"))
    // multiple stars
    assert(patternMatches("/*/y*z$", "/x/yWWz"))
    assert(!patternMatches("/*/y*z$", "/x/yWWzQ"))
    // a bare $ matches only the empty path; empty pattern everything
    assert(patternMatches("$", ""))
    assert(!patternMatches("$", "/"))
  }

  test("an unrecognized directive between consecutive User-agent " +
      "lines does NOT split their run (RFC 9309: ignored = absent)") {
    val r = "User-agent: a\nCrawl-delay: 10\nUser-agent: b\n" +
      "Disallow: /x\n"
    assert(!ok(r, "/x/page", "a"),
      "agent a must share the group with b across the ignored line")
    assert(!ok(r, "/x/page", "b"))
    assert(ok(r, "/y", "a"))
    // a rule still ENDS the run: the next User-agent starts a group
    val r2 = "User-agent: a\nDisallow: /x\nUser-agent: b\n" +
      "Disallow: /y\n"
    assert(!ok(r2, "/x", "a") && ok(r2, "/y", "a"))
    assert(!ok(r2, "/y", "b") && ok(r2, "/x", "b"))
  }

  test("the parse-once pair (rulesFor) carries exactly the rules " +
      "allowed() evaluates") {
    val r = "User-agent: bot\nDisallow: /a\nAllow: /a/b\n\n" +
      "User-agent: *\nDisallow: /z\n"
    val rules = RobotsOps.rulesFor(r, "bot")
    assert(rules == Seq((false, "/a", 2), (true, "/a/b", 4)))
    // a wildcard Disallow carries its pattern VERBATIM
    assert(RobotsOps.rulesFor(
      "User-agent: *\nDisallow: /p*\n", "bot")
      == Seq((false, "/p*", 3)))
    // decision parity across a path matrix
    for (p <- Seq("/a/x", "/a/b/c", "/z", "/w")) {
      val viaRules = {
        var bestPrio = -1
        var best = true
        rules.foreach { case (isAllow, pattern, prio) =>
          if (RobotsOps.patternMatches(pattern, p) && (prio > bestPrio ||
            (prio == bestPrio && isAllow))) {
            bestPrio = prio; best = isAllow
          }
        }
        best
      }
      assert(viaRules == ok(r, p, "bot"), p)
    }
  }
}
