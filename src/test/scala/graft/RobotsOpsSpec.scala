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

  test("comments and unknown directives are ignored; wildcard rules " +
      "are refused, not half-matched") {
    val r = "# intro\nUser-agent: *\nCrawl-delay: 10\n" +
      "Disallow: /a # trailing\nDisallow: /b*\nDisallow: /c$\n"
    assert(!ok(r, "/a/x"))
    assert(ok(r, "/b/anything"), "a * rule must be ignored entirely")
    assert(ok(r, "/c"), "a $ rule must be ignored entirely")
  }
}
