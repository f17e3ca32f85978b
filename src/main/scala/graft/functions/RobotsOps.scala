package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation — the crawl-side politeness gate
  * ([[graft.functions.UrlOps]]'s sibling: the DOMAIN carries a policy
  * document, every fetched path is judged against it). Semantics per
  * the Robots Exclusion Protocol (RFC 9309):
  *
  *  - the file is `User-agent:` groups of `Allow:`/`Disallow:` rules;
  *    a group applies to an agent when its product token matches
  *    case-insensitively, `*` matches every agent;
  *  - the MOST SPECIFIC group wins group selection: if any group names
  *    the agent exactly, the `*` groups are ignored; consecutive
  *    `User-agent` lines share one rule group;
  *  - within the selected rules, the LONGEST matching path prefix
  *    decides; on equal length `Allow` wins; no matching rule means
  *    allowed; an empty `Disallow:` value matches nothing (the
  *    classic "allow all" idiom);
  *  - unknown directives and comments (`#…`) are ignored; matching
  *    implements the FULL RFC 9309 §2.2.3 special characters: `*`
  *    matches any sequence of octets (including none) anywhere in the
  *    pattern, a trailing `$` anchors the pattern to the END of the
  *    path (a `$` anywhere else is a literal octet, the reference-
  *    parser behavior), and a pattern without `$` matches as a
  *    prefix. Rule precedence is the ORIGINAL pattern's octet length
  *    (RFC 9309 "most octets"), so `Disallow: /private*` (9) still
  *    outranks `Allow: /private` (8) on `/private/x`;
  *
  * Two expression forms:
  *  - [[RobotsOps.robotsRules]] + [[RobotsOps.rulesAllowed]] — the
  *    PRODUCTION pair: parse each domain's file ONCE on the small
  *    side of the broadcast join (domains ≪ pages) into an
  *    array<struct<allow, prefix>>, then per page row only the
  *    longest-prefix match runs. Parsing cost is O(domains), not
  *    O(pages × robots size).
  *  - [[RobotsOps.robotsAllowed]] — the compact text-per-row form for
  *    ad-hoc use; it re-parses per evaluation and should not carry a
  *    corpus-wide join.
  */
object RobotsOps {

  def robotsAllowed(robotsTxt: Column, path: Column,
                    agent: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      RobotsAllowedExpr(
        org.apache.spark.sql.GraftBridge.expression(robotsTxt),
        org.apache.spark.sql.GraftBridge.expression(path), agent))

  /** Parse a robots.txt into the selected agent's rule list — run
    * this on the DOMAINS side, before the broadcast join.
    */
  def robotsRules(robotsTxt: Column, agent: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      RobotsRulesExpr(
        org.apache.spark.sql.GraftBridge.expression(robotsTxt), agent))

  /** Longest-prefix decision over a pre-parsed rule list — the
    * per-page half of the production pair.
    */
  def rulesAllowed(rules: Column, path: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      RobotsMatchExpr(
        org.apache.spark.sql.GraftBridge.expression(rules),
        org.apache.spark.sql.GraftBridge.expression(path)))

  /** Non-rule directives — `Crawl-delay` (group-scoped, de facto
    * standard) and `Sitemap` (document-wide per the sitemaps
    * protocol) — as one struct per robots file:
    * `struct<crawl_delay: double, sitemaps: array<string>>`. The
    * frontier's politeness-scheduling input, evaluated on the DOMAINS
    * side exactly like [[robotsRules]].
    */
  def robotsDirectives(robotsTxt: Column, agent: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      RobotsDirectivesExpr(
        org.apache.spark.sql.GraftBridge.expression(robotsTxt), agent))

  /** (crawl-delay for `agent` or None, sitemap URLs in document
    * order). Group selection matches [[rulesFor]] exactly (named
    * groups shadow `*`; consecutive `User-agent` lines share a group,
    * and — same as there — a directive line between two `User-agent`
    * lines does NOT split their run). A group's delay attaches under
    * the membership flags in force when its line is read. Several
    * delays in the selected groups take the MAXIMUM (a politeness
    * bound fails conservative, the wildcard-rule discipline); a value
    * that does not parse as a non-negative number is ignored as if
    * absent (RFC 9309 lenient-line discipline). `Sitemap` is
    * collected document-wide regardless of groups — the sitemaps
    * protocol scopes it to the whole site, not to an agent.
    */
  private[graft] def directivesFor(robots: String, agent: String)
      : (Option[Double], Seq[String]) = {
    val named = Seq.newBuilder[Double]
    val star = Seq.newBuilder[Double]
    val sitemaps = Seq.newBuilder[String]
    val anyNamed = walkGroups(robots, agent) {
      (name, value, groupNamed, groupStar) =>
        name match {
          case "crawl-delay" =>
            // a decimal per the strict grammar; anything else is
            // lenient-ignored AS IF ABSENT (a '7d' or hex-float form
            // must not smuggle a number through Java's parser)
            val d = StrictNum.decimal(value)
            if (d != null && d >= 0) {
              if (groupNamed) named += d.doubleValue
              if (groupStar) star += d.doubleValue
            }
            false // does NOT end the agent run (rulesFor contract)
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
            false
          case "allow" | "disallow" => true // rules end the run
          case _ => false
        }
    }
    val sel = if (anyNamed) named.result() else star.result()
    (if (sel.isEmpty) None else Some(sel.max), sitemaps.result())
  }

  /** The ONE robots.txt line walk both [[rulesFor]] and
    * [[directivesFor]] share — comment strip, `name: value` split,
    * and the User-agent group state machine (consecutive `User-agent`
    * lines form one run; a run ends only when `onDirective` says the
    * directive does). `onDirective(name, value, groupNamed,
    * groupStar)` sees every non-user-agent directive with the
    * membership flags in force on its line and returns whether it
    * ends the current agent run. Returns whether any group NAMED the
    * agent (the group-selection bit both consumers key on).
    */
  private def walkGroups(robots: String, agent: String)(
      onDirective: (String, String, Boolean, Boolean) => Boolean)
      : Boolean = {
    val agentLc = agent.toLowerCase
    var anyNamed = false
    var groupNamed = false
    var groupStar = false
    var inAgentRun = false
    robots.split("\n", -1).foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h < 0) raw else raw.substring(0, h)).trim
      }
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          if (name == "user-agent") {
            if (!inAgentRun) { groupNamed = false; groupStar = false }
            inAgentRun = true
            if (value == "*") groupStar = true
            else if (value.toLowerCase == agentLc) {
              groupNamed = true; anyNamed = true
            }
          } else if (onDirective(name, value, groupNamed, groupStar))
            inAgentRun = false
        }
      }
    }
    anyNamed
  }

  /** (isAllow, pattern, priority) rules for `agent`, per the
    * group-selection contract above. The pattern is the rule value
    * VERBATIM (wildcards included — [[patternMatches]] evaluates it);
    * `priority` is the pattern's octet length, RFC 9309's
    * "most octets" precedence, which for `Allow: /private` vs
    * `Disallow: /private*` correctly hands `/private/x` to the
    * 9-octet Disallow.
    */
  private[graft] def rulesFor(robots: String, agent: String)
      : Seq[(Boolean, String, Int)] = {
    val named = Seq.newBuilder[(Boolean, String, Int)]
    val star = Seq.newBuilder[(Boolean, String, Int)]
    val anyNamed = walkGroups(robots, agent) {
      (name, value, groupNamed, groupStar) =>
        name match {
          case "allow" | "disallow" =>
            val isAllow = name == "allow"
            if (value.nonEmpty) {
              // empty Disallow matches nothing; empty Allow likewise
              // adds nothing (the classic "allow all" idiom)
              if (groupNamed) named += ((isAllow, value, value.length))
              if (groupStar) star += ((isAllow, value, value.length))
            }
            true // a rule line ends the agent run
          // RFC 9309 §2.2.3: unrecognized lines MUST be ignored —
          // ignored means AS IF ABSENT, so a Crawl-delay/Sitemap
          // between two User-agent lines does NOT split their run
          // (splitting would drop rules the site meant for the
          // first agent, an under-blocking compliance bug)
          case _ => false
        }
    }
    if (anyNamed) named.result() else star.result()
  }

  /** RFC 9309 §2.2.3 pattern match: `*` matches any octet sequence
    * (including the empty one), a TRAILING `$` anchors the pattern to
    * the path end (elsewhere `$` is a literal, the public
    * reference-parser behavior), and an unanchored pattern matches as
    * a PREFIX. Iterative greedy match with single-star backtracking —
    * linear for the wildcard-free common case (it degenerates to
    * startsWith), O(|path|·|pattern|) worst case on hostile patterns,
    * bounded by the robots file's own line length.
    */
  private[graft] def patternMatches(pattern: String, path: String)
      : Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    val m = pat.length
    val n = path.length
    var p = 0
    var t = 0
    var star = -1
    var mark = 0
    if (m == 0) return !anchored || n == 0
    while (t < n) {
      if (p == m && !anchored) return true // prefix consumed
      if (p < m && pat.charAt(p) == '*') { star = p; p += 1; mark = t }
      else if (p < m && pat.charAt(p) == path.charAt(t)) { p += 1; t += 1 }
      else if (star >= 0) { p = star + 1; mark += 1; t = mark }
      else return false
    }
    // path exhausted: any remaining pattern must be stars
    while (p < m && pat.charAt(p) == '*') p += 1
    p == m
  }

  private[graft] def allowed(robots: String, path: String,
                             agent: String): Boolean = {
    var bestPrio = -1
    var bestAllow = true // no matching rule -> allowed
    rulesFor(robots, agent).foreach { case (isAllow, pattern, prio) =>
      if (patternMatches(pattern, path)) {
        if (prio > bestPrio || (prio == bestPrio && isAllow)) {
          bestPrio = prio
          bestAllow = isAllow
        }
      }
    }
    bestAllow
  }
}

/** `robots_allowed(robots_txt, path)` for a fixed agent → boolean
  * ([[RobotsOps]] contract).
  */
case class RobotsAllowedExpr(left: Expression, right: Expression,
                             agent: String)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "string robots text and path",
      (left.dataType.catalogString, left.dataType == StringType),
      (right.dataType.catalogString, right.dataType == StringType))

  override protected def nullSafeEval(robots: Any, path: Any): Any =
    RobotsOps.allowed(robots.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString, agent)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowedExpr =
    copy(left = newLeft, right = newRight)
}

/** `robots_rules(robots_txt)` for a fixed agent →
  * array<struct<allow: boolean, pattern: string, prio: int>> — the
  * parse half of the production pair, evaluated once per DOMAIN row.
  * `pattern` is the rule value verbatim (wildcards included); `prio`
  * its octet length (see [[RobotsOps.rulesFor]]).
  */
case class RobotsRulesExpr(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false),
    StructField("prio", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "robots_rules"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "string robots text",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  override protected def nullSafeEval(robots: Any): Any = {
    val rules =
      RobotsOps.rulesFor(robots.asInstanceOf[UTF8String].toString, agent)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rules.map { case (isAllow, pattern, prio) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](isAllow, UTF8String.fromString(pattern), prio))
      }.toArray[Any])
  }

  override protected def withNewChildInternal(
      newChild: Expression): RobotsRulesExpr = copy(child = newChild)
}

/** `rules_allowed(rules, path)` → boolean: most-octets-wins (Allow
  * wins ties) RFC 9309 pattern matching over a pre-parsed
  * [[RobotsRulesExpr]] list — the per-page half of the production
  * pair (no parsing, one [[RobotsOps.patternMatches]] sweep).
  */
case class RobotsMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "rules_allowed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName,
      "array<struct<allow, pattern, prio>> rules and a string path",
      (left.dataType.catalogString, left.dataType match {
        case ArrayType(s: StructType, _) => s.length == 3 &&
          s(0).dataType == BooleanType && s(1).dataType == StringType &&
          s(2).dataType == IntegerType
        case _ => false
      }),
      (right.dataType.catalogString, TextExprTypes.isString(right.dataType)))

  override protected def nullSafeEval(rulesAny: Any, pathAny: Any): Any = {
    val rules = rulesAny
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val path = pathAny.asInstanceOf[UTF8String].toString
    var bestPrio = -1
    var bestAllow = true // no matching rule -> allowed
    var i = 0
    while (i < rules.numElements()) {
      val row = rules.getStruct(i, 3)
      val pattern = row.getUTF8String(1).toString
      if (RobotsOps.patternMatches(pattern, path)) {
        val isAllow = row.getBoolean(0)
        val prio = row.getInt(2)
        if (prio > bestPrio || (prio == bestPrio && isAllow)) {
          bestPrio = prio
          bestAllow = isAllow
        }
      }
      i += 1
    }
    bestAllow
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatchExpr =
    copy(left = newLeft, right = newRight)
}

/** `robots_directives(robots_txt)` for a fixed agent →
  * struct<crawl_delay: double, sitemaps: array<string>> — the
  * politeness-scheduling half of the policy file
  * ([[RobotsOps.directivesFor]] contract). Evaluated once per DOMAIN
  * row, like [[RobotsRulesExpr]].
  */
case class RobotsDirectivesExpr(child: Expression, agent: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("crawl_delay", DoubleType, nullable = true),
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "robots_directives"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextExprTypes.expect(prettyName, "string robots text",
      (child.dataType.catalogString, TextExprTypes.isString(child.dataType)))

  override protected def nullSafeEval(robots: Any): Any = {
    val (delay, sitemaps) = RobotsOps.directivesFor(
      robots.asInstanceOf[UTF8String].toString, agent)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        delay.map(java.lang.Double.valueOf).orNull,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          sitemaps.map(UTF8String.fromString).toArray[Any])))
  }

  override protected def withNewChildInternal(
      newChild: Expression): RobotsDirectivesExpr = copy(child = newChild)
}
