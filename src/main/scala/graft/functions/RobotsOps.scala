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
  *  - unknown directives and comments (`#…`) are ignored; matching is
  *    plain byte-prefix (the `*`/`$` wildcard extension is NOT
  *    implemented — a wildcard rule is ignored rather than
  *    half-matched, and that refusal is the documented subset).
  *
  * The expression form takes the robots TEXT per row: the production
  * shape parses each domain's file once and broadcast-joins it onto
  * that domain's pages (domains ≪ pages), so the per-row parse cost
  * sits on the domains side of the join, not the corpus side.
  */
object RobotsOps {

  def robotsAllowed(robotsTxt: Column, path: Column,
                    agent: String): Column =
    org.apache.spark.sql.GraftBridge.column(
      RobotsAllowedExpr(
        org.apache.spark.sql.GraftBridge.expression(robotsTxt),
        org.apache.spark.sql.GraftBridge.expression(path), agent))

  /** (isAllow, pathPrefix) rules for `agent`, per the group-selection
    * contract above.
    */
  private[graft] def rulesFor(robots: String, agent: String)
      : Seq[(Boolean, String)] = {
    val agentLc = agent.toLowerCase
    val named = Seq.newBuilder[(Boolean, String)]
    val star = Seq.newBuilder[(Boolean, String)]
    var anyNamed = false
    // group state: which agents the CURRENT group names
    var groupNamed = false
    var groupStar = false
    var inAgentRun = false // consecutive User-agent lines share a group
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
          name match {
            case "user-agent" =>
              if (!inAgentRun) { groupNamed = false; groupStar = false }
              inAgentRun = true
              if (value == "*") groupStar = true
              else if (value.toLowerCase == agentLc) {
                groupNamed = true; anyNamed = true
              }
            case "allow" | "disallow" =>
              inAgentRun = false
              val isAllow = name == "allow"
              // empty Disallow matches nothing; empty Allow likewise
              // adds nothing; wildcard rules are refused, not guessed
              if (value.nonEmpty && !value.contains('*') &&
                  !value.contains('$')) {
                if (groupNamed) named += ((isAllow, value))
                if (groupStar) star += ((isAllow, value))
              }
            case _ => inAgentRun = false // unknown directive
          }
        }
      }
    }
    if (anyNamed) named.result() else star.result()
  }

  private[graft] def allowed(robots: String, path: String,
                             agent: String): Boolean = {
    var bestLen = -1
    var bestAllow = true // no matching rule -> allowed
    rulesFor(robots, agent).foreach { case (isAllow, prefix) =>
      if (path.startsWith(prefix)) {
        if (prefix.length > bestLen ||
            (prefix.length == bestLen && isAllow)) {
          bestLen = prefix.length
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
