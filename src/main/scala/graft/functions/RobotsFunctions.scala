package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the crawl-politeness gate every web pipeline runs between URL
  * discovery (x93/x95) and fetching: `robots_allowed(robots, agent,
  * path)` decides whether `agent` may fetch `path` under the given
  * robots.txt body.
  *
  * Semantics implemented (each from RFC 9309, spec-pinned in
  * RobotsSpec):
  *   - lines are `key: value` with `#` comments stripped; keys
  *     (`User-agent`, `Allow`, `Disallow`) case-insensitive; unknown
  *     keys ignored;
  *   - GROUPS: consecutive `User-agent` lines share the rule block that
  *     follows; a crawler obeys the group whose agent token is the
  *     LONGEST case-insensitive prefix of its product token, with `*`
  *     as the zero-length fallback; if several groups name the same
  *     token their rules merge;
  *   - RULES: a pattern matches a PREFIX of the path, `*` matches any
  *     character sequence, a trailing `$` anchors the end; the rule
  *     with the LONGEST pattern wins, `Allow` beating `Disallow` on
  *     equal length; an empty `Disallow:` matches nothing (allow-all);
  *     no matching rule → allowed (crawl-by-default).
  *
  * NULL only for null inputs; an empty/garbage robots body allows
  * everything (a missing robots.txt is an open site — the REP default).
  * Map-only; the match loop is bounded by pattern length × path length
  * per rule (the `*` backtrack is linear in practice because REP
  * patterns are short — robots files are human-written).
  */
case class RobotsAllowed(
    robotsExpr: Expression,
    agentExpr: Expression,
    pathExpr: Expression)
    extends TernaryExpression
    with CodegenFallback {

  override def first: Expression = robotsExpr
  override def second: Expression = agentExpr
  override def third: Expression = pathExpr
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  /** RFC 9309 §2.2.2: does `pattern` (with `*` and trailing `$`) match
    * a prefix of `path`? */
  private def matches(pattern: String, path: String): Boolean = {
    def go(pi: Int, si: Int): Boolean = {
      if (pi == pattern.length) return true // prefix matched
      val c = pattern.charAt(pi)
      if (c == '$' && pi == pattern.length - 1) return si == path.length
      if (c == '*') {
        var k = si
        while (k <= path.length) {
          if (go(pi + 1, k)) return true
          k += 1
        }
        false
      } else si < path.length && path.charAt(si) == c && go(pi + 1, si + 1)
    }
    go(0, 0)
  }

  override protected def nullSafeEval(rAny: Any, aAny: Any, pAny: Any): Any = {
    val robots = rAny.asInstanceOf[UTF8String].toString
    val agent = aAny.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val path = pAny.asInstanceOf[UTF8String].toString

    // parse into groups: (agentTokens, rules(allow, pattern))
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
    var inAgentRun = false
    robots.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty,
                scala.collection.mutable.ArrayBuffer.empty))
              inAgentRun = true
            }
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgentRun = false
            // rules before any User-agent line are ignored (RFC: rules
            // outside a group have no effect)
            if (groups.nonEmpty) groups.last._2 += ((key == "allow", value))
          case _ => inAgentRun = false // unknown keys end an agent run
        }
      }
    }

    // group selection: longest agent token that is a prefix of ours;
    // '*' participates at length 0; merge all groups with that token
    var bestToken: String = null
    groups.foreach { case (tokens, _) =>
      tokens.foreach { t =>
        val ok = t == "*" || agent.startsWith(t)
        val len = if (t == "*") -1 else t.length
        val bestLen =
          if (bestToken == null) Int.MinValue
          else if (bestToken == "*") -1
          else bestToken.length
        if (ok && len > bestLen) bestToken = t
      }
    }
    if (bestToken == null) return true // no applicable group: allowed
    val rules = groups.filter(_._1.contains(bestToken)).flatMap(_._2)

    // longest-match precedence, Allow wins ties; empty Disallow is
    // allow-all (matches nothing); no matching rule → allowed. Two
    // passes keep the precedence rule literal: find the longest
    // matching pattern length, then allow iff ANY Allow rule of that
    // length matches.
    var bestLen = -1
    rules.foreach { case (_, pat) =>
      if (pat.nonEmpty && matches(pat, path) && pat.length > bestLen)
        bestLen = pat.length
    }
    if (bestLen < 0) true
    else rules.exists { case (isAllow, pat) =>
      isAllow && pat.length == bestLen && matches(pat, path)
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(robotsExpr = f, agentExpr = s, pathExpr = t)
}
