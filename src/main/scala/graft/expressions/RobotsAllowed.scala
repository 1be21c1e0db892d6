package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Robots Exclusion Protocol (RFC 9309) evaluation:
  * `robots_allowed(robotsTxt, path)` — may `userAgent` (a constructor
  * parameter, lowercased product token) fetch `path` under this
  * robots.txt?
  *
  * Implements the RFC's rules:
  *  - groups are runs of `User-agent:` lines followed by
  *    `Allow:`/`Disallow:` rules; ALL groups naming the chosen agent
  *    merge,
  *  - the chosen agent is the longest product token that is a prefix
  *    of `userAgent` (case-insensitive), else the `*` group,
  *  - rule paths support the RFC's `*` wildcard and `$` end anchor,
  *  - the matching rule with the LONGEST pattern (octet length) wins;
  *    on a tie, Allow wins,
  *  - an empty `Disallow:` matches nothing (allows everything); no
  *    matching rule → allowed; comments (`#`) strip; unknown lines
  *    (Crawl-delay, Sitemap) are ignored,
  *  - a NULL robots body → allowed (the RFC's unavailable-is-allowed
  *    posture for 404s; callers treat fetch *errors* separately).
  *
  * `path` is the URL's path-plus-query as the RFC matches it
  * (`/dir/page?x=1`); an empty path means `/`. Bodies over 500 KiB
  * (the RFC's own parsing limit) are truncated at the last complete
  * line. One pass per row, codegen'd. */
case class RobotsAllowed(left: Expression, right: Expression,
    userAgent: String) extends BinaryExpression {
  require(userAgent.nonEmpty && userAgent == userAgent.toLowerCase,
    s"userAgent must be a non-empty lowercase token, got '$userAgent'")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed needs (string robotsTxt, string path), got $other")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "robots_allowed"

  // NULL body → allowed, so the expression itself is never null
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val body = left.eval(input)
    val path = right.eval(input)
    if (body == null) true
    else RobotsAllowed.allowed(body.asInstanceOf[UTF8String],
      if (path == null) null else path.asInstanceOf[UTF8String], userAgent)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ua = ctx.addReferenceObj("ua", userAgent, "java.lang.String")
    val b = left.genCode(ctx)
    val p = right.genCode(ctx)
    ev.copy(code = code"""
      ${b.code}
      ${p.code}
      boolean ${ev.isNull} = false;
      boolean ${ev.value} = true;
      if (!${b.isNull}) {
        ${ev.value} = graft.expressions.RobotsAllowed.allowed(
          ${b.value}, ${p.isNull} ? null : ${p.value}, $ua);
      }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

object RobotsAllowed {

  private val MaxBody = 500 * 1024

  /** One parsed rule: allow flag + pattern (with `*` / `$`). */
  private final case class Rule(allow: Boolean, pattern: String)

  /** RFC 9309 §2.2.2 pattern match: literal except `*` (any run) and a
    * trailing `$` (end anchor). Iterative greedy-with-backtrack. */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // segments between '*'s must appear in order; first segment anchors
    // at 0; with '$', the last segment must END the path
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment must match at the very end, at or after pos
        return path.length - seg.length >= pos && path.endsWith(seg)
      } else if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    // single-segment anchored pattern (no '*'): must match the WHOLE
    // path — a bare "$" rule matches only the empty path, i.e. nothing
    // a real request path can satisfy
    if (anchored) pos == path.length else true
  }

  /** Parse the body and answer for (path, ua). */
  def allowed(bodyU: UTF8String, pathU: UTF8String, ua: String): Boolean = {
    val rawBody = bodyU.toString
    val body = if (rawBody.length <= MaxBody) rawBody else {
      val cut = rawBody.lastIndexOf('\n', MaxBody)
      rawBody.substring(0, math.max(cut, 0))
    }
    val path0 = if (pathU == null) "/" else pathU.toString
    val path = if (path0.isEmpty) "/" else path0

    // collect rules of the best-matching agent: longest UA token that
    // prefixes `ua`; fall back to "*"
    var bestToken: String = null
    val lines = body.split("\r?\n", -1)
    // pass 1: find the best UA token present
    for (raw <- lines) {
      val line = stripComment(raw)
      val (key, value) = splitField(line)
      if (key == "user-agent" && value.nonEmpty) {
        val tok = value.toLowerCase
        if (tok == "*") {
          if (bestToken == null) bestToken = "*"
        } else if (ua.startsWith(tok)) {
          if (bestToken == null || bestToken == "*" ||
            tok.length > bestToken.length) bestToken = tok
        }
      }
    }
    if (bestToken == null) return true // no groups at all

    // pass 2: merge rules from every group whose UA set contains the token
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var groupActive = false
    var inUaRun = false
    for (raw <- lines) {
      val line = stripComment(raw)
      val (key, value) = splitField(line)
      key match {
        case "user-agent" =>
          if (!inUaRun) { groupActive = false; inUaRun = true }
          val tok = value.toLowerCase
          if (tok == bestToken) groupActive = true
        case "allow" | "disallow" =>
          inUaRun = false
          if (groupActive && value.nonEmpty)
            rules += Rule(key == "allow", value)
          // empty Disallow/Allow: matches nothing — skip
        case _ =>
          if (key.nonEmpty) inUaRun = false
      }
    }

    // longest matching pattern wins; allow wins ties; none → allowed
    var bestLen = -1
    var bestAllow = true
    for (r <- rules) {
      if (matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  private def stripComment(line: String): String = {
    val h = line.indexOf('#')
    (if (h < 0) line else line.substring(0, h)).trim
  }

  /** "Key: value" → (lowercased key, value); ("", "") for non-fields. */
  private def splitField(line: String): (String, String) = {
    val c = line.indexOf(':')
    if (c <= 0) ("", "")
    else (line.substring(0, c).trim.toLowerCase, line.substring(c + 1).trim)
  }
}
