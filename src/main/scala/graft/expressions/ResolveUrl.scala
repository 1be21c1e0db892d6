package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution: `resolve_url(base, ref)` returns
  * the absolute URL that `ref` (an href as written in a page at `base`)
  * points to — the step between [[HtmlLinks]] extraction and link-graph
  * construction. Implements the reference-resolution algorithm of the
  * spec (§5.2.2) with dot-segment removal (§5.2.4):
  *
  *  - `ref` with a scheme is returned as-is (already absolute;
  *    dot-segments kept per the spec's non-strict note — crawlers keep
  *    the URL the author wrote),
  *  - network-path refs (`//host/x`) take the base's scheme,
  *  - absolute-path refs (`/x`) take scheme+authority,
  *  - relative-path refs merge with the base path up to its last `/`
  *    and then remove `.` / `..` segments,
  *  - query-only (`?q`) and empty refs keep the base path,
  *  - fragments are DROPPED from the result (a link graph's target is
  *    the resource, not a position in it; `#frag`-only refs resolve to
  *    the base without fragment).
  *
  * NULL on: NULL inputs, a base with no scheme or a non-hierarchical
  * base (`mailto:x`) given a relative ref, or refs/bases longer than
  * 8 KiB (crafted input stays bounded). No percent-decoding happens —
  * resolution is defined on the encoded form. Narrow, codegen'd. */
case class ResolveUrl(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"resolve_url needs (string, string), got $other")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"

  override def nullSafeEval(base: Any, ref: Any): Any =
    ResolveUrl.resolve(base.asInstanceOf[UTF8String],
      ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = graft.expressions.ResolveUrl.resolve($b, $r);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ResolveUrl = copy(left = newLeft, right = newRight)
}

object ResolveUrl {

  private val MaxLen = 8192

  /** Length of a syntactically valid scheme prefix ("http:" → 4), or
    * -1 if `s` does not start with `scheme:`. */
  private def schemeLen(s: String): Int = {
    if (s.isEmpty || !Character.isLetter(s.charAt(0))) return -1
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return i
      if (!(Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'))
        return -1
      i += 1
    }
    -1
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new java.util.ArrayList[String]()
    var endsSlash = false
    var i = 0
    val n = path.length
    val leadingSlash = n > 0 && path.charAt(0) == '/'
    while (i < n) {
      while (i < n && path.charAt(i) == '/') i += 1
      if (i < n) {
        val start = i
        while (i < n && path.charAt(i) != '/') i += 1
        val seg = path.substring(start, i)
        endsSlash = i < n // a trailing segment with no '/' after it
        if (seg == ".") { endsSlash = true }
        else if (seg == "..") {
          if (!out.isEmpty) out.remove(out.size - 1)
          endsSlash = true
        } else out.add(seg)
      }
    }
    val sb = new java.lang.StringBuilder(n)
    var k = 0
    while (k < out.size) {
      if (k > 0 || leadingSlash) sb.append('/')
      sb.append(out.get(k))
      k += 1
    }
    if ((endsSlash || (n > 0 && path.charAt(n - 1) == '/')) &&
      (sb.length == 0 || sb.charAt(sb.length - 1) != '/'))
      sb.append('/')
    if (sb.length == 0 && leadingSlash) "/" else sb.toString
  }

  /** Split `s` (after its scheme, if cut off) into
    * (authority or null, path, query-with-'?' or ""). Fragment must
    * already be removed. */
  private def splitHier(s: String): (String, String, String) = {
    var rest = s
    var query = ""
    val qm = rest.indexOf('?')
    if (qm >= 0) { query = rest.substring(qm); rest = rest.substring(0, qm) }
    if (rest.startsWith("//")) {
      var j = 2
      while (j < rest.length && rest.charAt(j) != '/') j += 1
      (rest.substring(2, j), rest.substring(j), query)
    } else (null, rest, query)
  }

  private def stripFragment(s: String): String = {
    val h = s.indexOf('#')
    if (h < 0) s else s.substring(0, h)
  }

  def resolve(baseU: UTF8String, refU: UTF8String): UTF8String = {
    if (baseU == null || refU == null) return null
    if (baseU.numChars() > MaxLen || refU.numChars() > MaxLen) return null
    val ref = stripFragment(refU.toString.trim)
    // absolute ref: return as written (fragment stripped)
    if (schemeLen(ref) > 0) return UTF8String.fromString(ref)

    val base = stripFragment(baseU.toString.trim)
    val bSchemeLen = schemeLen(base)
    if (bSchemeLen <= 0) return null
    val scheme = base.substring(0, bSchemeLen)
    val (bAuth, bPath, bQuery) = splitHier(base.substring(bSchemeLen + 1))

    var tAuth: String = null
    var tPath: String = null
    var tQuery: String = null
    if (ref.startsWith("//")) {
      val (a, p, q) = splitHier(ref)
      tAuth = a; tPath = removeDotSegments(p); tQuery = q
    } else if (ref.isEmpty) {
      tAuth = bAuth; tPath = bPath; tQuery = bQuery
    } else if (ref.charAt(0) == '?') {
      tAuth = bAuth; tPath = bPath; tQuery = ref
    } else if (ref.charAt(0) == '/') {
      val (_, p, q) = splitHier(ref)
      tAuth = bAuth; tPath = removeDotSegments(p); tQuery = q
    } else {
      // relative path: merge (§5.2.3)
      if (bAuth == null && !bPath.startsWith("/") && bPath.nonEmpty)
        return null // non-hierarchical base (mailto:, urn:)
      val (_, pRaw, q) = splitHier(ref)
      val merged =
        if (bAuth != null && bPath.isEmpty) "/" + pRaw
        else {
          val cut = bPath.lastIndexOf('/')
          (if (cut < 0) "" else bPath.substring(0, cut + 1)) + pRaw
        }
      tAuth = bAuth; tPath = removeDotSegments(merged); tQuery = q
    }

    val sb = new java.lang.StringBuilder(base.length + ref.length)
    sb.append(scheme).append(':')
    if (tAuth != null) {
      sb.append("//").append(tAuth)
      if (tPath.nonEmpty && tPath.charAt(0) != '/') sb.append('/')
    }
    sb.append(tPath).append(tQuery)
    UTF8String.fromString(sb.toString)
  }
}
