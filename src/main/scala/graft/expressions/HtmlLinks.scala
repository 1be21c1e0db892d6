package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Outlink extraction from HTML — the first stage of building a crawl
  * link graph (host ranking, frontier discovery, spam neighborhoods).
  * One pass over the markup collecting the `href` of every `<a>` and
  * `<area>` element, in document order, duplicates kept (the caller
  * dedups when building edges; multiplicity is signal for some uses):
  *
  *  - attribute scanning is quote-aware (a `>` inside `href="a>b"`
  *    does not end the tag) and case-insensitive (`HREF`, `<A`),
  *  - values may be double-quoted, single-quoted, or unquoted,
  *  - character entities in the value are decoded (`&amp;` is how a
  *    conformant page writes `&` in a URL; numeric forms too),
  *  - surrounding ASCII whitespace is trimmed (the HTML spec strips
  *    it before resolving),
  *  - non-navigational refs are dropped: empty, fragment-only
  *    (`#top`), and `javascript:` / `mailto:` / `tel:` / `data:`
  *    schemes (scheme match is case-insensitive),
  *  - `<script>`/`<style>` bodies and comments are skipped whole, so
  *    markup inside code samples doesn't fabricate links,
  *  - a second `href` in the same tag is ignored (first wins, as
  *    browsers do),
  *  - with `skipNofollow`, anchors whose `rel` token list contains
  *    `nofollow` are dropped — the link-graph semantics (nofollow
  *    exists to not pass rank); extraction-for-display keeps them.
  *
  * NULL input → NULL; text with no anchors → empty array. Narrow and
  * codegen'd — one row in, one string array out, no parse tree. The
  * hrefs come out RAW (as written, minus entities); resolution against
  * the page URL is [[ResolveUrl]], kept separate so the two stages are
  * independently testable and the raw form stays available. */
case class HtmlLinks(child: Expression, skipNofollow: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_links needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "html_links"

  override def nullSafeEval(input: Any): Any =
    HtmlLinks.extract(input.asInstanceOf[UTF8String], skipNofollow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HtmlLinks.extract($c, $skipNofollow);
    """)

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

/** The page's first `<base href>`, or NULL — extracted through the
  * same comment/script-aware scan as [[HtmlLinks]] (a `<base>` inside
  * a comment or code sample never hijacks resolution). The value is
  * raw as written (entities decoded) and may itself be relative;
  * resolve it against the page URL before use. */
case class HtmlBase(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_base needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_base"

  override def nullSafeEval(input: Any): Any =
    HtmlLinks.baseHref(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HtmlLinks.baseHref($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): HtmlBase =
    copy(child = newChild)
}

object HtmlLinks {

  // hard cap on links per document: a crafted page with millions of
  // anchors stays bounded (real pages top out in the low thousands)
  private val MaxLinks = 10000

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Decode the entity forms that appear inside attribute values:
    * numeric `&#NNN;` / `&#xHH;` and the five XML-safe named entities.
    * Unknown entities pass through literally (same policy as
    * [[HtmlText]]). */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        var j = i + 1
        val limit = math.min(n, i + 11)
        while (j < limit && s.charAt(j) != ';') j += 1
        var decoded: String = null
        if (j < limit && j > i + 1) {
          val body = s.substring(i + 1, j)
          if (body.charAt(0) == '#') {
            val cp =
              try {
                if (body.length > 2 &&
                  (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                  Integer.parseInt(body.substring(2), 16)
                else Integer.parseInt(body.substring(1), 10)
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0x20 && cp <= 0x10ffff &&
              !(cp >= 0xd800 && cp <= 0xdfff))
              decoded = new String(Character.toChars(cp))
          } else decoded = body match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ => null
          }
        }
        if (decoded != null) { out.append(decoded); i = j + 1 }
        else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** True for refs that never navigate: empty, fragment-only, or a
    * non-fetchable scheme. */
  private def dropRef(ref: String): Boolean = {
    if (ref.isEmpty || ref.charAt(0) == '#') return true
    val colon = ref.indexOf(':')
    if (colon <= 0) return false
    // only a syntactically valid scheme prefix counts as a scheme
    var k = 0
    var schemeLike = Character.isLetter(ref.charAt(0))
    while (schemeLike && k < colon) {
      val c = ref.charAt(k)
      if (!(Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'))
        schemeLike = false
      k += 1
    }
    if (!schemeLike) return false
    val scheme = ref.substring(0, colon).toLowerCase
    scheme == "javascript" || scheme == "mailto" || scheme == "tel" ||
      scheme == "data" || scheme == "about"
  }

  def extract(html: UTF8String): ArrayData = extract(html, false)

  def extract(html: UTF8String, skipNofollow: Boolean): ArrayData = {
    if (html == null) return null
    walk(html.toString, skipNofollow, stopAtBase = false)._1
  }

  /** The page's first `<base href>` (browsers use the first), or null —
    * through the SAME comment/script-aware scan as link extraction, so
    * a base inside a comment or a code sample can never hijack the
    * resolution base the way a bare regex would allow. */
  def baseHref(html: UTF8String): UTF8String = {
    if (html == null) return null
    val b = walk(html.toString, skipNofollow = false, stopAtBase = true)._2
    if (b == null || b.isEmpty) null else UTF8String.fromString(b)
  }

  private def walk(s: String, skipNofollow: Boolean,
      stopAtBase: Boolean): (ArrayData, String) = {
    val n = s.length
    val out = new java.util.ArrayList[UTF8String]()
    var base: String = null
    var i = 0

    def lowerAt(j: Int, lit: String): Boolean =
      j + lit.length <= n && {
        var k = 0
        while (k < lit.length &&
          Character.toLowerCase(s.charAt(j + k)) == lit.charAt(k)) k += 1
        k == lit.length
      }

    // index just past the tag's closing '>'. Quotes open a value ONLY
    // right after '=' (as the HTML5 tokenizer sees them) — a stray
    // quote inside an unquoted value must not swallow the rest of the
    // document (it would desynchronize from findHref, which applies
    // the same rule)
    def tagEnd(from: Int): Int = {
      var j = from
      var afterEq = false
      while (j < n) {
        val c = s.charAt(j)
        if ((c == '"' || c == '\'') && afterEq) {
          j += 1
          while (j < n && s.charAt(j) != c) j += 1
          if (j < n) j += 1
          afterEq = false
        } else if (c == '>') return j + 1
        else {
          if (c == '=') afterEq = true
          else if (!isWs(c)) afterEq = false
          j += 1
        }
      }
      n
    }

    // scan the attributes of the tag whose name ends at `from`; return
    // (raw href value or null, rel value or null)
    def findHref(from: Int): (String, String) = {
      var j = from
      var href: String = null
      var rel: String = null
      while (j < n && s.charAt(j) != '>') {
        if (isWs(s.charAt(j))) j += 1
        else if (s.charAt(j) == '/') j += 1
        else {
          // attribute name
          val nameStart = j
          while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '=' &&
            s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
          val name = s.substring(nameStart, j).toLowerCase
          while (j < n && isWs(s.charAt(j))) j += 1
          var value: String = null
          if (j < n && s.charAt(j) == '=') {
            j += 1
            while (j < n && isWs(s.charAt(j))) j += 1
            if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
              val q = s.charAt(j)
              val vStart = j + 1
              j += 1
              while (j < n && s.charAt(j) != q) j += 1
              value = s.substring(vStart, math.min(j, n))
              if (j < n) j += 1
            } else {
              val vStart = j
              while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
              value = s.substring(vStart, j)
            }
          }
          if (name == "href" && href == null && value != null) href = value
          if (name == "rel" && rel == null && value != null) rel = value
        }
      }
      (href, rel)
    }

    // HTML rel is a space-separated token list; match the token, not a
    // substring ("nofollowme" is not nofollow)
    def hasNofollow(rel: String): Boolean =
      rel != null && rel.toLowerCase.split("[ \t\n\r\f]+")
        .contains("nofollow")

    while (i < n && out.size < MaxLinks) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        if (lowerAt(i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val name = if (lowerAt(i, "<script")) "script" else "style"
          val end = tagEnd(i + 1)
          val selfClosed = end >= 2 && end <= n && s.charAt(end - 2) == '/'
          if (selfClosed) i = end
          else {
            val close = "</" + name
            var k = end
            var stop = -1
            while (stop < 0 && k < n) {
              if (s.charAt(k) == '<' && lowerAt(k, close)) stop = k
              k += 1
            }
            i = if (stop < 0) n else tagEnd(stop + 2 + name.length)
          }
        } else {
          // anchor-family tag? name must end at whitespace / '>' / '/'
          val isA = lowerAt(i, "<a") && i + 2 < n &&
            (isWs(s.charAt(i + 2)) || s.charAt(i + 2) == '>' ||
              s.charAt(i + 2) == '/')
          val isArea = lowerAt(i, "<area") && i + 5 < n &&
            (isWs(s.charAt(i + 5)) || s.charAt(i + 5) == '>' ||
              s.charAt(i + 5) == '/')
          val isBase = lowerAt(i, "<base") && i + 5 < n &&
            (isWs(s.charAt(i + 5)) || s.charAt(i + 5) == '>' ||
              s.charAt(i + 5) == '/')
          if (isA || isArea || isBase) {
            val nameEnd = if (isA) i + 2 else i + 5
            val end = tagEnd(nameEnd)
            // a tag cut off by EOF emits nothing (HTML5 eof-in-tag:
            // the whole tag is discarded; truncated docs must not
            // fabricate half an href)
            if (end <= n && end > nameEnd && s.charAt(end - 1) == '>') {
              val (raw, rel) = findHref(nameEnd)
              if (isBase) {
                if (base == null && raw != null) {
                  base = decodeEntities(raw.trim)
                  if (stopAtBase) return (null, base)
                }
              } else if (raw != null && !(skipNofollow && hasNofollow(rel))) {
                val ref = decodeEntities(raw.trim)
                if (!dropRef(ref)) out.add(UTF8String.fromString(ref))
              }
            }
            i = end
          } else if (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?') {
            i = tagEnd(i + 1)
          } else if (Character.isLetter(s.charAt(i + 1)) ||
            s.charAt(i + 1) == '/') {
            i = tagEnd(i + 1)
          } else i += 1
        }
      } else i += 1
    }
    (new GenericArrayData(out.toArray(new Array[UTF8String](out.size))), base)
  }
}
