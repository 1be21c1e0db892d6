package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Main-content text extraction from HTML — the stage a crawl corpus
  * runs before any text-quality/dedup operator: one pass over the
  * markup that
  *
  *  - drops `<script>`/`<style>` elements whole (their character data
  *    is code, not content; matching is case-insensitive and tolerant
  *    of attributes; an unterminated element drops the rest),
  *  - drops comments (`<!-- -->`), doctypes/CDATA (`<!...>`), and
  *    processing instructions (`<?...>`),
  *  - removes tags, skipping quoted attribute values (a `>` inside
  *    `href="a>b"` does not end the tag),
  *  - separates text: block-level tags (p, div, li, tr, h1-h6, …)
  *    break a line, table cells separate with a space, inline tags
  *    (b, i, a, span, …) join seamlessly,
  *  - decodes character entities — numeric `&#NNN;`/`&#xHH;` and the
  *    common named set (`&amp;` `&lt;` `&gt;` `&quot;` `&apos;`
  *    `&nbsp;` and friends); an unrecognized entity passes through
  *    literally,
  *  - collapses whitespace the way a renderer does: runs of source
  *    whitespace become one space, block boundaries become one
  *    newline, and the result is trimmed.
  *
  * A bare `<` that doesn't open a tag is literal text. NULL input →
  * NULL; non-HTML text passes through (minus entity/whitespace
  * normalization), so the operator is safe to run over a mixed corpus.
  * Narrow and codegen'd: one row in, one string out, no parse tree. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_text needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_text"

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HtmlText.extract($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  // block-level elements: a boundary on BOTH the opening and closing tag
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "tr", "table",
    "thead", "tbody", "tfoot", "caption", "h1", "h2", "h3", "h4", "h5",
    "h6", "blockquote", "pre", "section", "article", "aside", "header",
    "footer", "nav", "main", "figure", "figcaption", "hr", "form",
    "fieldset", "address", "center", "title", "body")

  private val CellTags: Set[String] = Set("td", "th")

  // the named entities that dominate real crawl text; anything else
  // passes through literally rather than guessing
  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "deg" -> "°",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "euro" -> "€", "pound" -> "£")

  def extract(html: UTF8String): UTF8String = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    var pending = 0 // 0 = none, 1 = space, 2 = newline
    def sep(k: Int): Unit = if (k > pending) pending = k

    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    def emitChar(c: Char): Unit = {
      if (isWs(c)) { if (out.length > 0) sep(1) }
      else {
        // pending separators apply between text runs only, so the
        // output needs no leading/trailing trim pass
        if (out.length > 0) {
          if (pending == 2) out.append('\n')
          else if (pending == 1) out.append(' ')
        }
        pending = 0
        out.append(c)
      }
    }

    def emit(text: String): Unit = {
      var j = 0
      while (j < text.length) { emitChar(text.charAt(j)); j += 1 }
    }

    // index just past the tag's closing '>', skipping quoted attribute
    // values; n when unterminated. Quotes open a value only right
    // after '=' (HTML5 tokenizer behavior) — a stray quote inside an
    // unquoted value must not swallow the rest of the document.
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

    def lowerAt(j: Int, lit: String): Boolean =
      j + lit.length <= n && {
        var k = 0
        while (k < lit.length &&
          Character.toLowerCase(s.charAt(j + k)) == lit.charAt(k)) k += 1
        k == lit.length
      }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (lowerAt(i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (c1 == '!' || c1 == '?') {
          i = tagEnd(i + 1)
        } else if (Character.isLetter(c1) || c1 == '/') {
          val nameStart = if (c1 == '/') i + 2 else i + 1
          var j = nameStart
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(nameStart, j).toLowerCase
          val closing = c1 == '/'
          val end = tagEnd(j)
          // a self-closed script/style ("<script/>") has no element body
          val selfClosed = end - 2 >= i && end <= n &&
            end >= 2 && s.charAt(end - 2) == '/'
          if (!closing && !selfClosed &&
              (name == "script" || name == "style")) {
            // drop the element body up to its case-insensitive close tag
            val close = "</" + name
            var k = end
            var stop = -1
            while (stop < 0 && k < n) {
              if (s.charAt(k) == '<' && lowerAt(k, close)) stop = k
              k += 1
            }
            i = if (stop < 0) n else tagEnd(stop + 2 + name.length)
            sep(2)
          } else {
            if (name.nonEmpty && BlockTags.contains(name)) sep(2)
            else if (name.nonEmpty && CellTags.contains(name)) sep(1)
            i = end
          }
        } else {
          emitChar('<'); i += 1 // literal '<' in text
        }
      } else if (c == '&') {
        // entity: up to ~10 name chars then ';'
        var j = i + 1
        val limit = math.min(n, i + 11)
        while (j < limit && s.charAt(j) != ';') j += 1
        if (j < limit && j > i + 1) {
          val body = s.substring(i + 1, j)
          val decoded: String =
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
                new String(Character.toChars(cp))
              else if (cp == 9 || cp == 10 || cp == 12 || cp == 13)
                " " // numeric whitespace entities separate, not leak
              else null
            } else Entities.getOrElse(body, null)
          if (decoded != null) { emit(decoded); i = j + 1 }
          else { emitChar('&'); i += 1 } // unknown entity: literal
        } else { emitChar('&'); i += 1 }
      } else {
        emitChar(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}
