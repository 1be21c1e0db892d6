package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Anchor extraction WITH their link text: `html_anchors(html)` →
  * array of (href, text) structs in document order — the classic web
  * signal (a page is well described by the words others link to it
  * with; anchor text feeds target-page retrieval and labeling, where
  * [[HtmlLinks]] alone feeds the link graph).
  *
  * href handling matches [[HtmlLinks]] exactly (quote-aware scan,
  * entities decoded, non-navigational refs dropped, EOF-cut tags
  * discarded). The text is the anchor element's content rendered like
  * [[HtmlText]] (inner tags stripped, entities decoded, whitespace
  * collapsed; newlines become spaces — an anchor is one phrase),
  * truncated at 512 chars. An anchor closes at its `</a>` or,
  * per the HTML5 recovery rule, at the next `<a` (anchors cannot
  * nest); an anchor cut off by EOF is discarded. Empty-text anchors
  * (image links) are kept with `text = ''`. NULL → NULL. */
case class HtmlAnchors(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_anchors needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(HtmlAnchors.anchorType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "html_anchors"

  override def nullSafeEval(input: Any): Any =
    HtmlAnchors.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HtmlAnchors.extract($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): HtmlAnchors =
    copy(child = newChild)
}

object HtmlAnchors {

  val anchorType: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val MaxAnchors = 10000
  private val MaxText = 512

  def extract(html: UTF8String): ArrayData = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[InternalRow]()
    var i = 0

    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    def lowerAt(j: Int, lit: String): Boolean =
      j + lit.length <= n && {
        var k = 0
        while (k < lit.length &&
          Character.toLowerCase(s.charAt(j + k)) == lit.charAt(k)) k += 1
        k == lit.length
      }

    // reuse the link scanner for hrefs: extract from just this tag
    def hrefOf(tagStart: Int, tagEnd: Int): String = {
      val one = HtmlLinks.extract(
        UTF8String.fromString(s.substring(tagStart, tagEnd) + "</a>"), false)
      if (one == null || one.numElements() == 0) null
      else one.getUTF8String(0).toString
    }

    // just past the closing '>' of the tag opening at i (HtmlLinks
    // quote rules); n if unterminated
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

    while (i < n && out.size < MaxAnchors) {
      if (s.charAt(i) == '<' && i + 1 < n) {
        if (lowerAt(i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (lowerAt(i, "<script") || lowerAt(i, "<style")) {
          val name = if (lowerAt(i, "<script")) "script" else "style"
          val end = tagEnd(i + 1)
          // `<script src=x/>` has no body: searching for `</script` would
          // consume the rest of the document (HtmlLinks parity)
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
          val isA = lowerAt(i, "<a") && i + 2 < n &&
            (isWs(s.charAt(i + 2)) || s.charAt(i + 2) == '>' ||
              s.charAt(i + 2) == '/')
          if (isA) {
            val open = tagEnd(i + 2)
            if (open > i + 2 && open <= n && s.charAt(open - 1) == '>') {
              // content runs to </a> or the next <a (anchors don't nest)
              var k = open
              var close = -1
              var nextOpen = -1
              while (close < 0 && nextOpen < 0 && k < n) {
                if (s.charAt(k) == '<') {
                  if (lowerAt(k, "</a") && (k + 3 >= n ||
                    s.charAt(k + 3) == '>' || isWs(s.charAt(k + 3)))) close = k
                  else if (lowerAt(k, "<a") && k + 2 < n &&
                    (isWs(s.charAt(k + 2)) || s.charAt(k + 2) == '>' ||
                      s.charAt(k + 2) == '/')) nextOpen = k
                }
                k += 1
              }
              // EOF before any close/reopen: discard (truncated doc)
              if (close >= 0 || nextOpen >= 0) {
                val bodyEnd = if (close >= 0) close else nextOpen
                val href = hrefOf(i, open)
                if (href != null) {
                  val rendered = HtmlText.extract(
                    UTF8String.fromString(s.substring(open, bodyEnd)))
                  var text = if (rendered == null) ""
                    else rendered.toString.replace('\n', ' ')
                  if (text.length > MaxText) text = text.substring(0, MaxText)
                  out.add(InternalRow(UTF8String.fromString(href),
                    UTF8String.fromString(text)))
                }
                i = if (close >= 0) tagEnd(close + 3) else nextOpen
              } else i = n
            } else i = n // EOF inside the opening tag
          } else if (Character.isLetter(s.charAt(i + 1)) ||
            s.charAt(i + 1) == '/' || s.charAt(i + 1) == '!' ||
            s.charAt(i + 1) == '?') {
            i = tagEnd(i + 1)
          } else i += 1 // bare '<' in text ("3 < 5") is not a tag
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }
}
