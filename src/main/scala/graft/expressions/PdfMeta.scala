package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF triage — the one major crawl document family the media-triage
  * stack didn't cover: `pdf_meta(bytes)` →
  * (version, n_pages, encrypted) from a single pass over the bytes.
  *
  * Honest-heuristic contract, like the other header triagers: the
  * version comes from the `%PDF-x.y` header; `n_pages` counts
  * `/Type /Page` dictionary entries (whitespace-tolerant, `/Pages`
  * tree nodes excluded) — exact for the overwhelmingly common
  * uncompressed-object-catalog layout, an undercount when page
  * objects hide inside compressed object streams (those need a full
  * parser; triage's job is routing, and version + encryption never
  * lie); `encrypted` is the presence of an `/Encrypt` key. NULL for
  * bytes that don't start `%PDF-`. Bounded single scan, codegen'd. */
case class PdfMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pdf_meta needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = PdfMeta.metaType
  override def nullable: Boolean = true
  override def prettyName: String = "pdf_meta"

  override def nullSafeEval(input: Any): Any =
    PdfMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.PdfMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PdfMeta =
    copy(child = newChild)
}

object PdfMeta {

  val metaType: StructType = StructType(Seq(
    StructField("version", StringType, nullable = true),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("encrypted", BooleanType, nullable = false)))

  private def isPdfWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8 ||
        b(0) != '%' || b(1) != 'P' || b(2) != 'D' || b(3) != 'F' ||
        b(4) != '-') return null
    // version: digits '.' digits right after "%PDF-"
    var i = 5
    val vStart = i
    while (i < b.length && i < vStart + 8 &&
      (b(i) == '.' || (b(i) >= '0' && b(i) <= '9'))) i += 1
    val version =
      if (i > vStart) new String(b, vStart, i - vStart, "US-ASCII") else null

    def tokenAt(j: Int, tok: String): Boolean = {
      if (j + tok.length > b.length) return false
      var k = 0
      while (k < tok.length && b(j + k) == tok.charAt(k)) k += 1
      k == tok.length
    }

    var pages = 0
    var encrypted = false
    var j = 0
    val n = b.length
    while (j < n) {
      if (b(j) == '/') {
        if (tokenAt(j, "/Type")) {
          // skip whitespace between /Type and its value
          var k = j + 5
          while (k < n && isPdfWs(b(k))) k += 1
          if (tokenAt(k, "/Page")) {
            // /Page but NOT /Pages (the tree node)
            val after = k + 5
            if (after >= n || !(b(after) == 's')) pages += 1
          }
          j = k
        } else if (!encrypted && tokenAt(j, "/Encrypt")) {
          // /Encrypt but not /EncryptMetadata alone — a delimiter or
          // whitespace must follow the key
          val after = j + 8
          if (after >= n || isPdfWs(b(after)) || b(after) == '/' ||
            b(after) == '<' || b(after) == '[' || b(after) == '(')
            encrypted = true
          j += 8
        } else j += 1
      } else j += 1
    }
    InternalRow(
      if (version == null) null else UTF8String.fromString(version),
      pages, encrypted)
  }
}
