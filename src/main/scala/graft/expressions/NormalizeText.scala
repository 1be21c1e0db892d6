package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus preparation — the cleanup pass
  * a crawl corpus needs BEFORE exact dedup so that byte-level whitespace
  * and composition variants of the same document collapse to one digest:
  *
  *  1. Unicode NFC (canonical composition, the JDK's `Normalizer`):
  *     `e` + U+0301 and `é` become the same bytes;
  *  2. every control char (U+0000–U+001F, U+007F), NEL (U+0085) and
  *     non-ASCII space (NBSP, ogham, U+2000–U+200B, LS/PS, U+202F,
  *     U+205F, ideographic U+3000, BOM/ZWNBSP U+FEFF) maps to ' ';
  *  3. space runs collapse to one space; 4. leading/trailing trimmed.
  *
  * The exact step order and character set are mirrored verbatim by the
  * oracle SQL (`nfc_normalize` + two regexp passes in DuckDB), so the
  * whole operator is hash-checked against an independent engine.
  *
  * Steps 2–4 run as ONE pass over the NFC output with a single output
  * buffer — no regex, no intermediate strings. Narrow map, codegen'd;
  * NULL in → NULL out. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.NormalizeText.normalize($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** The characters step 2 maps to a plain space. Kept as ONE predicate
    * so the scaladoc, the code, and the oracle regex stay in sync. */
  private def isSpaceish(c: Char): Boolean =
    c < 0x20 || c == 0x7f || c == 0x85 || c == 0xa0 || c == 0x1680 ||
      (c >= 0x2000 && c <= 0x200b) || c == 0x2028 || c == 0x2029 ||
      c == 0x202f || c == 0x205f || c == 0x3000 || c == 0xfeff

  def normalize(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val out = new Array[Char](n)
    var len = 0
    var pendingSpace = false // collapse + implicit leading trim
    var i = 0
    while (i < n) {
      val c = nfc.charAt(i)
      if (isSpaceish(c) || c == ' ') {
        pendingSpace = len > 0 // leading spaces drop, inner ones defer
      } else {
        if (pendingSpace) { out(len) = ' '; len += 1; pendingSpace = false }
        out(len) = c
        len += 1
      }
      i += 1
    }
    // deferred spaces at the end never flush → trailing trim is free
    UTF8String.fromString(new String(out, 0, len))
  }
}
