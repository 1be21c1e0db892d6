package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.rdf.Terms

/** Exact Turtle-star text of a PACKED quoted-triple value
  * ([[Terms.packString]] encoding): unpacks recursively and renders via
  * the driver-side `RdfTerm.n3()` path, so component literals carry
  * proper ECHAR escapes (tab, newline, quote, backslash) and nesting is
  * unlimited — the properties the column-composed display renderer
  * (`Terms.quotedN3`, one level, unescaped) does not guarantee. Used by
  * the TSV/CSV result serializers, where a raw tab inside a component
  * literal would split the field. */
case class QuotedN3Text(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quoted_n3_text needs the packed string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "quoted_n3_text"

  override def nullSafeEval(input: Any): Any =
    QuotedN3Text.render(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.QuotedN3Text.render($c)")

  override protected def withNewChildInternal(newChild: Expression): QuotedN3Text =
    copy(child = newChild)
}

object QuotedN3Text {
  def render(packed: UTF8String): UTF8String =
    UTF8String.fromString(Terms.unpackString(packed.toString).n3())
}
