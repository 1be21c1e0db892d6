package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the DEFLATE-compressed size of a
  * string or binary column (zlib stream, fixed level 6): the classic
  * compression-ratio quality signal — boilerplate/templated/repetitive
  * documents compress far below natural language, near-random bytes
  * don't compress at all — used as a cheap corpus gate alongside the
  * repetition heuristics (Gopher §A1.1 filters on exactly this family).
  *
  * `deflate_size(x) / octet_length(x)` is the ratio; this expression
  * returns the size so callers pick their own denominator (chars vs
  * bytes). Empty input returns the (constant) empty-stream size, null
  * stays null. The Deflater is per-thread-reused and always `end()`-safe
  * (reset between rows), so the expression allocates one native zlib
  * handle per executor thread, not per row. Output depends only on
  * (bytes, level) for a given zlib build — deterministic within a run,
  * which is what a gate threshold needs; there is deliberately no SQL
  * oracle (DuckDB exposes no deflate), the spec pins round-trips via
  * `Inflater` and the repetitive < natural < random ordering. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_size needs string or binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  @transient private lazy val isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) DeflateSize.size(input.asInstanceOf[UTF8String].getBytes)
    else DeflateSize.size(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev,
        c => s"graft.expressions.DeflateSize.size($c.getBytes())")
    else
      defineCodeGen(ctx, ev, c => s"graft.expressions.DeflateSize.size($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  private val Level = 6

  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Level)
  }

  def size(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
