package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two numeric
  * arrays — the ANN family's inner loop (brute-force/LSH/IVF top-k,
  * kNN join, embedding near-dup verify).
  *
  * Bit-identical to the composed form (`aggregate(zip_with(...))`) on
  * well-formed inputs: the same sequential double accumulation for dot
  * and norms, 0.0 when either norm is zero, and 0.0 when an element is
  * null (the composed form's null element poisons its norm, so
  * `when(d > 0)` falls through to the 0.0 branch there too). One
  * DELIBERATE divergence: for a length MISMATCH the composed form
  * returns NULL (norms fine, dot null); this expression returns 0.0 —
  * a total function ("different dimensionality is never similar") that
  * keeps the default nullable contract (null only for a null input
  * array), so codegen needs no isNull override.
  *
  * Why native: the composed form runs three CodegenFallback folds (dot
  * + two norms), each allocating a zipped array per row; this loop reads
  * both vectors once with no allocation and keeps the projection in
  * whole-stage codegen — at 100 TB the scan-side scoring IS the query. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<float|double>, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.CosineSim.cosine($a, $leftIsFloat, $b, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** 0.0 for length mismatch / null elements (matching the composed
    * form's null-poisoned fold falling through `when(d > 0)`). */
  def cosine(a: ArrayData, aFloat: Boolean,
      b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return 0.0
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) dot / d else 0.0
  }
}
