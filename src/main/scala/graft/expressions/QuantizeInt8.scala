package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for symmetric per-vector int8 scalar
  * quantization: struct(q: array<tinyint>, scale: double) with
  * scale = max(|v|)/127 and q_i = round_half_up(v_i / scale).
  *
  * Matches the composed recipe's values (same double arithmetic, same
  * HALF_UP rounding as `F.round`) but computes the scale ONCE per row —
  * the composed form embedded the array_max subtree inside the
  * per-element transform lambda, re-evaluating it for every element:
  * O(d²) per vector. Null elements quantize to null (as the composed
  * transform maps them); a null or empty vector yields q = [] / scale 0
  * handling via the all-null-guard below. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 needs array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(ByteType, containsNull = true)),
    StructField("scale", DoubleType)))
  override def prettyName: String = "quantize_int8"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.QuantizeInt8.quantize($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def quantize(vec: ArrayData, isFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = math.abs(
          if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i))
        if (v > maxAbs) maxAbs = v
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      if (vec.isNullAt(i)) q(i) = null
      else if (scale > 0) {
        val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        // F.round's HALF_UP on doubles (valueOf = toString semantics,
        // matching Spark's Round codegen exactly)
        q(i) = JBigDecimal.valueOf(v / scale)
          .setScale(0, RoundingMode.HALF_UP).byteValue()
      } else q(i) = 0.toByte
      i += 1
    }
    InternalRow(new GenericArrayData(q), scale)
  }
}
