package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 1-bit (binary) embedding quantization: `binary_sign(vec)` packs the
  * POSITIVITY of each float component into ⌈d/64⌉ longs — component `i`
  * sets bit `i mod 64` of word `i div 64` iff `vec[i] > 0` (zeros,
  * negatives, NaN and null elements leave the bit clear). The standard
  * 32×-compression for embedding retrieval: Hamming distance between
  * codes approximates angular distance (it IS the random-hyperplane
  * bound for the coordinate planes), so a retrieval scan reads 8 bytes
  * per 64 dims instead of 256 and re-ranks the short list with exact
  * cosine — see `Similarity.binaryTopK`.
  *
  * Distinct from [[SignBits]]: that projects onto PSEUDO-RANDOM
  * hyperplanes to make LSH bucket keys of chosen width; this keeps one
  * bit per ACTUAL dimension, preserving enough geometry to rank with.
  * One allocation-free loop, codegen'd; the word layout is restatable
  * in SQL (`sum(if(v > 0, 1 << (i % 64), 0))` per word), so oracles
  * can regenerate codes exactly. NULL array → NULL. */
case class BinarySign(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"binary_sign needs array<float> or array<double>, got ${other.catalogString}")
  }

  private lazy val isDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "binary_sign"

  override def nullSafeEval(input: Any): Any =
    BinarySign.pack(input.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BinarySign.pack($c, $isDouble)")

  override protected def withNewChildInternal(newChild: Expression): BinarySign =
    copy(child = newChild)
}

object BinarySign {

  def pack(vec: ArrayData, isDouble: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](math.max(1, (n + 63) >> 6))
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        if (v > 0) out(i >> 6) |= 1L << (i & 63)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side twin for query vectors (bit-identical to [[pack]]). */
  def packLocal(vec: Seq[Float]): Array[Long] = {
    val out = new Array[Long](math.max(1, (vec.length + 63) >> 6))
    var i = 0
    while (i < vec.length) {
      if (vec(i) > 0) out(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    out
  }
}
