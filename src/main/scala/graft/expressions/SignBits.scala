package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the sign-bit LSH bucket id of a numeric
  * vector: `planes` deterministic random-hyperplane projections, the sign
  * of each packed into one long.
  *
  * Hyperplane family is bit-identical to the HOF-composed form
  * (`aggregate(zip_with(vec, sequence, ...))` in
  * `Similarity.signBitsComposed`): component (p, i) =
  * `pmod(xxhash64(lit(p), i), 1e6) / 1e6 - 0.5` where the two-arg
  * xxhash64 chains `hashInt(i, hashInt(p, 42))`; the per-plane fold
  * accumulates doubles in index order. Edge cases match exactly: a null
  * element poisons every plane's fold (composed `when(null >= 0)` falls
  * to `otherwise(0)`) → bucket 0; an EMPTY vector is also bucket 0 — the
  * composed `sequence(0, size-1)` degenerates to `[0, -1]` (descending
  * default step), zip_with null-pads, and the fold nulls out; a null
  * vector stays null (default nullable contract).
  *
  * Why native: the composed form lambda-evaluates planes·d multiplies
  * plus a per-component two-int xxhash64 through three nested HOFs per
  * plane — on the hot path of `embeddingCosinePairs` (16 planes × 4
  * tables = 64 projections/row) and `knnJoin` that is the dominant cost.
  * This loop reads the vector once, keeps `planes` accumulators, and
  * stays inside whole-stage codegen. */
case class SignBits(child: Expression, planes: Int, planeOffset: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")
  require(planeOffset >= 0, s"planeOffset must be >= 0, got $planeOffset")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bits needs array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    SignBits.pack(input.asInstanceOf[ArrayData], isFloat, planes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SignBits.pack($c, $isFloat, $planes, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {
  private val Seed = 42L
  private val Mod = 1000000L

  def pack(vec: ArrayData, isFloat: Boolean, planes: Int, planeOffset: Int): Long = {
    val n = vec.numElements()
    // empty: composed sequence(0,-1) null-pads the zip and nulls the fold
    if (n == 0) return 0L
    // a null element nulls every plane's fold in the composed form,
    // where when(null >= 0) falls through to otherwise(0) → bucket 0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return 0L
      i += 1
    }
    val seeds = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      seeds(p) = XXH64.hashInt(planeOffset + p, Seed)
      p += 1
    }
    // element-outer: one read of each component, accumulation within a
    // plane still runs in index order → identical double rounding
    val acc = new Array[Double](planes)
    i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      p = 0
      while (p < planes) {
        val h = XXH64.hashInt(i, seeds(p))
        val m = h % Mod
        val comp = (if (m < 0) m + Mod else m).toDouble / 1000000.0 - 0.5
        acc(p) += x * comp
        p += 1
      }
      i += 1
    }
    var bits = 0L
    p = 0
    while (p < planes) {
      if (acc(p) >= 0) bits |= 1L << p
      p += 1
    }
    bits
  }
}
