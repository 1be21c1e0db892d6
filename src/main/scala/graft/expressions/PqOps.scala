package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): splits a d-dim vector
  * into `m` sub-vectors and assigns each to its nearest codebook
  * centroid, returning the `m` centroid indexes — the 100 TB shape for
  * embedding search, because a row's code is `m` small ints instead of
  * `4·d` bytes of floats (d=64, m=16 → 16× less to scan and hold).
  *
  * Exactness contract (the [[graft.pipeline.Clustering]] discipline):
  * components quantize to integers — `floor((x + offset) · 10⁶)` — so
  * every distance is an exact integer and ties break to the lowest
  * centroid index; results are bit-identical across engines and an SQL
  * oracle can restate the assignment. The codebooks live in the SAME
  * quantized integer space (they come out of integer Lloyd updates).
  *
  * The codebooks ride as a constructor parameter and reach generated
  * code via a codegen object reference — no join, no UDF; encoding is a
  * narrow whole-stage-codegen projection whatever m·k is (a literal
  * argmin expansion at m=16, k=256 would be 4096 codegen'd fold
  * expressions — this is one allocation-free loop).
  *
  * Wrong-length input degrades to NULL, never throws. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Long]]],
    offset: Double) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    "codebooks must be [m][k][subDim]")
  require(codebooks.forall(_.length == codebooks.head.length),
    "every subspace needs the same k")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "every centroid needs the same subDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // flattened [m][k][subDim] for an index-arithmetic hot loop
  @transient private lazy val m = codebooks.length
  @transient private lazy val k = codebooks.head.length
  @transient private lazy val subDim = codebooks.head.head.length
  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](m * k * subDim)
    var i = 0
    for (cb <- codebooks; c <- cb; v <- c) { a(i) = v; i += 1 }
    a
  }

  def apply(vec: ArrayData): ArrayData = {
    if (vec == null || vec.numElements() != m * subDim) return null
    val d = m * subDim
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return null // degrade, never unbox a null
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      q(i) = math.floor((x + offset) * 1000000d).toLong
      i += 1
    }
    val code = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Long.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0L
        var t = 0
        val base = (j * k + c) * subDim
        val qBase = j * subDim
        while (t < subDim) {
          val diff = q(qBase + t) - flat(base + t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c } // ties → lowest c
        c += 1
      }
      code(j) = best
      j += 1
    }
    new GenericArrayData(code)
  }

  override def nullSafeEval(input: Any): Any =
    apply(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.apply($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Native asymmetric-distance computation (ADC) for PQ codes: given the
  * per-subspace table of exact integer distances from a QUERY's
  * sub-vectors to every codebook centroid (computed once on the
  * driver), a row's approximate squared distance is `m` table lookups —
  * `Σⱼ table[j][code[j]]`. This is the scan the PQ trade buys: top-k
  * over 100 TB of codes reads m small ints per row and does no float
  * math at all. Wrong-length or out-of-range codes degrade to NULL. */
case class PqAdc(child: Expression, table: Seq[Seq[Long]])
    extends UnaryExpression {
  require(table.nonEmpty && table.forall(_.length == table.head.length),
    "table must be [m][k]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs array<int>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  @transient private lazy val m = table.length
  @transient private lazy val k = table.head.length
  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](m * k)
    var i = 0
    for (row <- table; v <- row) { a(i) = v; i += 1 }
    a
  }

  def dist(code: ArrayData): java.lang.Long = {
    if (code == null || code.numElements() != m) return null
    var s = 0L
    var j = 0
    while (j < m) {
      val c = code.getInt(j)
      if (c < 0 || c >= k) return null
      s += flat(j * k + c)
      j += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val r = dist(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = $ref.dist($c);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? -1L : r.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
