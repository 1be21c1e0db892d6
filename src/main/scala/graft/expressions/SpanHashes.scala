package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for POSITIONAL k-token window hashes: one
  * xxhash64 per window start, in token order, NO dedup — element `i` is
  * the hash of tokens `[i, i+k)` (over the non-empty tokens, matching
  * `TextAnalysis.tokens`). Fewer than `k` tokens → empty array.
  *
  * The positional sibling of [[ShingleHashes]] (same per-token hashing,
  * same pair combination, so the two agree on shared windows); it feeds
  * span-level exact-substring dedup, where the POSITION of a duplicated
  * window decides which tokens are cut. One allocation-free JVM loop,
  * codegen'd, O(n·k) long ops with zero string building. */
case class SpanHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"span window size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_hashes needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(input: Any): Any =
    SpanHashes.hash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SpanHashes.hash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {
  private val Seed = 42L

  private def pair(a: Long, b: Long): Long =
    XXH64.hashLong(b, XXH64.hashLong(a, Seed))

  def hash(tokens: ArrayData, k: Int): ArrayData = {
    val n0 = tokens.numElements()
    val th = new Array[Long](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        if (s.numBytes > 0) {
          th(n) = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
          n += 1
        }
      }
      i += 1
    }
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var acc = th(i)
      var j = 1
      while (j < k) { acc = pair(acc, th(i + j)); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
