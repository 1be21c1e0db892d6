package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the MinHash signature of a shingle-hash
  * set: `numHashes` seeded minima in one narrow loop.
  *
  * Hash family is bit-identical to the explode+aggregate form
  * (`min(xxhash64(lit(i), h))` = `hashLong(h, hashInt(i, 42))`), so
  * signatures — and every downstream LSH band, bucket, and verified
  * pair — are unchanged (PipelineSpec pins the parity).
  *
  * Why native: the explode+MIN-aggregate encoding was chosen because
  * per-row lambda pipelines choke codegen — but it pays one exchange
  * (groupBy rid) to reassemble documents. This loop keeps the whole
  * signature computation NARROW: no explode, no shuffle; at 100 TB the
  * signature stage disappears into the scan. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.hash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHashSig.hash($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val Seed = 42L

  def hash(sh: ArrayData, numHashes: Int): ArrayData = {
    // seed_i = xxhash64(lit(i)) prefix — hashInt(i, 42), then each
    // element folds in as hashLong(h, seed_i), matching F.xxhash64(i, h)
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { seeds(i) = XXH64.hashInt(i, Seed); i += 1 }
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      if (!sh.isNullAt(j)) {
        val h = sh.getLong(j)
        i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
