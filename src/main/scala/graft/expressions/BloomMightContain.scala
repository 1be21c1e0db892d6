package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built bloom filter riding in
  * the plan: `bloom_might_contain(key) → boolean` over a LONG key. The
  * filter bytes are a constructor parameter (built once driver-side
  * from the small/"seen" relation via `DataFrameStatFunctions
  * .bloomFilter`, which aggregates with `putLong` — the probe here is
  * `mightContainLong`, the matching pair); the probe itself is then a
  * NARROW codegen'd scan with no join and no shuffle. No false
  * negatives ever, so a definite-miss answer is exact; positives are
  * "maybe" and need a verify join.
  *
  * Scale note: the bytes ship with the task binary once per stage —
  * right up to filters of a few hundred MB (≈ billions of seen keys at
  * 1% fpp). Beyond that, fall back to the exact anti-join; a bloom that
  * big stops being the cheap side. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs bigint, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bmc", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bloom().mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
