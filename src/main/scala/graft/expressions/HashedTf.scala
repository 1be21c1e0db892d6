package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for hashing-trick term frequencies: one
  * pass over a token array producing a `dim`-long dense count vector,
  * where each token's bucket is the engine-reproducible md5 recipe used
  * across the pipeline (`conv(substr(md5(tok), 1, 15), 16, 10) % dim` —
  * the same bucket a DuckDB oracle regenerates with
  * `CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % dim`), i.e. the
  * top 60 bits of the token's md5 taken as a non-negative long.
  *
  * Null elements are skipped (Spark's `md5(null)` is null and a null
  * bucket contributes nothing in the composed form); an empty array is
  * the zero vector; a null array is null.
  *
  * Why native: the HOF restatement is O(tokens × dim) lambda
  * evaluations per row (an array update is a full-array `transform`);
  * this loop is O(tokens + dim) with one md5 per token, inside
  * whole-stage codegen — the hashing-trick featurizer a 100 TB corpus
  * can afford. Counts are doubles so downstream idf scaling / L2
  * normalization compose without casts. */
case class HashedTf(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 2 && dim <= (1 << 20), s"dim must be in [2, 2^20], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_tf needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_tf"

  override def nullSafeEval(input: Any): Any =
    HashedTf.counts(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashedTf.counts($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedTf =
    copy(child = newChild)
}

object HashedTf {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Bucket of one token: top 60 bits (15 hex chars) of md5 as a
    * non-negative long, mod dim — bit-identical to
    * `conv(substr(md5(tok), 1, 15), 16, 10) % dim`. */
  def bucket(tok: UTF8String, dim: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(tok.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 } // 14 hex chars
    v = (v << 4) | ((h(7) >> 4) & 0xfL)                     // 15th hex char
    (v % dim).toInt
  }

  def counts(toks: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Double](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        out(bucket(t, dim)) += 1.0
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
