package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the 64-bit SimHash of a token array:
  * per-token xxhash64 (same XXH64 core and seed as `F.xxhash64`, so
  * values match the functions-composed form bit-for-bit), a 64-bin
  * sign-vote, one output long.
  *
  * Why native: the `functions._` encoding (zip_with over a 64-element
  * vote array per token) allocates two arrays per token per row and
  * evaluates a nested lambda chain; this is the one text-pipeline hot
  * spot where composition genuinely fights codegen. Here `doGenCode`
  * emits a single static call whose inner loop is a plain JVM nest —
  * no per-token allocation, whole-stage codegen keeps the row pipeline
  * intact. (Preference order per the design notes: compose built-ins
  * where they fit; drop to a native Expression only on measured hot
  * paths like this one.) */
case class SimHash64(child: Expression, md5Tokens: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData], md5Tokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHash64.hash($c, $md5Tokens)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Seed matching Spark's `xxhash64` default. */
  private val Seed = 42L

  // one digest per task thread: MessageDigest is stateful and ~1 µs to
  // construct — amortize it across the row pipeline
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(token), big-endian — exactly
    * `('0x' || substr(md5(tok), 1, 16))::UBIGINT` reinterpreted signed,
    * which is what makes the md5 mode restatable in a SQL oracle. */
  private def md5Long(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  def hash(tokens: ArrayData, md5Tokens: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        // empty slots from consecutive separators are not tokens — the
        // in-loop skip replaces a `filter` HOF child, which would be
        // CodegenFallback and evict the projection from codegen
        if (s.numBytes > 0) {
          val h =
            if (md5Tokens) md5Long(s)
            else XXH64.hashUnsafeBytes(
              s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Binary-compat entry point for the original single-arg form. */
  def hash(tokens: ArrayData): Long = hash(tokens, md5Tokens = false)
}
