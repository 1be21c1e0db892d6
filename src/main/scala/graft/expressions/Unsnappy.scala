package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-row raw-snappy-block decompression: `unsnappy(bytes) → bytes`.
  * Raw snappy blocks (the format inside parquet/ORC pages and many
  * key-value stores — NOT the `.sz` framed container) carry their
  * uncompressed length as a leading varint, so the bomb check happens
  * BEFORE any allocation: declared length beyond max(256·input, 1 MiB)
  * (ceiling 256 MiB) returns NULL without decoding a byte. Corrupt or
  * truncated blocks degrade to NULL. Decodes through the snappy-java
  * library Spark already carries. */
case class Unsnappy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unsnappy needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "unsnappy"

  override def nullSafeEval(input: Any): Any =
    Unsnappy.decompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Unsnappy.decompress($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Unsnappy =
    copy(child = newChild)
}

object Unsnappy {

  /** Decompressed bytes of one raw snappy block, or null when the
    * input is not a valid block or its declared output length exceeds
    * the bomb cap. */
  def decompress(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 1) return null
    val cap = math.min(math.max(256L * b.length, 1L << 20), 1L << 28)
    try {
      // leading varint: declared uncompressed length (checked pre-alloc)
      var declared = 0L
      var shift = 0
      var i = 0
      var more = true
      while (more && i < b.length && shift <= 56) {
        val x = b(i) & 0xff
        declared |= (x & 0x7fL) << shift
        more = (x & 0x80) != 0
        shift += 7
        i += 1
      }
      if (more || declared > cap) return null
      val out = org.xerial.snappy.Snappy.uncompress(b)
      if (out.length.toLong != declared) return null
      out
    } catch {
      case _: Exception => null // corrupt/truncated block
    }
  }
}
