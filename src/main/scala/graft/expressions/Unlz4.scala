package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-row LZ4 frame decompression — the third member of the unwrap
  * family ([[Gunzip]], [[Unzstd]]) for datasets shipped `.lz4`:
  * `unlz4(bytes) → bytes`. Decodes the standard LZ4 Frame Format
  * (magic 0x184D2204) through the lz4-java streaming decoder Spark
  * already carries (no new dependency), concatenated frames
  * concatenate, with the SAME bomb cap as its siblings: output ≤
  * max(256·input, 1 MiB), absolute ceiling 256 MiB — a poison row
  * returns NULL, never an executor OOM. Non-LZ4 bytes, corrupt or
  * truncated frames, and bad checksums degrade to NULL. */
case class Unlz4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unlz4 needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "unlz4"

  override def nullSafeEval(input: Any): Any =
    Unlz4.decompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Unlz4.decompress($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Unlz4 =
    copy(child = newChild)
}

object Unlz4 {

  /** Decompressed bytes of an LZ4 frame stream, or null for non-LZ4
    * bytes, corrupt/truncated frames, or output beyond the bomb cap.
    * The frame magic is checked up front (0x184D2204 little-endian) so
    * arbitrary binary columns triage cheaply. */
  def decompress(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 7 ||
        (b(0) & 0xff) != 0x04 || (b(1) & 0xff) != 0x22 ||
        (b(2) & 0xff) != 0x4d || (b(3) & 0xff) != 0x18) return null
    val n = b.length
    val cap = math.min(math.max(256L * n, 1L << 20), 1L << 28)
    try {
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(n.toLong * 4, 1L << 16).toInt)
        val buf = new Array[Byte](8192)
        var total = 0L
        var k = in.read(buf)
        while (k >= 0) {
          if (k > 0) {
            total += k
            if (total > cap) return null // decompression bomb
            out.write(buf, 0, k)
          }
          k = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch {
      case _: Exception => null // corrupt/truncated frame
    }
  }
}
