package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-row zstd decompression — [[Gunzip]]'s sibling for the datasets
  * that ship `.zst` (RFC 8878): `unzstd(bytes) → bytes`. Decodes
  * through the zstd-jni streaming decoder Spark already carries (no new
  * dependency), multi-frame capable (concatenated frames concatenate,
  * like gzip members), with the SAME bomb cap as gunzip: output ≤
  * max(256·input, 1 MiB), absolute ceiling 256 MiB — a poison row
  * returns NULL, it never OOMs an executor. Non-zstd bytes, corrupt or
  * truncated frames, bad checksums, and undecodable trailing bytes all
  * degrade to NULL (the decoder refuses partial output). */
case class Unzstd(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unzstd needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "unzstd"

  override def nullSafeEval(input: Any): Any =
    Unzstd.decompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Unzstd.decompress($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Unzstd =
    copy(child = newChild)
}

object Unzstd {

  /** Decompressed bytes of a zstd stream, or null for non-zstd bytes,
    * corrupt/truncated frames, or output beyond the bomb cap. Only
    * standard frames are accepted (magic 0xFD2FB528 little-endian);
    * a leading skippable frame is not content and returns null. */
  def decompress(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 5 ||
        (b(0) & 0xff) != 0x28 || (b(1) & 0xff) != 0xb5 ||
        (b(2) & 0xff) != 0x2f || (b(3) & 0xff) != 0xfd) return null
    val n = b.length
    val cap = math.min(math.max(256L * n, 1L << 20), 1L << 28)
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
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
