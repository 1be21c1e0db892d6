package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-row gzip member decompression — the unwrap stage for crawl-style
  * corpora whose records (WARC responses, gzipped HTML bodies, log
  * blobs) arrive as gzip members in a binary column:
  * `gunzip(bytes) → bytes`, then [[HtmlText]]/text ops downstream.
  *
  * Uses the JDK inflater (multi-member streams included), bounded by a
  * decompression cap: output ≤ max(256·input, 1 MiB), absolute ceiling
  * 256 MiB — generous for text (real HTML deflates well under 30×) but
  * a hard wall against zip bombs, which exceed 1000× (a poison row
  * returns NULL, it never OOMs an executor). Corrupt/truncated streams
  * and bad CRCs degrade to NULL too. */
case class Gunzip(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gunzip needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip"

  override def nullSafeEval(input: Any): Any =
    Gunzip.inflate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Gunzip.inflate($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
}

object Gunzip {

  /** Decompressed bytes of a gzip stream, or null for non-gzip bytes,
    * corrupt/truncated streams, or output beyond the bomb cap. */
  def inflate(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 18 ||
        (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return null
    val cap = math.min(math.max(256L * b.length, 1L << 20), 1L << 28)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(b.length.toLong * 4, 1L << 16).toInt)
        val buf = new Array[Byte](8192)
        var total = 0L
        var n = in.read(buf)
        while (n > 0) {
          total += n
          if (total > cap) return null // decompression bomb
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        out.toByteArray
      } finally in.close()
    } catch {
      case _: Exception => null // corrupt/truncated/CRC-mismatch
    }
  }
}
