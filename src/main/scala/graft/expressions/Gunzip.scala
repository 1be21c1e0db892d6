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
  * Uses the JDK inflater through a STRICT member-by-member walk
  * (multi-member streams concatenate), bounded by a decompression cap:
  * output ≤ max(256·input, 1 MiB), absolute ceiling 256 MiB — generous
  * for text (real HTML deflates well under 30×) but a hard wall against
  * zip bombs, which exceed 1000× (a poison row returns NULL, it never
  * OOMs an executor). Corrupt/truncated streams and bad CRCs degrade to
  * NULL too — including undecodable bytes AFTER a valid member, which
  * `GZIPInputStream` would silently swallow as EOF (every input byte
  * must belong to a well-formed member; partial output is never
  * returned). */
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
    * corrupt/truncated streams, undecoded trailing bytes, or output
    * beyond the bomb cap. Strict walk over RFC 1952 members: header
    * (flags FEXTRA/FNAME/FCOMMENT/FHCRC honored) → raw-deflate body →
    * CRC32 + ISIZE trailer, repeated until the input is exhausted. */
  def inflate(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 18 ||
        (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return null
    val n = b.length
    val cap = math.min(math.max(256L * n, 1L << 20), 1L << 28)
    def u(i: Int): Int = b(i) & 0xff
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16)).toLong | (u(i + 3).toLong << 24)
    val out = new java.io.ByteArrayOutputStream(
      math.min(n.toLong * 4, 1L << 16).toInt)
    var total = 0L
    var off = 0
    try {
      while (off < n) {
        // ---- member header (RFC 1952 §2.3) ----
        if (off + 10 > n || u(off) != 0x1f || u(off + 1) != 0x8b ||
            u(off + 2) != 8) return null // bad magic or CM != deflate
        val flg = u(off + 3)
        if ((flg & 0xe0) != 0) return null // reserved flag bits set
        var p = off + 10
        if ((flg & 4) != 0) { // FEXTRA: le16 length + payload
          if (p + 2 > n) return null
          p += 2 + (u(p) | (u(p + 1) << 8))
          if (p > n) return null
        }
        if ((flg & 8) != 0) { // FNAME: zero-terminated
          while (p < n && b(p) != 0) p += 1
          if (p >= n) return null
          p += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
          while (p < n && b(p) != 0) p += 1
          if (p >= n) return null
          p += 1
        }
        if ((flg & 2) != 0) { // FHCRC: 2-byte header CRC (not verified)
          p += 2
          if (p > n) return null
        }
        // ---- raw-deflate body ----
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, p, n - p)
          val crc = new java.util.zip.CRC32
          val buf = new Array[Byte](8192)
          var memberLen = 0L
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            if (k > 0) {
              memberLen += k
              total += k
              if (total > cap) return null // decompression bomb
              crc.update(buf, 0, k)
              out.write(buf, 0, k)
            } else if (!inf.finished()) {
              return null // truncated body or needs-dictionary
            }
          }
          p += inf.getBytesRead.toInt
          // ---- trailer: CRC32 + ISIZE (mod 2^32), little-endian ----
          if (p + 8 > n) return null
          if (le32(p) != crc.getValue ||
              le32(p + 4) != (memberLen & 0xffffffffL)) return null
          off = p + 8
        } finally inf.end()
      }
      out.toByteArray
    } catch {
      case _: Exception => null // corrupt bitstream (DataFormatException)
    }
  }
}
