package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native HTTP/1.x response-message parser — the second unwrap stage
  * after [[WarcRecords]]: a WARC `response` record's payload is the raw
  * HTTP message the crawler captured (status line, headers, body).
  *
  *   `http_message(bytes) → struct(status int, content_type,
  *                                 content_encoding, body binary)`
  *
  * `Transfer-Encoding: chunked` bodies are de-chunked here (hex size
  * lines + chunk data, trailers dropped) — the one wire framing a crawl
  * consumer must undo before the bytes mean anything; `Content-Encoding:
  * gzip` is NOT undone (compose with [[Gunzip]] downstream, which owns
  * the bomb caps) — the raw header value is surfaced so the pipeline can
  * route. De-chunking only ever shrinks the input, so output is bounded
  * by input size. Anything that is not a well-formed HTTP response —
  * no `HTTP/` start, unparseable status, header block > 64 KiB, corrupt
  * chunk framing — degrades to NULL, never throws. */
case class HttpMessage(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"http_message needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = HttpMessage.messageType
  override def nullable: Boolean = true
  override def prettyName: String = "http_message"

  override def nullSafeEval(input: Any): Any =
    HttpMessage.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HttpMessage.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): HttpMessage =
    copy(child = newChild)
}

object HttpMessage {
  val messageType: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("content_encoding", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))

  val MaxHeaderBytes: Int = 1 << 16

  /** struct(status, content_type, content_encoding, body) or null. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    val n = b.length
    if (!(b(0) == 'H' && b(1) == 'T' && b(2) == 'T' && b(3) == 'P' &&
        b(4) == '/')) return null
    val headerEnd = math.min(n, MaxHeaderBytes)
    var status = -1
    var contentType: String = null
    var contentEncoding: String = null
    var chunked = false
    var p = 0
    var lineStart = 0
    var blankAt = -1
    var first = true
    while (blankAt < 0 && p < headerEnd) {
      if (b(p) == '\n') {
        var e = p
        if (e > lineStart && b(e - 1) == '\r') e -= 1
        if (e == lineStart) blankAt = p + 1
        else {
          val s = new String(b, lineStart, e - lineStart,
            java.nio.charset.StandardCharsets.UTF_8)
          if (first) {
            first = false
            // HTTP/1.1 SP 3DIGIT [SP reason]
            val sp = s.indexOf(' ')
            if (sp < 0 || sp + 4 > s.length) return null
            try status = Integer.parseInt(s.substring(sp + 1, sp + 4))
            catch { case _: Exception => return null }
          } else {
            val colon = s.indexOf(':')
            if (colon > 0) {
              val name = s.substring(0, colon).trim
                .toLowerCase(java.util.Locale.ROOT)
              val value = s.substring(colon + 1).trim
              name match {
                case "content-type" => contentType = value
                case "content-encoding" => contentEncoding = value
                case "transfer-encoding" =>
                  chunked = value.toLowerCase(java.util.Locale.ROOT)
                    .contains("chunked")
                case _ =>
              }
            }
          }
        }
        lineStart = p + 1
      }
      p += 1
    }
    if (blankAt < 0 || status < 0) return null
    val body =
      if (!chunked) java.util.Arrays.copyOfRange(b, blankAt, n)
      else dechunk(b, blankAt)
    if (body == null) return null
    InternalRow(status,
      if (contentType == null) null else UTF8String.fromString(contentType),
      if (contentEncoding == null) null else UTF8String.fromString(contentEncoding),
      body)
  }

  /** RFC 9112 §7.1 chunked framing: `hex-size[;ext] CRLF data CRLF`
    * repeated, `0`-size chunk ends the body (trailer section dropped).
    * Corrupt framing → null. Output ≤ input by construction. */
  private def dechunk(b: Array[Byte], from: Int): Array[Byte] = {
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(math.min(n - from, 1 << 16))
    var p = from
    while (true) {
      // chunk-size line
      var e = p
      while (e < n && b(e) != '\n') e += 1
      if (e >= n) return null
      var lineEnd = e
      if (lineEnd > p && b(lineEnd - 1) == '\r') lineEnd -= 1
      var size = 0L
      var i = p
      var anyDigit = false
      var ok = true
      while (ok && i < lineEnd) {
        val c = b(i).toChar
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d < 0) {
          if (c == ';') i = lineEnd // chunk extension: ignore rest
          else ok = false
        } else {
          anyDigit = true
          size = size * 16 + d
          if (size > n.toLong) ok = false // cannot exceed input
          i += 1
        }
      }
      if (!ok || !anyDigit) return null
      p = e + 1
      if (size == 0) return out.toByteArray // trailers dropped
      if (p + size > n) return null
      out.write(b, p, size.toInt)
      p += size.toInt
      // data terminator CRLF (lenient: LF alone)
      if (p < n && b(p) == '\r') p += 1
      if (p >= n || b(p) != '\n') return null
      p += 1
    }
    null // unreachable
  }
}
