package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WARC (ISO 28500) record splitter: the ingestion stage for
  * web-archive corpora (Common Crawl and friends). Takes the
  * UNCOMPRESSED bytes of a WARC file segment (compose with [[Gunzip]]
  * for `.warc.gz`) and returns one struct per record:
  *
  *   `warc_records(bytes) → array<struct(warc_type, target_uri, date,
  *                                       record_id, content_type,
  *                                       payload binary)>`
  *
  * Each record is `WARC/x.y CRLF` + named header lines + blank line +
  * `Content-Length` payload bytes + record separator (two CRLFs).
  * The walk is strict per record and truncation-tolerant across
  * records — the crawl-real failure mode is a file cut mid-record, so
  * a malformed or truncated record ENDS the parse and the records
  * before it are returned (an input whose FIRST record is bad → NULL).
  * Payloads are slices of the input, so output is bounded by input
  * size; header blocks are capped at 64 KiB and record count at 2¹⁶
  * per input (a 100 TB run splits files upstream of this expression —
  * see `graft.sources.Warc` for the constant-memory file reader). */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_records needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(WarcRecords.recordType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_records"

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.WarcRecords.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {
  val recordType: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  /** Header block cap per record — the spec puts no limit, but a sane
    * crawl record's headers are < 1 KiB; 64 KiB marks corruption. */
  val MaxHeaderBytes: Int = 1 << 16
  /** Records per input cap (an anti-runaway bound, not a real limit —
    * upstream file splitting keeps segments far below this). */
  val MaxRecords: Int = 1 << 16

  /** Shared header-block scanner: parses `Name: value` lines (folded
    * continuation lines append) from `b[from, blockEnd)` where
    * `blockEnd` points AT the blank line's first byte. Returns the six
    * interesting values; everything else is skipped, not stored. */
  private[graft] final class Headers {
    var warcType: String = null
    var targetUri: String = null
    var date: String = null
    var recordId: String = null
    var contentType: String = null
    var contentLength: Long = -1L
    var lastKey: Int = -1 // which field a continuation line extends

    private def put(key: Int, v: String): Unit = key match {
      case 0 => warcType = v
      case 1 => targetUri = v
      case 2 => date = v
      case 3 => recordId = v
      case 4 => contentType = v
      case 5 => contentLength =
        try java.lang.Long.parseLong(v) catch { case _: Exception => -2L }
      case _ =>
    }
    private def get(key: Int): String = key match {
      case 0 => warcType
      case 1 => targetUri
      case 2 => date
      case 3 => recordId
      case 4 => contentType
      case _ => null
    }

    /** One header line (without its terminator). */
    def line(s: String): Unit = {
      if (s.isEmpty) return
      if (s.charAt(0) == ' ' || s.charAt(0) == '\t') { // folded continuation
        if (lastKey >= 0 && lastKey <= 4) {
          val prev = get(lastKey)
          if (prev != null) put(lastKey, prev + " " + s.trim)
        }
        return
      }
      val colon = s.indexOf(':')
      if (colon <= 0) { lastKey = -1; return }
      val name = s.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
      val value = s.substring(colon + 1).trim
      val key = name match {
        case "warc-type" => 0
        case "warc-target-uri" => 1
        case "warc-date" => 2
        case "warc-record-id" => 3
        case "content-type" => 4
        case "content-length" => 5
        case _ => -1
      }
      if (key >= 0) put(key, value)
      lastKey = key
    }
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** Array of record structs, or null when not a WARC / first record
    * malformed. Truncation mid-stream returns the complete prefix. */
  def parse(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    val n = b.length
    val out = new java.util.ArrayList[InternalRow]()
    var off = 0
    var done = false
    while (!done && off < n && out.size < MaxRecords) {
      done = true // every early exit below keeps the prefix
      // ---- version line: WARC/x.y ----
      if (off + 5 <= n && b(off) == 'W' && b(off + 1) == 'A' &&
          b(off + 2) == 'R' && b(off + 3) == 'C' && b(off + 4) == '/') {
        val headerEnd = math.min(n, off + MaxHeaderBytes)
        // scan lines; blank line terminates the header block
        var p = off
        var lineStart = off
        var blankAt = -1
        val hs = new Headers
        var first = true
        while (blankAt < 0 && p < headerEnd) {
          if (b(p) == '\n') {
            var e = p
            if (e > lineStart && b(e - 1) == '\r') e -= 1
            if (e == lineStart) blankAt = p + 1
            else {
              val s = new String(b, lineStart, e - lineStart,
                java.nio.charset.StandardCharsets.UTF_8)
              if (first) first = false // the WARC/x.y line itself
              else hs.line(s)
            }
            lineStart = p + 1
          }
          p += 1
        }
        if (blankAt >= 0 && hs.contentLength >= 0 &&
            hs.contentLength <= (n - blankAt).toLong) {
          val len = hs.contentLength.toInt
          val payload = java.util.Arrays.copyOfRange(b, blankAt, blankAt + len)
          out.add(InternalRow(utf8(hs.warcType), utf8(hs.targetUri),
            utf8(hs.date), utf8(hs.recordId), utf8(hs.contentType),
            payload))
          // record separator: skip CRLFs up to the next record
          var q = blankAt + len
          while (q < n && (b(q) == '\r' || b(q) == '\n')) q += 1
          off = q
          done = false
        }
      }
    }
    if (out.isEmpty) null
    else {
      val arr = new Array[Any](out.size)
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i); i += 1 }
      new GenericArrayData(arr)
    }
  }
}
