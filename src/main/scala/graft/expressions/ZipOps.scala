package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZIP archive triage: `zip_entries(bytes)` → array of
  * (name, method, compressed, size) structs read from the CENTRAL
  * DIRECTORY (located via the end-of-central-directory record, the way
  * real ZIP readers do — so streaming-mode archives with bit-3 data
  * descriptors, i.e. everything `ZipOutputStream` writes, list
  * correctly). The container behind docx/xlsx/epub/jar and plenty of
  * crawl payloads; routing them is the same triage job as the media
  * headers. Method 0 = stored, 8 = deflate.
  *
  * Bounded contracts: names decode as UTF-8 and cap at 512 chars, at
  * most 4096 entries, the EOCD scan covers the legal ≤64 KiB trailing
  * comment. CRCs are not verified (triage routes; [[ZipEntryBytes]]
  * extraction is where corruption surfaces as NULL). NULL when no
  * end-of-central-directory record exists. */
case class ZipEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zip_entries needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(ZipOps.entryType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "zip_entries"

  override def nullSafeEval(input: Any): Any =
    ZipOps.entries(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ZipOps.entries($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

/** `zip_entry(bytes, name)` → the named entry's decompressed bytes:
  * stored entries copy, deflate entries inflate (raw), with the unwrap
  * family's bomb cap (≤ max(256·entry, 1 MiB), ceiling 256 MiB).
  * Missing entry, unsupported method, or corrupt data → NULL. The
  * docx/epub ingestion step: `zip_entry(payload, 'word/document.xml')`
  * feeds `html_text`-style XML stripping. */
case class ZipEntryBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"zip_entry needs (binary, string), got $other")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zip_entry"

  override def nullSafeEval(zip: Any, name: Any): Any =
    ZipOps.entryBytes(zip.asInstanceOf[Array[Byte]],
      name.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (z, m) => s"""
      ${ev.value} = graft.expressions.ZipOps.entryBytes($z, $m.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZipEntryBytes =
    copy(left = newLeft, right = newRight)
}

object ZipOps {

  val entryType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("method", IntegerType, nullable = false),
    StructField("compressed", LongType, nullable = false),
    StructField("size", LongType, nullable = false)))

  private val MaxEntries = 4096
  private val MaxName = 512

  /** (name, method, compSize, size, localHeaderOffset) per entry, read
    * from the CENTRAL DIRECTORY (the authoritative record — it always
    * carries sizes, so streaming-mode (bit 3) archives like everything
    * `java.util.zip.ZipOutputStream` writes work too): locate the EOCD
    * signature scanning back over the ≤64 KiB comment window, then walk
    * the CD records. Null when no EOCD exists and the bytes don't even
    * start with a local header (not a ZIP). */
  private def walk(b: Array[Byte]): java.util.ArrayList[(String, Int, Long, Long, Long)] = {
    if (b == null || b.length < 22) return null
    def u16(i: Long): Int =
      (b(i.toInt) & 0xff) | ((b(i.toInt + 1) & 0xff) << 8)
    def u32(i: Long): Long =
      (u16(i) & 0xffffL) | ((u16(i + 2) & 0xffffL) << 16)
    val n = b.length.toLong
    // EOCD: "PK\5\6", last occurrence within the trailing 64 KiB + 22
    var eocd = -1L
    var j = n - 22
    val floor = math.max(0L, n - 22 - 0xffffL)
    while (eocd < 0 && j >= floor) {
      if (b(j.toInt) == 'P' && b(j.toInt + 1) == 'K' &&
        b(j.toInt + 2) == 5 && b(j.toInt + 3) == 6) eocd = j
      j -= 1
    }
    if (eocd < 0) return null
    val count = u16(eocd + 10)
    var off = u32(eocd + 16) // central directory start
    val out = new java.util.ArrayList[(String, Int, Long, Long, Long)]()
    var k = 0
    while (k < count && k < MaxEntries && off + 46 <= n &&
      b(off.toInt) == 'P' && b(off.toInt + 1) == 'K' &&
      b(off.toInt + 2) == 1 && b(off.toInt + 3) == 2) {
      val method = u16(off + 10)
      val compSize = u32(off + 20)
      val size = u32(off + 24)
      val nameLen = u16(off + 28)
      val extraLen = u16(off + 30)
      val commentLen = u16(off + 32)
      val lho = u32(off + 42)
      if (off + 46 + nameLen > n) return out
      val rawName = new String(b, (off + 46).toInt,
        math.min(nameLen, MaxName * 4), "UTF-8")
      val name = if (rawName.length > MaxName) rawName.substring(0, MaxName)
        else rawName
      out.add((name, method, compSize, size, lho))
      off += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    out
  }

  /** Data offset of the entry whose local header starts at `lho`, or
    * -1 when the header is out of bounds/not a local header. */
  private def dataOffset(b: Array[Byte], lho: Long): Long = {
    def u16(i: Long): Int =
      (b(i.toInt) & 0xff) | ((b(i.toInt + 1) & 0xff) << 8)
    if (lho + 30 > b.length || b(lho.toInt) != 'P' ||
      b(lho.toInt + 1) != 'K' || b(lho.toInt + 2) != 3 ||
      b(lho.toInt + 3) != 4) return -1L
    lho + 30 + u16(lho + 26) + u16(lho + 28)
  }

  def entries(b: Array[Byte]): ArrayData = {
    val es = walk(b)
    if (es == null) return null
    val out = new Array[Any](es.size)
    var i = 0
    while (i < es.size) {
      val (name, method, comp, size, _) = es.get(i)
      out(i) = InternalRow(UTF8String.fromString(name), method, comp, size)
      i += 1
    }
    new GenericArrayData(out)
  }

  def entryBytes(b: Array[Byte], name: String): Array[Byte] = {
    val es = walk(b)
    if (es == null) return null
    var i = 0
    while (i < es.size) {
      val (n, method, comp, _, lho) = es.get(i)
      if (n == name) {
        val off = dataOffset(b, lho)
        if (off < 0 || off + comp > b.length) return null
        val data = java.util.Arrays.copyOfRange(b, off.toInt,
          (off + comp).toInt)
        return method match {
          case 0 => data
          case 8 => inflateRaw(data, b.length)
          case _ => null // unsupported compression method
        }
      }
      i += 1
    }
    null
  }

  private def inflateRaw(data: Array[Byte], inputLen: Int): Array[Byte] = {
    val cap = math.min(math.max(256L * inputLen, 1L << 20), 1L << 28)
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.min(data.length.toLong * 4, 1L << 16).toInt)
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) return null // truncated
        total += k
        if (total > cap) return null // decompression bomb
        out.write(buf, 0, k)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }
}
