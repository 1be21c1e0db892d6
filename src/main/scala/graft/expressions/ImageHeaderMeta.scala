package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for header-level image metadata: container
  * format and pixel dimensions parsed from the raw leading bytes of a
  * binary column — NO codec.
  *
  *  - PNG:  8-byte signature, IHDR width/height big-endian at 16/20
  *  - GIF:  GIF87a/GIF89a, logical screen size little-endian at 6/8
  *  - JPEG: FFD8 SOI, then a segment walk to the first SOFn frame header
  *    (C0–CF minus C4/C8/CC) whose payload carries height/width
  *    big-endian — position varies per file (EXIF/JFIF/comment segments
  *    precede it), which is why this is a tight JVM loop rather than
  *    fixed-offset column arithmetic.
  *  - WebP: RIFF/WEBP chunk walk to the first VP8 (lossy: start-code +
  *    14-bit dims), VP8L (lossless: packed 14-bit fields) or VP8X
  *    (extended: 24-bit canvas fields) chunk.
  *  - TIFF: either byte order; first-IFD entry walk for the
  *    ImageWidth/ImageLength tags (SHORT or LONG valued).
  *
  * Returns struct(mime, width, height); NULL for anything that isn't a
  * recognizable image header. This is the triage an actual 100 TB media
  * scan runs before any GPU decode stage: size/format filtering at
  * full scan speed inside whole-stage codegen. */
case class ImageHeaderMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_header_meta needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ImageHeaderMeta.metaType
  override def nullable: Boolean = true
  override def prettyName: String = "image_header_meta"

  override def nullSafeEval(input: Any): Any =
    ImageHeaderMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ImageHeaderMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderMeta =
    copy(child = newChild)
}

object ImageHeaderMeta {
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private val MimePng = UTF8String.fromString("image/png")
  private val MimeGif = UTF8String.fromString("image/gif")
  private val MimeJpeg = UTF8String.fromString("image/jpeg")
  private val MimeBmp = UTF8String.fromString("image/bmp")
  private val MimeWebp = UTF8String.fromString("image/webp")
  private val MimeTiff = UTF8String.fromString("image/tiff")

  /** Uniform sanity bound on header-declared dims (matches the BMP/TIFF
    * walks and the AVI/MP4/WebM video parsers): absurd-dimension headers
    * triage to null instead of flowing downstream, where they'd demand
    * multi-GB rasters from the decode stage. */
  private def bounded(w: Int, h: Int): Boolean =
    w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20)

  /** (mime, width, height) of a recognized image header, else null. */
  def parseDims(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def be32(i: Int): Int =
      (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def le32(i: Int): Int =
      u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    // PNG: signature + IHDR (always the first chunk per spec)
    if (n >= 24 && u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4e &&
        u(3) == 0x47 && u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a &&
        u(7) == 0x0a) {
      val (w, h) = (be32(16), be32(20))
      return if (bounded(w, h)) ("image/png", w, h) else null
    }
    // GIF87a / GIF89a logical screen descriptor
    if (n >= 10 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
        u(3) == '8' && (u(4) == '7' || u(4) == '9') && u(5) == 'a') {
      val (w, h) = (le16(6), le16(8))
      return if (bounded(w, h)) ("image/gif", w, h) else null
    }
    // BMP: BITMAPINFOHEADER (and later) or the legacy BITMAPCOREHEADER;
    // negative height = top-down row order, dims sanity-bounded since
    // "BM" alone is a weak signature
    if (n >= 26 && u(0) == 'B' && u(1) == 'M') {
      val dib = le32(14)
      val (w, h) =
        if (dib >= 40 && n >= 26) (le32(18), math.abs(le32(22)))
        else if (dib == 12 && n >= 22) (le16(18), le16(20))
        else (0, 0)
      if (w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20))
        return ("image/bmp", w, h)
      return null
    }
    // WebP: RIFF/WEBP container; dims live in the first VP8 (lossy
    // frame tag + start code), VP8L (lossless, packed 14-bit fields) or
    // VP8X (extended, 24-bit canvas fields) chunk — shared Riff walk
    if (n >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' &&
        u(3) == 'F' && u(8) == 'W' && u(9) == 'E' && u(10) == 'B' &&
        u(11) == 'P') {
      var out: (String, Int, Int) = null
      Riff.eachChunk(b, 12, n.toLong) { (i, size) =>
        val body = i + 8
        if (Riff.tag(b, i, "VP8 ") && size >= 10 && body + 10 <= n &&
            u(body + 3) == 0x9d && u(body + 4) == 0x01 &&
            u(body + 5) == 0x2a) {
          out = ("image/webp",
            le16(body + 6) & 0x3fff, le16(body + 8) & 0x3fff)
        } else if (Riff.tag(b, i, "VP8L") && size >= 5 && body + 5 <= n &&
            u(body) == 0x2f) {
          val bits = le32(body + 1)
          out = ("image/webp",
            (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1)
        } else if (Riff.tag(b, i, "VP8X") && size >= 10 && body + 10 <= n) {
          val w = (u(body + 4) | (u(body + 5) << 8) | (u(body + 6) << 16)) + 1
          val h = (u(body + 7) | (u(body + 8) << 8) | (u(body + 9) << 16)) + 1
          out = ("image/webp", w, h)
        }
        out == null // stop at the first dims-bearing chunk
      }
      if (out != null && bounded(out._2, out._3)) return out
      return null
    }
    // TIFF: II*\0 (little-endian) or MM\0* (big-endian) header, then
    // the first IFD's entry walk for ImageWidth (256) / ImageLength
    // (257) — SHORT or LONG valued, inline in the 12-byte entry
    if (n >= 8 && ((u(0) == 'I' && u(1) == 'I' && u(2) == 42 && u(3) == 0) ||
        (u(0) == 'M' && u(1) == 'M' && u(2) == 0 && u(3) == 42))) {
      val bigEndian = u(0) == 'M'
      def v16(i: Int): Int = if (bigEndian) be16(i) else le16(i)
      def v32(i: Int): Long =
        if (bigEndian) be32(i).toLong & 0xffffffffL
        else le32(i).toLong & 0xffffffffL
      val ifd = v32(4)
      if (ifd < 8 || ifd + 2 > n) return null
      val count = v16(ifd.toInt)
      var w = 0L; var h = 0L
      var e = 0
      while (e < count && (w == 0 || h == 0)) {
        val entry = ifd.toInt + 2 + e * 12
        if (entry + 12 > n) return null
        val tag = v16(entry)
        if (tag == 256 || tag == 257) {
          val typ = v16(entry + 2)
          // SHORT (3) sits in the value field's first 2 bytes in file
          // byte order; LONG (4) fills all 4
          val value =
            if (typ == 3) v16(entry + 8).toLong
            else if (typ == 4) v32(entry + 8)
            else -1L
          if (tag == 256) w = value else h = value
        }
        e += 1
      }
      if (w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20))
        return ("image/tiff", w.toInt, h.toInt)
      return null
    }
    // JPEG: SOI then segment walk to the first SOFn
    if (n >= 4 && u(0) == 0xff && u(1) == 0xd8) {
      var i = 2
      while (i + 3 < n && u(i) == 0xff) {
        val marker = u(i + 1)
        if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i += 2 // standalone marker, no payload
        } else if (marker == 0xd9 || marker == 0xda) {
          return null // EOI / start-of-scan before any SOF: give up
        } else {
          val segLen = be16(i + 2)
          if (segLen < 2) return null // corrupt length
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= n) return null
            val (w, h) = (be16(i + 7), be16(i + 5))
            return if (bounded(w, h)) ("image/jpeg", w, h) else null
          }
          i += 2 + segLen
        }
      }
    }
    null
  }

  /** Interned UTF8String for a mime string returned by [[parseDims]]. */
  private[expressions] def mimeUtf8(mime: String): UTF8String = mime match {
    case "image/png" => MimePng
    case "image/gif" => MimeGif
    case "image/bmp" => MimeBmp
    case "image/webp" => MimeWebp
    case "image/tiff" => MimeTiff
    case _ => MimeJpeg
  }

  /** InternalRow form for expression eval/codegen. */
  def parse(b: Array[Byte]): InternalRow = parseDims(b) match {
    case null => null
    case (mime, w, h) => InternalRow(mimeUtf8(mime), w, h)
  }
}
