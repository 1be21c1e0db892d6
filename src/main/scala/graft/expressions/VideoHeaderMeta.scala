package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for header-level VIDEO metadata: the third
  * leg of the media-triage family ([[ImageHeaderMeta]],
  * [[AudioHeaderMeta]]) — container format, frame dimensions, frame
  * count, and duration parsed from the raw leading bytes of a binary
  * column, NO codec.
  *
  *  - AVI: `RIFF…AVI ` container; top-level chunk walk to the `LIST hdrl`
  *    block, whose mandatory `avih` main header carries
  *    dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight at fixed
  *    offsets in its body. duration = frames · µs/frame.
  *  - MP4 (ISO-BMFF): `ftyp` leading box, then a bounded box walk into
  *    `moov` — `mvhd` timescale+duration, the video `trak`'s `tkhd`
  *    16.16-fixed dimensions, and its `stts` sample table's exact
  *    frame count.
  *  - WebM/Matroska (EBML): element walk to Segment/Info
  *    (TimestampScale, Duration) and the video TrackEntry's
  *    PixelWidth/PixelHeight; DocType picks webm vs x-matroska.
  *
  * Returns struct(mime, width, height, n_frames, duration_ms); NULL for
  * anything that isn't a recognizable video header, and NULL duration
  * when the header doesn't pin it (zero frames or zero frame period).
  * Same 100 TB role as the siblings: resolution/length triage at scan
  * speed inside whole-stage codegen, long before any decode stage. */
case class VideoHeaderMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_header_meta needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = VideoHeaderMeta.metaType
  override def nullable: Boolean = true
  override def prettyName: String = "video_header_meta"

  override def nullSafeEval(input: Any): Any =
    VideoHeaderMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.VideoHeaderMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoHeaderMeta =
    copy(child = newChild)
}

object VideoHeaderMeta {
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = true)))

  private val MimeAvi = UTF8String.fromString("video/x-msvideo")
  private val MimeMp4 = UTF8String.fromString("video/mp4")

  /** (mime, width, height, frames, durationMs or -1) of an AVI or MP4
    * header, else null. AVI traversal is the shared [[Riff]] walk (Long
    * offsets: crafted sizes end the loop, never overflow into a
    * negative index); MP4 is an ISO-BMFF box walk. */
  def parseTagged(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    val avi = parseFields(b)
    if (avi != null)
      return ("video/x-msvideo", avi._1, avi._2, avi._3, avi._4)
    val mp4 = parseMp4(b)
    if (mp4 != null) return mp4
    parseWebm(b)
  }

  /** (width, height, frames, durationMs or -1) of an AVI header, else
    * null. */
  def parseFields(b: Array[Byte]): (Int, Int, Int, Long) = {
    if (b == null) return null
    val n = b.length
    if (n < 12 || !Riff.tag(b, 0, "RIFF") || !Riff.tag(b, 8, "AVI "))
      return null
    var out: (Int, Int, Int, Long) = null
    var sawHdrl = false
    Riff.eachChunk(b, 12, n.toLong, minHeader = 12) { (i, size) =>
      if (Riff.tag(b, i, "LIST") && Riff.tag(b, i + 8, "hdrl")) {
        sawHdrl = true
        val end = math.min(i + 8L + size, n.toLong)
        Riff.eachChunk(b, i + 12, end) { (j, csize) =>
          if (Riff.tag(b, j, "avih")) {
            if (csize >= 40 && j + 8 + 40 <= n) {
              val usPerFrame = Riff.le32(b, j + 8)
              val frames = Riff.le32(b, j + 8 + 16)
              val width = Riff.le32(b, j + 8 + 32)
              val height = Riff.le32(b, j + 8 + 36)
              if (width > 0 && height > 0 && width <= (1 << 20) &&
                  height <= (1 << 20) && frames <= Int.MaxValue) {
                val dur = // both fields are ≤2³²: guard the product
                  if (frames > 0 && usPerFrame > 0 &&
                    frames <= Long.MaxValue / usPerFrame)
                    frames * usPerFrame / 1000L
                  else -1L
                out = (width.toInt, height.toInt, frames.toInt, dur)
              }
            }
            false // avih found (valid or not): stop
          } else true
        }
        false // hdrl found: stop the top-level walk
      } else true
    }
    if (!sawHdrl) return null // no header list: not a parseable AVI
    out // null when hdrl lacked a sane avih: corrupt
  }

  /** MP4 (ISO-BMFF): `ftyp` leading box, then a bounded box walk into
    * `moov` — `mvhd` gives timescale+duration, the video `trak`'s
    * `tkhd` gives 16.16-fixed width/height, and its `stbl/stts` sample
    * table gives the exact frame count. Handles 64-bit box sizes and
    * version-1 (64-bit time) mvhd/tkhd. Returns
    * (mime, w, h, frames (0 = unknown), durMs or -1), or null. */
  def parseMp4(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def be32(i: Int): Long =
      ((u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) |
        u(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    if (n < 12 || !Riff.tag(b, 4, "ftyp")) return null
    var timescale = 0L; var duration = -1L
    var w = 0; var h = 0
    var frames = 0L
    // per-trak collection: box order inside trak is NOT fixed (mdia can
    // precede tkhd), so dims and the sample count accumulate
    // independently and commit together when the trak box closes
    var pw = 0; var ph = 0
    var pf = 0L
    // visit boxes in b[from,to); descend into the container types that
    // lead to mvhd/tkhd/stts; depth-capped, forward-only (crafted sizes
    // terminate the walk, they never loop or recurse unboundedly)
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size0 = be32(i.toInt)
        val boxEnd =
          if (size0 == 1 && i + 16 <= to) {
            val s = be64(i.toInt + 8)
            if (s < 16) to else math.min(i + s, to)
          }
          else if (size0 == 0) to // box extends to end of enclosing span
          else if (size0 < 8) return // corrupt: stop
          else math.min(i + size0, to)
        val t = i.toInt + 4
        val body = i + (if (size0 == 1) 16 else 8)
        def tag(s: String): Boolean = Riff.tag(b, t, s)
        if (depth < 6 && (tag("moov") || tag("trak") || tag("mdia") ||
            tag("minf") || tag("stbl"))) {
          if (tag("trak")) { pw = 0; ph = 0; pf = 0L }
          walk(body, boxEnd, depth + 1)
          if (tag("trak") && pw > 0 && ph > 0 && w == 0) {
            w = pw; h = ph; frames = pf // first video trak wins
          }
        } else if (tag("mvhd") && body + 4 <= boxEnd) {
          val ver = u(body.toInt)
          if (ver == 1 && body + 28 + 4 <= boxEnd) {
            timescale = be32(body.toInt + 20)
            duration = be64(body.toInt + 24)
          } else if (ver == 0 && body + 20 <= boxEnd) {
            timescale = be32(body.toInt + 12)
            duration = be32(body.toInt + 16)
          }
        } else if (tag("tkhd") && body + 4 <= boxEnd) {
          val ver = u(body.toInt)
          val dimsOff = body + (if (ver == 1) 88 else 76)
          if (dimsOff + 8 <= boxEnd) {
            val tw = be16(dimsOff.toInt)     // 16.16 fixed: integer part
            val th = be16(dimsOff.toInt + 4)
            if (tw > 0 && th > 0 && pw == 0) { pw = tw; ph = th }
          }
        } else if (tag("stts") && body + 8 <= boxEnd) {
          // sum of entry sample counts = this track's frame count
          val entries = be32(body.toInt + 4)
          var e = 0L
          var total = 0L
          while (e < entries && body + 8 + e * 8 + 8 <= boxEnd) {
            total += be32((body + 8 + e * 8).toInt)
            e += 1
          }
          if (pf == 0L) pf = total
        }
        i = boxEnd
      }
    }
    walk(0, n.toLong, 0)
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    // crafted 64-bit durations would overflow ·1000 — degrade instead
    val durMs =
      if (timescale > 0 && duration > 0 &&
        duration < Long.MaxValue / 1000) duration * 1000L / timescale
      else -1L
    ("video/mp4", w, h,
      if (frames > Int.MaxValue) 0 else frames.toInt, durMs)
  }

  /** WebM/Matroska (EBML): `1A 45 DF A3` magic, then a bounded element
    * walk — DocType decides the mime, Segment/Info gives
    * TimestampScale + Duration (float ticks → ms), Segment/Tracks'
    * video TrackEntry gives PixelWidth/PixelHeight. Unknown-size
    * elements (streamed/live Segments) extend to the enclosing span.
    * Frame counts aren't header data in Matroska → 0. Returns
    * (mime, w, h, 0, durMs or -1), or null. */
  def parseWebm(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    if (n < 8 || u(0) != 0x1a || u(1) != 0x45 || u(2) != 0xdf ||
        u(3) != 0xa3) return null
    // EBML varint width = leading-zero count of the first byte + 1
    def width(first: Int): Int = {
      var w = 1
      var mask = 0x80
      while (mask != 0 && (first & mask) == 0) { w += 1; mask >>= 1 }
      if (mask == 0) -1 else w
    }
    def uintAt(i: Int, len: Int): Long = {
      var v = 0L
      var k = 0
      while (k < len) { v = (v << 8) | u(i + k); k += 1 }
      v
    }
    var scale = 1000000L // ns per tick (spec default)
    var durTicks = -1.0
    var w0 = 0; var h0 = 0
    var mime = "video/webm"
    // per-TrackEntry collection: Matroska fixes no child order (Video
    // can precede TrackType), so the entry's fields accumulate and
    // commit together when the TrackEntry element closes
    var teType = -1
    var teW = 0; var teH = 0
    def walk(from: Long, to: Long, depth: Int): Unit = {
      var i = from
      var go = true
      while (go && i + 2 <= to) {
        // element ID (marker kept), then size (marker stripped;
        // all-ones = unknown → the element runs to the parent's end)
        val iw = width(u(i.toInt))
        if (iw < 1 || iw > 4 || i + iw > to) return
        val id = uintAt(i.toInt, iw)
        val si = (i + iw).toInt
        if (si >= to) return
        val sw = width(u(si))
        if (sw < 1 || sw > 8 || si + sw > to) return
        var sz = (u(si) & (0xff >> sw)).toLong
        var k = 1
        while (k < sw) { sz = (sz << 8) | u(si + k); k += 1 }
        val unknown = sz == (1L << (7 * sw)) - 1
        val body = i + iw + sw
        val end = if (unknown) to else math.min(body + sz, to)
        if (end < body) return
        val len = (end - body).toInt
        id match {
          case 0x1A45DFA3L | 0x18538067L | 0x1549A966L | 0x1654AE6BL |
               0xAEL | 0xE0L => // header, Segment, Info, Tracks,
            // TrackEntry, Video: descend
            if (id == 0xAEL) { teType = -1; teW = 0; teH = 0 }
            if (depth < 8) walk(body, end, depth + 1)
            if (id == 0xAEL && teType == 1 && teW > 0 && teH > 0 &&
                w0 == 0) {
              w0 = teW; h0 = teH // first video TrackEntry wins
            }
          case 0x4282L => // DocType
            val s = new String(b, body.toInt, math.min(len, 16), "US-ASCII")
            if (s.startsWith("matroska")) mime = "video/x-matroska"
          case 0x2AD7B1L => // TimestampScale
            if (len >= 1 && len <= 8) scale = uintAt(body.toInt, len)
          case 0x4489L => // Duration (float ticks)
            if (len == 4) durTicks =
              java.lang.Float.intBitsToFloat(uintAt(body.toInt, 4).toInt)
            else if (len == 8) durTicks =
              java.lang.Double.longBitsToDouble(uintAt(body.toInt, 8))
          case 0x83L => // TrackType (1 = video)
            if (len >= 1) teType = u(body.toInt)
          case 0xB0L => // PixelWidth
            if (teW == 0 && len >= 1 && len <= 4)
              teW = uintAt(body.toInt, len).toInt
          case 0xBAL => // PixelHeight
            if (teH == 0 && len >= 1 && len <= 4)
              teH = uintAt(body.toInt, len).toInt
          case _ => ()
        }
        go = !unknown // an unknown-size element consumed the rest
        i = end
      }
    }
    walk(0, n.toLong, 0)
    if (w0 <= 0 || h0 <= 0 || w0 > (1 << 20) || h0 > (1 << 20)) return null
    val durMs =
      if (durTicks > 0 && scale > 0) {
        val d = durTicks * scale / 1e6
        // crafted huge floats would saturate toLong — degrade instead
        if (java.lang.Double.isFinite(d) && d < 1e13) d.toLong else -1L
      } else -1L
    (mime, w0, h0, 0, durMs)
  }

  private val MimeWebm = UTF8String.fromString("video/webm")
  private val MimeMkv = UTF8String.fromString("video/x-matroska")

  /** InternalRow form for expression eval/codegen; -1 duration → NULL. */
  def parse(b: Array[Byte]): InternalRow = parseTagged(b) match {
    case null => null
    case (mime, w, h, frames, dur) =>
      val m = mime match {
        case "video/mp4" => MimeMp4
        case "video/webm" => MimeWebm
        case "video/x-matroska" => MimeMkv
        case _ => MimeAvi
      }
      InternalRow(m, w, h, frames,
        if (dur < 0) null else java.lang.Long.valueOf(dur))
  }
}
