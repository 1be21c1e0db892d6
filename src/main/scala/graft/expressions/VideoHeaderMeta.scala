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

  /** (width, height, frames, durationMs or -1) of an AVI header, else
    * null. Chunk traversal is the shared [[Riff]] walk (Long offsets:
    * crafted sizes end the loop, never overflow into a negative
    * index). */
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
                val dur =
                  if (frames > 0 && usPerFrame > 0)
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

  /** InternalRow form for expression eval/codegen; -1 duration → NULL. */
  def parse(b: Array[Byte]): InternalRow = parseFields(b) match {
    case null => null
    case (w, h, frames, dur) =>
      InternalRow(MimeAvi, w, h, frames,
        if (dur < 0) null else java.lang.Long.valueOf(dur))
  }
}
