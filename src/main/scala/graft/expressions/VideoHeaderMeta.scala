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
    * null. */
  def parseFields(b: Array[Byte]): (Int, Int, Int, Long) = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) |
        (u(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int, t: String): Boolean =
      u(i) == t.charAt(0) && u(i + 1) == t.charAt(1) &&
        u(i + 2) == t.charAt(2) && u(i + 3) == t.charAt(3)
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return null
    // Long walk offsets: crafted 32-bit chunk sizes advance past the end
    // (loop ends), never overflow Int into a negative index — poison
    // rows degrade to NULL, they don't throw
    var iL = 12L // top-level chunk walk for LIST hdrl
    while (iL + 12 <= n) {
      val i = iL.toInt
      val size = le32(i + 4)
      if (tag(i, "LIST") && tag(i + 8, "hdrl")) {
        var jL = i + 12L // children of hdrl; avih is mandatory (walk anyway)
        val end = math.min(i + 8L + size, n.toLong)
        while (jL + 8 <= end) {
          val j = jL.toInt
          val csize = le32(j + 4)
          if (tag(j, "avih")) {
            if (csize < 40 || j + 8 + 40 > n) return null
            val usPerFrame = le32(j + 8)
            val frames = le32(j + 8 + 16)
            val width = le32(j + 8 + 32)
            val height = le32(j + 8 + 36)
            if (width <= 0 || height <= 0 || width > (1 << 20) ||
                height > (1 << 20) || frames > Int.MaxValue) return null
            val dur =
              if (frames > 0 && usPerFrame > 0) frames * usPerFrame / 1000L
              else -1L
            return (width.toInt, height.toInt, frames.toInt, dur)
          }
          jL += 8 + csize + (csize & 1)
        }
        return null // hdrl without avih: corrupt
      }
      iL += 8 + size + (size & 1)
    }
    null
  }

  /** InternalRow form for expression eval/codegen; -1 duration → NULL. */
  def parse(b: Array[Byte]): InternalRow = parseFields(b) match {
    case null => null
    case (w, h, frames, dur) =>
      InternalRow(MimeAvi, w, h, frames,
        if (dur < 0) null else java.lang.Long.valueOf(dur))
  }
}
