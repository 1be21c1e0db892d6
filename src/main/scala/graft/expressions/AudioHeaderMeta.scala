package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for header-level audio metadata: container
  * format, channel count, sample rate, bit depth, and duration parsed from
  * the raw leading bytes of a binary column — NO codec, the audio sibling
  * of [[ImageHeaderMeta]].
  *
  *  - WAV:  RIFF/WAVE container; chunk walk to `fmt ` (channels LE16,
  *    sample rate LE32, byte rate LE32, bits LE16) and `data` (payload
  *    size → duration = size·1000/byteRate). Chunks are word-aligned, so
  *    odd sizes advance one pad byte.
  *  - FLAC: `fLaC` magic, then the mandatory first STREAMINFO metadata
  *    block: a packed bit-field at offset +10 of the block body holds
  *    sample rate (20 bits), channels−1 (3 bits), bits-per-sample−1
  *    (5 bits), total samples (36 bits → duration; 0 = unknown → NULL
  *    duration).
  *
  * Returns struct(mime, channels, sample_rate, bits_per_sample,
  * duration_ms); NULL for anything that isn't a recognizable audio
  * header. Same 100 TB role as the image path: format/rate/length triage
  * at full scan speed inside whole-stage codegen, long before any decode
  * stage. */
case class AudioHeaderMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_header_meta needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioHeaderMeta.metaType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_header_meta"

  override def nullSafeEval(input: Any): Any =
    AudioHeaderMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.AudioHeaderMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioHeaderMeta =
    copy(child = newChild)
}

object AudioHeaderMeta {
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = true)))

  private val MimeWav = UTF8String.fromString("audio/wav")
  private val MimeFlac = UTF8String.fromString("audio/flac")

  /** (mime, channels, sampleRate, bits, durationMs or -1) of a recognized
    * audio header, else null. */
  def parseFields(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) |
        (u(i + 3).toLong << 24)) & 0xffffffffL
    def be24(i: Int): Int = (u(i) << 16) | (u(i + 1) << 8) | u(i + 2)
    // WAV: RIFF....WAVE, then a chunk walk for fmt  + data
    if (n >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'A' && u(10) == 'V' && u(11) == 'E') {
      var channels = -1; var rate = -1; var bits = -1
      var byteRate = 0L; var dataSize = -1L
      var badFmt = false
      // shared Riff walk: Long offsets, so crafted chunk sizes end the
      // loop instead of overflowing into a negative index — poison rows
      // degrade to NULL, they don't throw
      Riff.eachChunk(b, 12, n.toLong) { (i, size) =>
        if (u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' &&
            u(i + 3) == ' ') {
          if (size < 16 || i + 8 + 16 > n) { badFmt = true }
          else {
            channels = le16(i + 10)
            rate = le32(i + 12).toInt
            byteRate = le32(i + 16)
            bits = le16(i + 22)
          }
        } else if (u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' &&
            u(i + 3) == 'a') {
          dataSize = size
        }
        !badFmt && (channels < 0 || dataSize < 0)
      }
      if (badFmt || channels <= 0 || rate <= 0) return null
      val dur =
        if (dataSize >= 0 && byteRate > 0) dataSize * 1000L / byteRate
        else -1L
      return ("audio/wav", channels, rate, bits, dur)
    }
    // FLAC: fLaC magic + mandatory leading STREAMINFO block
    if (n >= 4 + 4 + 34 && u(0) == 'f' && u(1) == 'L' && u(2) == 'a' &&
        u(3) == 'C' && (u(4) & 0x7f) == 0) { // block type 0 = STREAMINFO
      val blockLen = be24(5)
      if (blockLen < 34) return null
      val s = 8 // STREAMINFO body start
      // +10: packed — 20 bits sample rate, 3 bits channels-1,
      // 5 bits bits-1, 36 bits total samples
      val rate = (u(s + 10) << 12) | (u(s + 11) << 4) | (u(s + 12) >> 4)
      val channels = ((u(s + 12) >> 1) & 0x07) + 1
      val bits = (((u(s + 12) & 0x01) << 4) | (u(s + 13) >> 4)) + 1
      val totalSamples = ((u(s + 13) & 0x0f).toLong << 32) |
        (u(s + 14).toLong << 24) | (u(s + 15) << 16) |
        (u(s + 16) << 8) | u(s + 17)
      if (rate <= 0) return null
      val dur =
        if (totalSamples > 0) totalSamples * 1000L / rate else -1L
      return ("audio/flac", channels, rate, bits, dur)
    }
    null
  }

  /** InternalRow form for expression eval/codegen; -1 duration → NULL. */
  def parse(b: Array[Byte]): InternalRow = parseFields(b) match {
    case null => null
    case (mime, ch, rate, bits, dur) =>
      InternalRow(if (mime == "audio/wav") MimeWav else MimeFlac,
        ch, rate, bits, if (dur < 0) null else java.lang.Long.valueOf(dur))
  }
}
