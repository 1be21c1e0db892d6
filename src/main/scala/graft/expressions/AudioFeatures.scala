package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL audio decode for WAV — uncompressed PCM and the G.711 companded
  * (compressed) encodings: samples read straight from the `data` chunk
  * bytes and folded into the standard signal features —
  *
  *   - n_samples: decoded sample count (all channels interleaved),
  *   - rms:  sqrt(mean(x²)) of samples normalized to [-1, 1),
  *   - peak: max |x|,
  *   - zcr:  sign-change fraction over consecutive samples
  *           (crossings / (n-1); zero samples carry the previous sign).
  *
  * Format coverage by WAV fmt code:
  *   - 1 (PCM): 8-bit unsigned or 16-bit signed little-endian;
  *   - 7 (µ-law) and 6 (A-law): the ITU-T G.711 logarithmic codecs —
  *     genuinely compressed audio, decoded with the standard
  *     expand-to-linear arithmetic (no codec library needed; the
  *     256-entry expansion tables are built once per JVM).
  *
  * Unlike the metadata-only [[AudioHeaderMeta]], this expression actually
  * decodes every sample. Features are computed inside the decode loop, so
  * the plan stays narrow (no sample array materializes in the row).
  * Block/perceptual codecs (ADPCM, MP3, FLAC) return NULL here and belong
  * to the codec stage. */
case class AudioFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_features needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioFeatures.featureType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_features"

  override def nullSafeEval(input: Any): Any =
    AudioFeatures.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.AudioFeatures.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioFeatures =
    copy(child = newChild)
}

object AudioFeatures {
  val featureType: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false),
    StructField("zcr", DoubleType, nullable = false)))

  // ITU-T G.711 expansion to 16-bit linear, normalized to [-1, 1).
  // µ-law: mag = 132·(2^e − 1) + m·2^(e+3) over the complemented byte.
  private val UlawTable: Array[Double] = Array.tabulate(256) { v =>
    val u = ~v & 0xff
    val e = (u >> 4) & 7
    val m = u & 0x0f
    val mag = 132 * ((1 << e) - 1) + (m << (e + 3))
    (if ((u & 0x80) != 0) -mag else mag) / 32768.0
  }

  // A-law: seg 0 → 16m+8, else (16m+264)·2^(seg−1), over the 0x55-xored
  // byte; bit 7 set = positive.
  private val AlawTable: Array[Double] = Array.tabulate(256) { v =>
    val a = v ^ 0x55
    val m = a & 0x0f
    val seg = (a >> 4) & 7
    val t = if (seg == 0) (m << 4) + 8 else ((m << 4) + 264) << (seg - 1)
    (if ((a & 0x80) != 0) t else -t) / 32768.0
  }

  /** Decode PCM / µ-law / A-law WAV and compute (n, rms, peak, zcr);
    * null for anything else. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) |
        (u(i + 3).toLong << 24)) & 0xffffffffL
    if (n < 12 || u(0) != 'R' || u(1) != 'I' || u(2) != 'F' || u(3) != 'F' ||
        u(8) != 'W' || u(9) != 'A' || u(10) != 'V' || u(11) != 'E') return null
    var fmtCode = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    // Long walk offset: a crafted 32-bit chunk size must advance past the
    // end of the blob (ending the loop), never overflow Int into a
    // negative index — poison rows degrade to NULL, they don't throw
    var iL = 12L
    while (iL + 8 <= n && (fmtCode < 0 || dataOff < 0)) {
      val i = iL.toInt
      val size = le32(i + 4)
      if (u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' && u(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > n) return null
        fmtCode = le16(i + 8)
        bits = le16(i + 22)
      } else if (u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' &&
          u(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (n - dataOff).toLong).toInt // tolerate truncation
      }
      iL += 8 + size + (size & 1)
    }
    if (dataOff < 0) return null
    // mode: 0 = PCM8, 1 = PCM16, 2 = µ-law, 3 = A-law
    val mode = (fmtCode, bits) match {
      case (1, 8) => 0
      case (1, 16) => 1
      case (7, 8) => 2
      case (6, 8) => 3
      case _ => return null
    }
    val bytesPer = if (mode == 1) 2 else 1
    val count = dataLen / bytesPer
    if (count == 0) return InternalRow(0L, 0.0, 0.0, 0.0)
    var sumSq = 0.0; var peak = 0.0
    var crossings = 0; var prevSign = 0
    var k = 0
    while (k < count) {
      val x = mode match {
        case 0 => (u(dataOff + k) - 128) / 128.0
        case 1 => le16(dataOff + 2 * k).toShort / 32768.0
        case 2 => UlawTable(u(dataOff + k))
        case _ => AlawTable(u(dataOff + k))
      }
      sumSq += x * x
      val ax = if (x < 0) -x else x
      if (ax > peak) peak = ax
      val sign = if (x > 0) 1 else if (x < 0) -1 else prevSign
      if (k > 0 && sign != 0 && prevSign != 0 && sign != prevSign)
        crossings += 1
      prevSign = sign
      k += 1
    }
    val rms = math.sqrt(sumSq / count)
    val zcr = if (count > 1) crossings.toDouble / (count - 1) else 0.0
    InternalRow(count.toLong, rms, peak, zcr)
  }
}
