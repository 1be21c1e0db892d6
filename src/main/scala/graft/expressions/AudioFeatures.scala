package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL audio decode for uncompressed WAV: PCM samples read straight from
  * the `data` chunk bytes (8-bit unsigned or 16-bit signed little-endian,
  * any channel count) and folded into the standard signal features —
  *
  *   - n_samples: decoded sample count (all channels interleaved),
  *   - rms:  sqrt(mean(x²)) of samples normalized to [-1, 1),
  *   - peak: max |x|,
  *   - zcr:  sign-change fraction over consecutive samples
  *           (crossings / (n-1); zero samples carry the previous sign).
  *
  * Unlike the metadata-only [[AudioHeaderMeta]], this expression actually
  * decodes every sample — possible without any codec library precisely
  * because PCM WAV is uncompressed. Features are computed inside the
  * decode loop, so the plan stays narrow (no sample array materializes in
  * the row). Compressed containers return NULL here and belong to the
  * (stubbed) codec stage. */
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

  /** Decode PCM and compute (n, rms, peak, zcr); null if not PCM WAV. */
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
    var i = 12
    while (i + 8 <= n && (fmtCode < 0 || dataOff < 0)) {
      val size = le32(i + 4)
      if (size > Int.MaxValue - 16) return null
      if (u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' && u(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > n) return null
        fmtCode = le16(i + 8)
        bits = le16(i + 22)
      } else if (u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' &&
          u(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size.toInt, n - dataOff) // tolerate truncation
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmtCode != 1 || dataOff < 0) return null // PCM only
    val bytesPer = bits match { case 8 => 1; case 16 => 2; case _ => return null }
    val count = dataLen / bytesPer
    if (count == 0) return InternalRow(0L, 0.0, 0.0, 0.0)
    var sumSq = 0.0; var peak = 0.0
    var crossings = 0; var prevSign = 0
    var k = 0
    while (k < count) {
      val x =
        if (bytesPer == 1) (u(dataOff + k) - 128) / 128.0
        else le16(dataOff + 2 * k).toShort / 32768.0
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
