package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL audio decode for WAV and FLAC — uncompressed PCM, the G.711 and
  * ADPCM compressed encodings, and the full lossless FLAC codec:
  * samples decoded straight from the bytes and folded into the standard
  * signal features —
  *
  *   - n_samples: decoded frame count (multi-channel input downmixes
  *     to mono by averaging each frame, so a stereo clip's features
  *     match its mono twin),
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
  *     256-entry expansion tables are built once per JVM);
  *   - 0x11 (mono IMA/DVI ADPCM): true block compression, decoded with
  *     the standard step/index adaption;
  *   - FLAC: a complete lossless decoder ([[Flac]]) — every subframe
  *     type (CONSTANT/VERBATIM/FIXED/LPC), Rice residuals, stereo
  *     decorrelation — pure integer arithmetic, no codec library.
  *
  * Unlike the metadata-only [[AudioHeaderMeta]], this expression actually
  * decodes every sample. Features are computed inside the decode loop, so
  * the plan stays narrow (no sample array materializes in the row).
  * Perceptual codecs (MP3, Vorbis) return NULL here — lossy
  * transform decode needs a real codec library. */
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

  /** Signal-feature sink over the shared WAV walk ([[Samples]]). */
  private final class FeatureSink extends Samples.Sink {
    var n = 0L
    var sumSq = 0.0; var peak = 0.0
    var crossings = 0L; private var prevSign = 0
    def accept(x: Double): Unit = {
      sumSq += x * x
      val ax = if (x < 0) -x else x
      if (ax > peak) peak = ax
      val sign = if (x > 0) 1 else if (x < 0) -1 else prevSign
      if (n > 0 && sign != 0 && prevSign != 0 && sign != prevSign)
        crossings += 1
      prevSign = sign
      n += 1
    }
  }

  /** Decode WAV (PCM / G.711 / ADPCM) or FLAC and compute
    * (n, rms, peak, zcr); null for anything else. The validated
    * container walk and per-sample decode live in [[Samples.walkAudio]]
    * (shared with the band-energy embedding). */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val sink = new FeatureSink
    Samples.walkAudio(b, sink) match {
      case -1L => null
      case 0L => InternalRow(0L, 0.0, 0.0, 0.0)
      case count =>
        val rms = math.sqrt(sink.sumSq / count)
        val zcr =
          if (count > 1) sink.crossings.toDouble / (count - 1) else 0.0
        InternalRow(count, rms, sink.peak, zcr)
    }
  }
}
