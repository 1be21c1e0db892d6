package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** REAL audio embedding: normalized spectral band energies over every
  * decoded sample — the classical audio-similarity feature (a coarse
  * power spectrum), the audio twin of [[ImageEmbedding]]. Output is
  * `array<float>` of length `bands`: band k is the Goertzel power at
  * normalized frequency k/(2·(bands−1)) cycles/sample (band 0 = DC,
  * band bands−1 = Nyquist), L1-normalized so any two clips compare
  * under the cosine/dot machinery the embedding pipeline already has —
  * decode → embed → LSH is a fully real audio near-dup path.
  *
  * Decode reuses [[Samples.walkAudio]] (WAV PCM 8/16-bit, G.711
  * µ-law/A-law, IMA ADPCM, and the full lossless FLAC decoder);
  * all `bands` Goertzel recurrences fold inside the single sample loop
  * (O(bands) state, no sample array), so the plan stays narrow. NULL
  * for unsupported/corrupt bytes; an all-silence clip embeds as the
  * zero vector (no energy anywhere, not NaN). */
case class AudioEmbedding(child: Expression, bands: Int)
    extends UnaryExpression {

  require(bands >= 2 && bands <= 256, s"bands must be in [2,256], got $bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_embedding needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "audio_embedding"

  override def nullSafeEval(input: Any): Any =
    AudioEmbedding.embed(input.asInstanceOf[Array[Byte]], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.AudioEmbedding.embed($c, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioEmbedding =
    copy(child = newChild)
}

object AudioEmbedding {

  /** Goertzel bank sink: s0 = x + c_k·s1 − s2 per band per sample,
    * power_k = s1² + s2² − c_k·s1·s2 after the stream. */
  private final class GoertzelSink(bands: Int) extends Samples.Sink {
    val c = Array.tabulate(bands)(k =>
      2.0 * math.cos(math.Pi * k / (bands - 1)))
    val s1 = new Array[Double](bands)
    val s2 = new Array[Double](bands)
    def accept(x: Double): Unit = {
      var k = 0
      while (k < bands) {
        val s0 = x + c(k) * s1(k) - s2(k)
        s2(k) = s1(k); s1(k) = s0
        k += 1
      }
    }
    def power(k: Int): Double =
      s1(k) * s1(k) + s2(k) * s2(k) - c(k) * s1(k) * s2(k)
  }

  /** `bands` L1-normalized Goertzel band powers of a supported WAV or
    * FLAC. */
  def embed(b: Array[Byte], bands: Int): ArrayData = {
    if (b == null) return null
    val sink = new GoertzelSink(bands)
    val count = Samples.walkAudio(b, sink)
    if (count < 0) return null
    val p = new Array[Double](bands)
    var total = 0.0
    var k = 0
    while (k < bands) {
      val v = sink.power(k)
      p(k) = if (v > 0) v else 0.0 // numeric noise can dip below zero
      total += p(k)
      k += 1
    }
    val out = new Array[Float](bands)
    if (total > 0) {
      k = 0
      while (k < bands) { out(k) = (p(k) / total).toFloat; k += 1 }
    } // silence (or empty) → zero vector
    new GenericArrayData(out)
  }
}
