package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual AUDIO hash — the audio member of the near-dup hash
  * family ([[SimHash64]] text, [[ImageHash]] pixels): re-encoded,
  * trimmed-silence, or lightly edited copies of a clip land within a
  * few Hamming bits, so [[graft.pipeline.Dedup.hammingNearDupPairs]]
  * applies unchanged.
  *
  * Construction (the dHash idea on the loudness envelope): the decoded
  * sample stream splits into 65 equal windows by index
  * (`w = i·65 / n`), each window folds the mean absolute amplitude,
  * and bit k = 1 iff window k is louder than window k+1 — a
  * gradient-sign map of the envelope, robust to global volume scaling
  * by construction ONLY across exact scaling of the comparison (the
  * envelope SHAPE is compared, not its level: doubling every sample
  * flips no bits, since both sides of each comparison double).
  *
  * Exactness: each sample quantizes back to its 16-bit integer
  * (`rint(x·32768)` — the inverse of the decoder's normalization, an
  * identity for integer PCM), absolute values accumulate in LONGS
  * (order-independent), and window means compare cross-multiplied in
  * BigInt (no overflow at any decodable length, no division, no
  * rounding) — so the hash is bit-identical across partitionings and
  * restatable as integer SQL (the q_audio_phash oracle recomputes it).
  *
  * Decode reuses [[Samples.walkAudio]] (PCM/float/G.711/ADPCM WAV and
  * the full FLAC decoder, with their caps). The stream is walked twice
  * — once to learn `n`, once to fold windows — because the window of a
  * sample depends on the total count; both walks are the same bounded
  * decode. NULL for undecodable bytes and for clips shorter than 65
  * samples. Narrow map, no shuffle. */
case class AudioHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_hash needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_hash"

  override def nullSafeEval(input: Any): Any =
    AudioHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("audioHash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $boxed = graft.expressions.AudioHash.hash($c);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.longValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioHash =
    copy(child = newChild)
}

object AudioHash {

  private val Windows = 65 // 64 adjacent comparisons

  private final class CountSink extends Samples.Sink {
    var n = 0L
    def accept(x: Double): Unit = n += 1
  }

  private final class WinSink(n: Long) extends Samples.Sink {
    val sums = new Array[Long](Windows)
    val cnts = new Array[Long](Windows)
    private var i = 0L
    def accept(x: Double): Unit = {
      // back to the 16-bit integer the decoder normalized from; |.| as
      // a long so window sums are exact and order-independent
      val v = Math.abs(Math.rint(x * 32768.0).toLong)
      val w = (i * Windows / n).toInt
      sums(w) += v
      cnts(w) += 1
      i += 1
    }
  }

  def hash(b: Array[Byte]): java.lang.Long = {
    if (b == null) return null
    val counter = new CountSink
    if (Samples.walkAudio(b, counter) < 0) return null
    val n = counter.n
    if (n < Windows) return null
    val sink = new WinSink(n)
    if (Samples.walkAudio(b, sink) < 0) return null
    var bits = 0L
    var k = 0
    while (k < Windows - 1) {
      // mean(k) > mean(k+1), cross-multiplied exactly (window counts
      // differ by at most one, sums can reach 32768·n — BigInt keeps
      // the product exact at any length)
      val l = BigInt(sink.sums(k)) * sink.cnts(k + 1)
      val r = BigInt(sink.sums(k + 1)) * sink.cnts(k)
      if (l > r) bits |= 1L << k
      k += 1
    }
    bits
  }
}
