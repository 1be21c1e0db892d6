package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual VIDEO hash, completing the near-dup family across
  * all four modalities (text SimHash, image aHash/dHash, audio
  * loudness-gradient, and now video): the dHash gradient signs of the
  * clip's TEMPORALLY AVERAGED frame — per-cell luma sums accumulate
  * over a 9×8 grid across every decoded frame (the same Rec.601 luma
  * and floor cell mapping as [[ImageHash]]), and bit `cy·8+cx` is set
  * iff average cell (cx,cy) is brighter than its right neighbor,
  * cross-multiplied so the comparison is exact integer arithmetic.
  *
  * Invariances by construction: frame rate / frame count (averaging),
  * uniform brightness scaling (gradient signs), container details.
  * Re-encodes of the same footage land within a few bits; Hamming
  * banding ([[graft.pipeline.Dedup.hammingNearDupPairs]]) finds the
  * pairs at corpus scale. Decodes through the SAME shared AVI walk as
  * `video_features` ([[VideoFeatures.walkFrames]] — DIB + MJPEG, the
  * one copy of the container logic). NULL for undecodable, frameless,
  * or sub-9×8 input. */
case class VideoHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_hash needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "video_hash"

  override def nullSafeEval(input: Any): Any =
    VideoHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Long h = graft.expressions.VideoHash.hash($c);
      ${ev.isNull} = h == null;
      ${ev.value} = ${ev.isNull} ? 0L : h.longValue();
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoHash =
    copy(child = newChild)
}

object VideoHash {

  def hash(b: Array[Byte]): java.lang.Long = {
    val gw = 9
    val gh = 8
    val sink = new VideoFeatures.FrameSink {
      val sums = new Array[Long](gw * gh)
      val cnts = new Array[Long](gw * gh)
      var w = 0; var h = 0
      def start(w: Int, h: Int): Unit = { this.w = w; this.h = h }
      def accept(x: Int, y: Int, r: Int, g: Int, bl: Int): Unit = {
        val gray = (77 * r + 151 * g + 28 * bl) >> 8
        val k = (y * gh / h) * gw + (x * gw / w)
        sums(k) += gray
        cnts(k) += 1
      }
      def frameEnd(): Unit = ()
    }
    val dims = VideoFeatures.walkFrames(b, sink)
    if (dims == null || dims._1 < gw || dims._2 < gh) return null
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val a = cy * 9 + cx
        if (sink.sums(a) * sink.cnts(a + 1) >
            sink.sums(a + 1) * sink.cnts(a))
          bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }
}
