package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** REAL image embedding: a per-channel color histogram over every
  * decoded pixel — the classical image-retrieval feature (Swain &
  * Ballard's color indexing), not a hash-derived fake. Output is
  * `array<float>` of length `3 * bins`: the R, G then B histograms,
  * each L1-normalized by the pixel count, so any two images are
  * comparable under the cosine/dot machinery the embedding pipeline
  * already has (near-dup pairs, kNN, IVF) — decode → embed → LSH is a
  * fully real image near-dup pipeline with zero external dependencies.
  *
  * Decode reuses the [[DecodeImage]] strategy: 24bpp BMP through the
  * raw byte loop, PNG/JPEG/GIF/TIFF/other BMP through the JDK's own
  * readers; NULL when nothing recognizes the bytes. Counts fold
  * directly into the histogram inside the decode loop — no pixel
  * array, O(bins) state, narrow map. */
case class ImageEmbedding(child: Expression, bins: Int)
    extends UnaryExpression {

  require(bins >= 1 && bins <= 256, s"bins must be in [1,256], got $bins")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_embedding needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "image_embedding"

  override def nullSafeEval(input: Any): Any =
    ImageEmbedding.embed(input.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ImageEmbedding.embed($c, $bins);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageEmbedding =
    copy(child = newChild)
}

object ImageEmbedding {

  /** Histogram sink over the shared pixel walks ([[Pixels]]). */
  private final class HistSink(bins: Int) extends Pixels.Sink {
    val counts = new Array[Long](3 * bins)
    def accept(r: Int, g: Int, b: Int): Unit = {
      counts(r * bins / 256) += 1
      counts(bins + g * bins / 256) += 1
      counts(2 * bins + b * bins / 256) += 1
    }
  }

  /** 3·bins L1-normalized RGB histogram of any decodable image. */
  def embed(b: Array[Byte], bins: Int): ArrayData = {
    if (b == null) return null
    val sink = new HistSink(bins)
    val dims = ImageHeaderMeta.parseDims(b) match {
      case ("image/bmp", _, _) =>
        // fast path: raw 24bpp loop; other BMP variants → JDK reader
        val fast = Pixels.walkBmp24(b, sink)
        if (fast != null) fast else Pixels.walkImageIO(b, sink)
      case null =>
        if (DecodeImage.isTiff(b)) Pixels.walkImageIO(b, sink) else null
      case _ => Pixels.walkImageIO(b, sink)
    }
    dims match {
      case null => null
      case (w, h) =>
        val n = w.toLong * h
        val out = new Array[Float](3 * bins)
        var i = 0
        while (i < out.length) {
          out(i) = (sink.counts(i).toDouble / n.toDouble).toFloat
          i += 1
        }
        new GenericArrayData(out)
    }
  }
}
