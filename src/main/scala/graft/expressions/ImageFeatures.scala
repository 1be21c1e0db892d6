package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL image decode for uncompressed 24-bit BMP: every pixel read
  * straight from the BGR byte rows (4-byte-aligned, bottom-up or
  * top-down) and folded into per-channel means —
  *
  *   struct(width, height, mean_r, mean_g, mean_b)  (means in [0, 255]).
  *
  * The uncompressed-bitmap sibling of [[AudioFeatures]]: an actual pixel
  * decode with no codec library, because BI_RGB BMP stores raw samples.
  * Means are computed inside the decode loop (row order is irrelevant to
  * a mean), so the plan stays narrow — no pixel array in the row.
  * Anything that isn't an uncompressed 24 bpp BMP returns NULL and
  * belongs to the codec stage. */
case class ImageFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_features needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ImageFeatures.featureType
  override def nullable: Boolean = true
  override def prettyName: String = "image_features"

  override def nullSafeEval(input: Any): Any =
    ImageFeatures.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ImageFeatures.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageFeatures =
    copy(child = newChild)
}

object ImageFeatures {
  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Decode 24bpp BI_RGB BMP and compute per-channel means; else null.
    * The validated byte loop lives in [[Pixels.walkBmp24]] (shared with
    * the histogram embedding). */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val sums = new MeanSink
    Pixels.walkBmp24(b, sums) match {
      case null => null
      case (width, height) =>
        val count = width.toLong * height
        InternalRow(width, height, sums.r.toDouble / count,
          sums.g.toDouble / count, sums.b.toDouble / count)
    }
  }

  /** Channel-sum sink shared by the BMP and JDK-reader walks. */
  private[expressions] final class MeanSink extends Pixels.Sink {
    var r = 0L; var g = 0L; var b = 0L
    def accept(pr: Int, pg: Int, pb: Int): Unit = { r += pr; g += pg; b += pb }
  }
}
