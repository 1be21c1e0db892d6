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

  /** Decode 24bpp BI_RGB BMP and compute per-channel means; else null. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Int =
      u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    if (n < 54 || u(0) != 'B' || u(1) != 'M') return null
    val pixOff = le32(10)
    val width = le32(18)
    val heightRaw = le32(22)           // negative = top-down
    val height = if (heightRaw < 0) -heightRaw else heightRaw
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0) return null
    if (width <= 0 || height <= 0 || width > (1 << 20) ||
        height > (1 << 20)) return null
    val rowBytes = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    if (pixOff < 0 || pixOff.toLong + rowBytes.toLong * height > n)
      return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var row = 0
    while (row < height) {
      var p = pixOff + row * rowBytes
      var col = 0
      while (col < width) {            // BGR order on disk
        sb += u(p); sg += u(p + 1); sr += u(p + 2)
        p += 3; col += 1
      }
      row += 1
    }
    val count = width.toLong * height
    InternalRow(width, height,
      sr.toDouble / count, sg.toDouble / count, sb.toDouble / count)
  }
}
