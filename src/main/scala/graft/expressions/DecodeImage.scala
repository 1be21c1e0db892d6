package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel decode for COMPRESSED image formats too — the codec stage
  * the header-triage family deliberately stops short of:
  *
  *   struct(mime, width, height, mean_r, mean_g, mean_b)
  *
  * Decode strategy, cheapest first:
  *  - uncompressed 24 bpp BMP: the existing zero-allocation byte loop
  *    ([[ImageFeatures]]) — no image object is ever built;
  *  - PNG / JPEG / GIF / other BMP variants / TIFF: the JDK's own
  *    `javax.imageio` readers (headless, no external codec library —
  *    PNG's DEFLATE, JPEG's DCT and GIF's LZW all ship in the JDK), with
  *    the in-memory stream cache so executors never touch local disk.
  *
  * Means fold row-by-row through a reused one-row buffer, so peak extra
  * memory is O(width), not O(pixels), on top of the decoded raster.
  * Returns NULL for bytes no reader recognizes (including truncated or
  * corrupt files — a 100 TB crawl corpus is full of them, and a poison
  * row must degrade to NULL, not kill the task).
  *
  * Scale posture: narrow map, no shuffle; decode cost is inherently
  * per-row codec work, so the right plan is exactly this — one pass,
  * feature extraction fused into the decode, no pixel arrays in rows. */
case class DecodeImage(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_decode needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = DecodeImage.featureType
  override def nullable: Boolean = true
  override def prettyName: String = "image_decode"

  override def nullSafeEval(input: Any): Any =
    DecodeImage.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.DecodeImage.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodeImage =
    copy(child = newChild)
}

object DecodeImage {
  val featureType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  private val MimeTiff = UTF8String.fromString("image/tiff")

  private[expressions] def isTiff(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** Decode any JDK-readable image and fold per-channel means; null when
    * nothing recognizes the bytes. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    ImageHeaderMeta.parseDims(b) match {
      case null =>
        if (isTiff(b)) viaImageIO(b, MimeTiff) else null
      case ("image/bmp", _, _) =>
        // fast path: raw 24bpp needs no image object; other BMP variants
        // (palette, 32bpp, RLE) fall through to the JDK reader
        val fast = ImageFeatures.parse(b)
        if (fast != null)
          InternalRow(ImageHeaderMeta.mimeUtf8("image/bmp"),
            fast.getInt(0), fast.getInt(1), fast.getDouble(2),
            fast.getDouble(3), fast.getDouble(4))
        else viaImageIO(b, ImageHeaderMeta.mimeUtf8("image/bmp"))
      case (mime, _, _) => viaImageIO(b, ImageHeaderMeta.mimeUtf8(mime))
    }
  }

  private def viaImageIO(b: Array[Byte], mime: UTF8String): InternalRow = {
    val sums = new ImageFeatures.MeanSink
    Pixels.walkImageIO(b, sums) match {
      case null => null
      case (w, h) =>
        val count = w.toLong * h
        InternalRow(mime, w, h, sums.r.toDouble / count,
          sums.g.toDouble / count, sums.b.toDouble / count)
    }
  }
}
