package graft.expressions

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL image resize: decode (any JDK-readable format — PNG/JPEG/GIF/
  * BMP/TIFF), scale the long side down to `maxSide` preserving aspect
  * ratio (never upscale), re-encode as PNG. The thumbnail stage of a
  * multimodal pipeline, done with the JDK's own codecs — no external
  * library, headless, in-memory streams only.
  *
  * Target dims use integer half-up rounding
  * (`(short·maxSide + long/2) / long`, floor 1), so the output shape is
  * exactly reproducible by plain arithmetic — which is how the oracle
  * checks it. Bilinear interpolation; returns NULL for bytes no reader
  * recognizes, so corrupt corpus rows degrade instead of failing tasks.
  *
  * Scale posture: narrow map, no shuffle; output bytes are strictly
  * smaller than a decoded raster, so rows stay bounded. */
case class ResizeImage(child: Expression, maxSide: Int)
    extends UnaryExpression {

  require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"resize_image needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "resize_image"

  override def nullSafeEval(input: Any): Any =
    ResizeImage.resize(input.asInstanceOf[Array[Byte]], maxSide)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ResizeImage.resize($c, $maxSide);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ResizeImage =
    copy(child = newChild)
}

object ResizeImage {
  Pixels.ensureInit() // headless + in-memory ImageIO streams

  /** Integer-exact target dims: long side capped at `maxSide`, short
    * side half-up rounded, floor 1; identity when already small. */
  def targetDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val long = math.max(w, h)
    if (long <= maxSide) (w, h)
    else {
      val short = math.min(w, h)
      val scaled = math.max(1,
        ((short.toLong * maxSide + long / 2) / long).toInt)
      if (w >= h) (maxSide, scaled) else (scaled, maxSide)
    }
  }

  /** Decode → scale → PNG bytes; null when nothing decodes the input or
    * the header declares a raster beyond the [[Pixels.readCapped]]
    * allocation caps (poison rows degrade, never OOM). */
  def resize(b: Array[Byte], maxSide: Int): Array[Byte] =
    try {
      val img = Pixels.readCapped(b)
      if (img == null) return null
      val (tw, th) = targetDims(img.getWidth, img.getHeight, maxSide)
      val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    } catch {
      case e: InterruptedException => throw e
      case _: Throwable => null // incl. OOM despite the caps
    }
}
