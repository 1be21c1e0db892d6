package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual image hash — the image twin of the text
  * [[SimHash64]]: near-identical images (re-encodes, resizes, small
  * edits) land within a few Hamming bits of each other, so the existing
  * banded near-dup machinery ([[graft.pipeline.Dedup.imageNearDupPairs]])
  * applies unchanged. Two classic variants, selected by `dhash`:
  *
  *  - **aHash** (average hash): box-downscale to an 8×8 grayscale grid;
  *    bit k = 1 iff cell k's mean exceeds the GLOBAL mean.
  *  - **dHash** (difference hash): box-downscale to a 9×8 grid; bit
  *    (cy·8+cx) = 1 iff cell (cx,cy) is brighter than its right
  *    neighbor (cx+1,cy) — a horizontal-gradient sign map, the variant
  *    that survives brightness/contrast shifts.
  *
  * All arithmetic is EXACT integer so the hash is bit-identical across
  * engines and restatable as SQL (the oracle recomputes it in DuckDB):
  * grayscale is the Rec.601 integer luma `(77r + 151g + 28b) >> 8`;
  * pixel x maps to cell `x·gridW / w` (floor); mean comparisons
  * cross-multiply (`sumA·pixelsB > sumB·pixelsA`) so no division ever
  * rounds. Bit k sits at `1L << k` with k = cy·gridW'+cx in row-major
  * order (gridW' = 8 for both variants — dHash emits 8 bits per row).
  *
  * Decode reuses the validated pixel walks: the zero-allocation 24bpp
  * BMP loop, else the JDK readers (PNG/JPEG/GIF/TIFF/other BMPs), with
  * the same raster caps. NULL for undecodable/corrupt bytes and for
  * images smaller than the grid (below 8×8 / 9×8 there is no signal to
  * hash — a crawl's tracking pixels should not cluster together).
  *
  * Scale posture: narrow map, no shuffle; O(pixels) fold into 72 cells,
  * O(1) extra memory. */
case class ImageHash(child: Expression, dhash: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_hash needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_hash"

  override def nullSafeEval(input: Any): Any =
    ImageHash.hash(input.asInstanceOf[Array[Byte]], dhash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("imageHash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $boxed = graft.expressions.ImageHash.hash($c, $dhash);
      if ($boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $boxed.longValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageHash =
    copy(child = newChild)
}

object ImageHash {

  /** Grid fold: per-cell gray sums and pixel counts, cell assignment by
    * exact integer floor division. One instance per row evaluation —
    * 72 longs of state, no per-pixel allocation. */
  private final class CellSink(gw: Int, gh: Int) extends Pixels.PosSink {
    var w = 0
    var h = 0
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    def start(w: Int, h: Int): Unit = { this.w = w; this.h = h }
    def accept(x: Int, y: Int, r: Int, g: Int, b: Int): Unit = {
      val gray = (77 * r + 151 * g + 28 * b) >> 8
      val k = (y * gh / h) * gw + (x * gw / w)
      sums(k) += gray
      cnts(k) += 1
    }
  }

  /** aHash (dhash = false) or dHash (dhash = true) of any decodable
    * image; null for undecodable bytes or images smaller than the grid. */
  def hash(b: Array[Byte], dhash: Boolean): java.lang.Long = {
    if (b == null) return null
    val gw = if (dhash) 9 else 8
    val gh = 8
    val sink = new CellSink(gw, gh)
    var dims = Pixels.walkBmp24Pos(b, sink)
    if (dims == null) dims = Pixels.walkImageIOPos(b, sink)
    if (dims == null || dims._1 < gw || dims._2 < gh) return null
    val sums = sink.sums
    val cnts = sink.cnts
    var bits = 0L
    if (dhash) {
      // bit (cy*8+cx) = cell (cx,cy) brighter than cell (cx+1,cy);
      // cross-multiplied means (cells in one row share height but not
      // necessarily width, so counts differ)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val a = cy * 9 + cx
          if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
            bits |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
    } else {
      var total = 0L
      var totalPix = 0L
      var k = 0
      while (k < 64) { total += sums(k); totalPix += cnts(k); k += 1 }
      k = 0
      while (k < 64) {
        // cell mean > global mean, cross-multiplied exactly
        if (sums(k) * totalPix > total * cnts(k)) bits |= 1L << k
        k += 1
      }
    }
    bits
  }
}
