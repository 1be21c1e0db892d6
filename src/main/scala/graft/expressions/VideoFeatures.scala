package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL video frame decode for AVI — the video leg of the decode family
  * ([[ImageFeatures]]/[[DecodeImage]] for images, [[AudioFeatures]] for
  * audio). Two codecs cover the decodable AVI corpus:
  *
  *  - `NNdb` (uncompressed DIB) frames are decoded pixel by pixel — raw
  *    bottom-up BGR24 rows, 4-byte-aligned, exactly the BMP raster
  *    layout, so no codec library is needed;
  *  - `NNdc` frames whose payload is a complete JPEG (MJPEG — each frame
  *    an independent JPEG, by far the most common intra-only AVI codec)
  *    are decoded through the JDK's own JPEG reader
  *    ([[Pixels.walkImageIO]]), the same zero-dependency path
  *    [[DecodeImage]] uses for still JPEGs.
  *
  * (`NN` is the two-digit stream number — the video stream need not be
  * stream 00.)
  *
  * Every decoded frame folds into
  *
  *   struct(n_frames, width, height, mean_r, mean_g, mean_b, motion)
  *
  * where the means span every pixel of every decoded frame and `motion`
  * is the mean absolute frame-to-frame change of the per-frame channel
  * means (averaged over R/G/B) — the cheap temporal signal used for
  * scene-change/static-clip triage. State is O(1): sums fold inside the
  * decode loop, no frame or pixel array materializes in the row (the
  * MJPEG path materializes one frame's JPEG slice + one decoded row at a
  * time).
  *
  * Chunks with other codecs (`NNdc` that isn't JPEG — inter-frame codecs
  * need a real video library — audio `01wb`, index chunks) are skipped;
  * NULL when the container isn't AVI, carries no decodable frame, a
  * `00db` chunk's size doesn't match the raster geometry, or a JPEG
  * frame fails to decode or disagrees with the avih dimensions (corrupt
  * rows degrade, they don't throw). */
case class VideoFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_features needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = VideoFeatures.featureType
  override def nullable: Boolean = true
  override def prettyName: String = "video_features"

  override def nullSafeEval(input: Any): Any =
    VideoFeatures.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.VideoFeatures.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VideoFeatures =
    copy(child = newChild)
}

object VideoFeatures {
  val featureType: StructType = StructType(Seq(
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("motion", DoubleType, nullable = false)))

  /** Decode every uncompressed frame and fold means + motion; null when
    * nothing decodes. */
  /** Per-frame pixel consumer for [[walkFrames]]: `start(w,h)` once,
    * `accept(x,y,r,g,b)` per pixel in row-major top-down order,
    * `frameEnd()` after each complete frame. */
  trait FrameSink extends Pixels.PosSink { def frameEnd(): Unit }

  /** Shared AVI frame walk (uncompressed DIB + MJPEG, interleaved
    * `rec ` lists, the corruption contract of [[parse]]): streams every
    * decoded frame pixel of every frame to `sink`. Returns
    * (width, height, frames), or null for corrupt/frameless input —
    * serving [[parse]] and [[VideoHash]] from ONE copy of the
    * container/decode logic. */
  def walkFrames(b: Array[Byte], sink: FrameSink): (Int, Int, Int) = {
    if (b == null) return null
    val dims = VideoHeaderMeta.parseFields(b)
    if (dims == null) return null
    val (width, height, _, _) = dims
    def u(i: Int): Int = b(i) & 0xff
    val rowBytes = (width * 3 + 3) & ~3
    val frameBytes = rowBytes.toLong * height
    var frames = 0
    var corrupt = false
    sink.start(width, height)

    def decodeFrame(off: Int): Unit = {
      var row = 0
      while (row < height) {
        var p = off + row * rowBytes
        var col = 0
        while (col < width) { // BGR order; bottom-up storage → the
          // LOGICAL y is flipped, matching the Pixels walkers' contract
          sink.accept(col, height - 1 - row, u(p + 2), u(p + 1), u(p))
          p += 3; col += 1
        }
        row += 1
      }
      sink.frameEnd()
      frames += 1
    }

    def decodeJpegFrame(off: Int, len: Int): Unit = {
      val slice = java.util.Arrays.copyOfRange(b, off, off + len)
      val dims = Pixels.walkImageIOPos(slice, sink)
      // a frame that fails to decode or disagrees with the avih geometry
      // poisons the fold — treat the container as corrupt, like a
      // wrong-sized 00db raster
      if (dims == null || dims._1 != width || dims._2 != height) corrupt = true
      else { sink.frameEnd(); frames += 1 }
    }

    // video frame chunks are '<2-digit stream>db' (uncompressed DIB) or
    // '<2-digit stream>dc' (compressed; MJPEG when the payload is a
    // JPEG) — the video stream is usually but not always stream 00
    def frameTag(j: Int): Char = {
      if (u(j) < '0' || u(j) > '9' || u(j + 1) < '0' || u(j + 1) > '9' ||
          u(j + 2) != 'd') return ' '
      val t = u(j + 3)
      if (t == 'b' || t == 'c') t.toChar else ' '
    }

    // frame chunks sit either directly under movi or (interleaved AVIs)
    // one level down inside 'LIST rec ' groups; the AVI spec allows only
    // that single level, and capping the depth keeps crafted deep 'rec '
    // nesting from overflowing the stack (poison rows degrade, never
    // throw)
    def visitMovi(from: Int, end: Long, depth: Int): Unit =
      Riff.eachChunk(b, from, end) { (j, csize) =>
        val tag = frameTag(j)
        if (tag == 'b') {
          // uncompressed DIB frame: must match the raster geometry
          // exactly and stay inside its enclosing list, else the
          // container is corrupt (payload bleeding into idx1/JUNK bytes
          // must not be folded into the features)
          if (csize != frameBytes || j + 8 + frameBytes > end) corrupt = true
          else decodeFrame(j + 8)
          !corrupt
        } else if (tag == 'c' && csize >= 2 && j + 8 + csize <= end &&
            u(j + 8) == 0xff && u(j + 9) == 0xd8) {
          // MJPEG frame: the payload is a complete JPEG (SOI-led)
          decodeJpegFrame(j + 8, csize.toInt)
          !corrupt
        } else if (depth == 0 && j + 12 <= end && Riff.tag(b, j, "LIST") &&
            Riff.tag(b, j + 8, "rec ")) {
          visitMovi(j + 12, math.min(j + 8 + csize, end), depth + 1)
          !corrupt
        } else true
      }

    Riff.eachChunk(b, 12, b.length.toLong, minHeader = 12) { (i, size) =>
      if (Riff.tag(b, i, "LIST") && Riff.tag(b, i + 8, "movi"))
        visitMovi(i + 12, math.min(i + 8L + size, b.length.toLong), 0)
      !corrupt
    }
    if (corrupt || frames == 0) null else (width, height, frames)
  }

  def parse(b: Array[Byte]): InternalRow = {
    // per-frame channel sums folded through the shared walk; means and
    // motion computed exactly as before the walkFrames refactor
    val sink = new FrameSink {
      var fr = 0L; var fg = 0L; var fb = 0L
      var sr = 0L; var sg = 0L; var sb = 0L
      var prevR = 0.0; var prevG = 0.0; var prevB = 0.0
      var motionSum = 0.0
      var frames = 0
      var w = 0; var h = 0
      def start(w: Int, h: Int): Unit = { this.w = w; this.h = h }
      def accept(x: Int, y: Int, r: Int, g: Int, bl: Int): Unit = {
        fr += r; fg += g; fb += bl
      }
      def frameEnd(): Unit = {
        val px = w.toLong * h
        val mr = fr.toDouble / px
        val mg = fg.toDouble / px
        val mb = fb.toDouble / px
        if (frames > 0)
          motionSum += (math.abs(mr - prevR) + math.abs(mg - prevG) +
            math.abs(mb - prevB)) / 3.0
        prevR = mr; prevG = mg; prevB = mb
        sr += fr; sg += fg; sb += fb
        fr = 0L; fg = 0L; fb = 0L
        frames += 1
      }
    }
    val dims = walkFrames(b, sink)
    if (dims == null) return null
    val (width, height, frames) = dims
    val total = width.toLong * height * frames
    InternalRow(frames, width, height,
      sink.sr.toDouble / total, sink.sg.toDouble / total,
      sink.sb.toDouble / total,
      if (frames > 1) sink.motionSum / (frames - 1) else 0.0)
  }
}
