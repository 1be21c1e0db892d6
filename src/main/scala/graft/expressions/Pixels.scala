package graft.expressions

import java.io.ByteArrayInputStream

/** Shared, validated pixel walks for the media expressions — ONE copy of
  * the 24bpp-BMP byte loop and of the JDK-reader (`javax.imageio`) row
  * loop, parameterized by a per-pixel sink. [[ImageFeatures]] folds
  * channel means through it, [[ImageEmbedding]] folds histograms,
  * [[DecodeImage]] routes between the two walks. The sink is a trait
  * (not a Function3) so the per-pixel call stays unboxed. */
private[graft] object Pixels {

  trait Sink { def accept(r: Int, g: Int, b: Int): Unit }

  /** Positional sink: `start` fires once with the validated dimensions
    * BEFORE any pixel, `accept` gets LOGICAL coordinates (y = 0 is the
    * top row regardless of the container's storage order). Used by the
    * perceptual-hash grid fold ([[ImageHash]]), which needs to know
    * which downscale cell a pixel lands in. */
  trait PosSink {
    def start(w: Int, h: Int): Unit
    def accept(x: Int, y: Int, r: Int, g: Int, b: Int): Unit
  }

  /** ImageIO must run headless and never spill codec temp files on an
    * executor; idempotent, triggered by this object's first use (callers
    * that need it without walking, e.g. [[ResizeImage]], call this). */
  def ensureInit(): Unit = Init

  private object Init {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Adapter for the order-independent folds (means, histograms): the
    * positional walk drives them with (x, y) discarded, keeping ONE
    * copy of each validation + pixel loop. */
  private final class DropPos(sink: Sink) extends PosSink {
    def start(w: Int, h: Int): Unit = ()
    def accept(x: Int, y: Int, r: Int, g: Int, b: Int): Unit =
      sink.accept(r, g, b)
  }

  /** Walk every pixel of an uncompressed 24bpp BI_RGB BMP
    * (BITMAPINFOHEADER or later — the legacy BITMAPCOREHEADER has its
    * fields at different offsets and belongs to the JDK reader).
    * Returns (width, height), or null when the bytes are not that
    * format (nothing fed to the sink in that case: all validation
    * happens before the loop). Delegates to [[walkBmp24Pos]] — the
    * single copy of the validation and byte loop. */
  def walkBmp24(b: Array[Byte], sink: Sink): (Int, Int) =
    walkBmp24Pos(b, new DropPos(sink))

  /** [[walkBmp24]] with logical positions: same header validation and
    * byte loop, but the sink learns (w, h) up front and every pixel
    * carries its LOGICAL (x, y) — bottom-up storage (positive height)
    * is flipped to top-down coordinates, top-down storage (negative
    * height) passes through. Returns (width, height) or null exactly
    * like [[walkBmp24]]. */
  def walkBmp24Pos(b: Array[Byte], sink: PosSink): (Int, Int) = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Int =
      u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    if (n < 54 || u(0) != 'B' || u(1) != 'M') return null
    if (le32(14) < 40) return null // core header: different field layout
    val pixOff = le32(10)
    val width = le32(18)
    val heightRaw = le32(22)           // negative = top-down
    val topDown = heightRaw < 0
    val height = if (topDown) -heightRaw else heightRaw
    val bpp = le16(28)
    val compression = le32(30)
    if (bpp != 24 || compression != 0) return null
    if (width <= 0 || height <= 0 || width > (1 << 20) ||
        height > (1 << 20)) return null
    val rowBytes = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    if (pixOff < 0 || pixOff.toLong + rowBytes.toLong * height > n)
      return null
    sink.start(width, height)
    var row = 0
    while (row < height) {
      var p = pixOff + row * rowBytes
      val y = if (topDown) row else height - 1 - row
      var col = 0
      while (col < width) {            // BGR order on disk
        sink.accept(col, y, u(p + 2), u(p + 1), u(p))
        p += 3; col += 1
      }
      row += 1
    }
    (width, height)
  }

  /** [[walkImageIO]] with logical positions for [[PosSink]] consumers —
    * the JDK readers already deliver rows top-down. Same null contract. */
  def walkImageIOPos(b: Array[Byte], sink: PosSink): (Int, Int) = {
    try {
      val img = readCapped(b) // header-only dims gate before allocation
      if (img == null) return null
      val w = img.getWidth
      val h = img.getHeight
      sink.start(w, h)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          sink.accept(x, y, (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h)
    } catch {
      case e: InterruptedException => throw e
      case _: Throwable => null
    }
  }

  /** Max side accepted from a header before any raster is allocated. */
  private val MaxSide = 1 << 20
  /** Max total pixels a decode may allocate (TYPE_INT_RGB rasters run
    * 4 bytes/pixel → ≤ 256 MiB), so a ~100-byte header declaring e.g.
    * 46000×46000 can never OOM an executor — the poison-row contract
    * the FLAC `maxDecoded` and Gunzip caps already enforce. */
  private val MaxPixels = 1L << 26

  /** Decode via the JDK readers with the dims checked HEADER-ONLY first
    * (`ImageReader.getWidth/getHeight` parse metadata without touching
    * pixel data): null when no reader matches or the declared raster
    * exceeds [[MaxSide]]/[[MaxPixels]] — the allocation never happens. */
  private[graft] def readCapped(b: Array[Byte]): java.awt.image.BufferedImage = {
    ensureInit()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val r = readers.next()
      try {
        r.setInput(iis)
        val w = r.getWidth(0)
        val h = r.getHeight(0)
        if (w <= 0 || h <= 0 || w > MaxSide || h > MaxSide ||
            w.toLong * h > MaxPixels) return null
        r.read(0)
      } finally r.dispose()
    } finally iis.close()
  }

  /** Frame count of a multi-frame container via the JDK reader's
    * full-scan count (works for any multi-image format the JDK reads;
    * [[graft.pipeline.Multimodal]] currently routes only GIF here);
    * -1 when no reader recognizes the bytes or counting fails. */
  def frameCount(b: Array[Byte]): Int = {
    ensureInit()
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return -1
        val r = readers.next()
        try { r.setInput(iis); r.getNumImages(true) } finally r.dispose()
      } finally iis.close()
    } catch {
      case e: InterruptedException => throw e
      case _: Throwable => -1 // incl. OOM from a pathological reader
    }
  }

  /** Walk every pixel of any JDK-readable image (PNG/JPEG/GIF/TIFF/BMP
    * variants) row by row through a reused one-row buffer — peak extra
    * memory O(width) on top of the decoded raster. Returns
    * (width, height), or null when no reader recognizes the bytes or
    * the decode throws (corrupt/truncated input degrades, the sink may
    * have seen a partial image only if the reader itself threw
    * mid-raster — callers treat null as "discard everything"). */
  def walkImageIO(b: Array[Byte], sink: Sink): (Int, Int) =
    walkImageIOPos(b, new DropPos(sink))
}
