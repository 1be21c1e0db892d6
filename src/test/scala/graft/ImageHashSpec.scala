package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.ImageHash
import graft.pipeline.{Dedup, Multimodal}

/** Perceptual image hash ([[graft.expressions.ImageHash]]) and the
  * banded near-dup pairs built on it: exact-arithmetic parity against an
  * independent local reference, format-independence (BMP bottom-up /
  * top-down / PNG of the same pixels hash identically), the null
  * contract, near/far Hamming behavior under pixel perturbation, and
  * [[Dedup.imageNearDupPairs]] == brute-force all-pairs truth. */
class ImageHashSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  // --- local fixtures ----------------------------------------------------

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)

  /** 24bpp BI_RGB BMP from TOP-down pixel rows of (r,g,b). */
  private def bmp(pixels: Array[Array[(Int, Int, Int)]],
      topDown: Boolean = false): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val stride = (w * 3 + 3) & ~3
    val rowsOnDisk = if (topDown) pixels else pixels.reverse
    val pix = rowsOnDisk.flatMap { row =>
      row.flatMap { case (r, g, b) =>
        Array[Byte](b.toByte, g.toByte, r.toByte) } ++
        Array.fill[Byte](stride - w * 3)(0)
    }
    "BM".getBytes("US-ASCII") ++ le32(54 + pix.length) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(pix.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ pix
  }

  private def png(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def randPixels(w: Int, h: Int): Array[Array[(Int, Int, Int)]] =
    Array.fill(h)(Array.fill(w)(
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))))

  /** Independent reference: same contract as the scaladoc states, written
    * directly from the definition (no shared code with the expression). */
  private def refHash(pixels: Array[Array[(Int, Int, Int)]],
      dhash: Boolean): Long = {
    val h = pixels.length; val w = pixels.head.length
    val gw = if (dhash) 9 else 8; val gh = 8
    val sums = Array.fill(gh, gw)(0L)
    val cnts = Array.fill(gh, gw)(0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      val gray = (77 * r + 151 * g + 28 * b) >> 8
      sums(y * gh / h)(x * gw / w) += gray
      cnts(y * gh / h)(x * gw / w) += 1
    }
    var bits = 0L
    if (dhash) {
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (sums(cy)(cx) * cnts(cy)(cx + 1) >
            sums(cy)(cx + 1) * cnts(cy)(cx))
          bits |= 1L << (cy * 8 + cx)
    } else {
      val total = sums.map(_.sum).sum
      val totalPix = cnts.map(_.sum).sum
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (sums(cy)(cx) * totalPix > total * cnts(cy)(cx))
          bits |= 1L << (cy * 8 + cx)
    }
    bits
  }

  // --- expression semantics ----------------------------------------------

  test("native hash equals the independent reference on random images") {
    for (_ <- 1 to 30) {
      // w >= 9: dHash needs the 9-wide grid (w = 8 is its documented
      // null case, covered by the sub-grid test below)
      val w = 9 + rnd.nextInt(39)
      val h = 8 + rnd.nextInt(40)
      val px = randPixels(w, h)
      val bytes = bmp(px)
      assert(ImageHash.hash(bytes, dhash = false) == refHash(px, false))
      assert(ImageHash.hash(bytes, dhash = true) == refHash(px, true))
    }
  }

  test("BMP bottom-up, BMP top-down, and PNG of the same pixels agree") {
    for (_ <- 1 to 10) {
      val px = randPixels(9 + rnd.nextInt(20), 8 + rnd.nextInt(20))
      for (dh <- Seq(false, true)) {
        val viaBmp = ImageHash.hash(bmp(px), dh)
        assert(ImageHash.hash(bmp(px, topDown = true), dh) == viaBmp)
        assert(ImageHash.hash(png(px), dh) == viaBmp) // JDK-reader path
      }
    }
  }

  test("undecodable and sub-grid inputs hash to null") {
    assert(ImageHash.hash("not an image".getBytes, dhash = false) == null)
    assert(ImageHash.hash(Array.emptyByteArray, dhash = true) == null)
    // a 4×4 tracking pixel has no 8×8 signal — must NOT cluster
    assert(ImageHash.hash(bmp(randPixels(4, 4)), dhash = false) == null)
    assert(ImageHash.hash(bmp(randPixels(8, 4)), dhash = true) == null)
    // dHash needs 9 columns; 8×8 is sub-grid for it but fine for aHash
    val px8 = randPixels(8, 8)
    assert(ImageHash.hash(bmp(px8), dhash = true) == null)
    assert(ImageHash.hash(bmp(px8), dhash = false) != null)
  }

  test("small perturbations stay near, different images land far") {
    val base = randPixels(32, 32)
    val tweaked = base.map(_.clone())
    // brighten one 4×4 corner block slightly
    for (y <- 0 until 4; x <- 0 until 4) {
      val (r, g, b) = tweaked(y)(x)
      tweaked(y)(x) = ((r + 8) min 255, (g + 8) min 255, (b + 8) min 255)
    }
    val other = randPixels(32, 32)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (dh <- Seq(false, true)) {
      val hBase = ImageHash.hash(bmp(base), dh)
      assert(ham(hBase, ImageHash.hash(bmp(tweaked), dh)) <= 6)
      assert(ham(hBase, ImageHash.hash(bmp(other), dh)) >= 16)
    }
  }

  // --- Spark integration -------------------------------------------------

  test("imageNearDupPairs equals brute-force all-pairs ground truth") {
    import spark.implicits._
    // 8 clusters of 8 images: same base pattern per cluster, per-member
    // noise on a few pixels -> near within clusters, far across them
    val rows = (0L until 64L).map { id =>
      val cluster = (id % 8).toInt
      val member = (id / 8).toInt
      val cr = new scala.util.Random(cluster) // cluster-determined base
      val px = Array.fill(16)(Array.fill(18)(
        (cr.nextInt(256), cr.nextInt(256), cr.nextInt(256))))
      for (k <- 0 until member) { // member-determined small edits
        val (r, g, b) = px(k % 16)(k % 18)
        px(k % 16)(k % 18) = ((r + 40) % 256, (g + 40) % 256, b)
      }
      (id, bmp(px))
    }
    val df = rows.toDF("doc_id", "media")
    val got = Dedup.imageNearDupPairs(df, "doc_id", "media", "dhash",
        maxBits = 8, maxBucket = 256)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val hashes = rows.map { case (id, bytes) =>
      id -> ImageHash.hash(bytes, dhash = true).longValue
    }
    val want = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 8
    } yield (i1, i2, d)).toSet
    assert(want.nonEmpty) // the fixture really plants near pairs
    assert(got == want)
    // corrupt rows drop out instead of clustering into a null bucket
    val withJunk = df.union(Seq((100L, "junk".getBytes),
      (101L, "junk".getBytes)).toDF("doc_id", "media"))
    val got2 = Dedup.imageNearDupPairs(withJunk, "doc_id", "media", "dhash",
        maxBits = 8, maxBucket = 256)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(got2 == want)
  }

  test("imageDedup keeps one representative per cluster plus the rest") {
    import spark.implicits._
    // three exact-copy clusters of 4 + two loners + one corrupt row
    val rows = (0L until 12L).map { id =>
      val cr = new scala.util.Random((id % 3).toInt)
      (id, bmp(Array.fill(16)(Array.fill(18)(
        (cr.nextInt(256), cr.nextInt(256), cr.nextInt(256))))))
    } ++ Seq(
      (20L, bmp(randPixels(18, 16))),
      (21L, bmp(randPixels(18, 16))),
      (30L, "not an image".getBytes.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("doc_id", "media")
    val kept = Dedup.imageDedup(df, "doc_id", "media", "dhash", maxBits = 3)
      .select("doc_id").as[Long].collect().toSet
    // cluster minima 0,1,2 survive; loners and the undecodable row stay
    assert(kept == Set(0L, 1L, 2L, 20L, 21L, 30L))
  }

  test("imageDedupAgainstSeen keeps only images new to the corpus") {
    import spark.implicits._
    def img(seed: Int) = bmp({
      val cr = new scala.util.Random(seed)
      Array.fill(16)(Array.fill(18)(
        (cr.nextInt(256), cr.nextInt(256), cr.nextInt(256))))
    })
    val seen = Seq((100L, img(1)), (101L, img(2))).toDF("doc_id", "media")
    val incoming = Seq(
      (1L, img(1)),                  // already in the corpus
      (2L, img(7)),                  // genuinely new
      (3L, img(2)),                  // already in the corpus
      (4L, "junk".getBytes)          // undecodable: kept
    ).toDF("doc_id", "media")
    val kept = Dedup.imageDedupAgainstSeen(incoming, seen,
        "doc_id", "media", "dhash", maxBits = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
    // and the pair list itself is cross-corpus only, with true ids
    def hasher(df: org.apache.spark.sql.DataFrame) =
      df.select(F.col("doc_id").as("rid"),
          graft.pipeline.Multimodal.imageHash(F.col("media"), "dhash")
            .as("sh"))
        .where(F.col("sh").isNotNull)
    val pairs = Dedup.hammingPairsAgainstSeen(incoming, seen, hasher, 3)
      .select("incoming_id", "seen_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 100L), (3L, 101L)))
  }

  test("SQL function image_hash is registered and matches the API") {
    import spark.implicits._
    val px = randPixels(12, 10)
    val df = Seq(Tuple1(bmp(px))).toDF("media")
    df.createOrReplaceTempView("imghash_t")
    val viaSql = spark.sql(
      """SELECT image_hash(media, 'ahash') AS a,
                image_hash(media, 'dhash') AS d FROM imghash_t""")
      .as[(Long, Long)].head()
    assert(viaSql == (refHash(px, false), refHash(px, true)))
    val viaApi = df.select(
        Multimodal.imageHash(F.col("media"), "ahash"),
        Multimodal.imageHash(F.col("media"), "dhash"))
      .as[(Long, Long)].head()
    assert(viaApi == viaSql)
    // bad kind is rejected loudly, not silently defaulted
    intercept[Exception] {
      spark.sql("SELECT image_hash(media, 'phash') FROM imghash_t").collect()
    }
  }
}
