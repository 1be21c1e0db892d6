package graft

import org.apache.spark.sql.{functions => F}

import graft.expressions.{ImageHash, VideoHash}
import graft.pipeline.Dedup

/** Perceptual video hashing ([[graft.expressions.VideoHash]]) — the
  * fourth near-dup modality: cross-modal grid parity with ImageHash on
  * a single-frame clip, frame-rate invariance, brightness locality,
  * banded pair detection, and the undecodable contract. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** pixels(y)(x) = (r,g,b), y = 0 at the TOP (display order). */
  private def avi(w: Int, h: Int,
      frames: Seq[Seq[Seq[(Int, Int, Int)]]]): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val movi = frames.flatMap { px =>
      val raster = (h - 1 to 0 by -1).flatMap { y => // bottom-up on disk
        px(y).flatMap { case (r, g, b) =>
          Seq(b.toByte, g.toByte, r.toByte)
        } ++ Seq.fill(rowBytes - w * 3)(0.toByte)
      }.toArray
      "00db".getBytes("US-ASCII") ++ le32(raster.length) ++ raster
    }.toArray
    val avih = "avih".getBytes("US-ASCII") ++ le32(56) ++
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill[Byte](16)(0)
    val hdrl = "LIST".getBytes("US-ASCII") ++ le32(4 + avih.length) ++
      "hdrl".getBytes("US-ASCII") ++ avih
    val moviL = "LIST".getBytes("US-ASCII") ++ le32(4 + movi.length) ++
      "movi".getBytes("US-ASCII") ++ movi
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ moviL
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** The same display-order pixels as a 24bpp bottom-up BMP. */
  private def bmp(w: Int, h: Int, px: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val raster = (h - 1 to 0 by -1).flatMap { y =>
      px(y).flatMap { case (r, g, b) => Seq(b.toByte, g.toByte, r.toByte) } ++
        Seq.fill(rowBytes - w * 3)(0.toByte)
    }.toArray
    "BM".getBytes("US-ASCII") ++ le32(54 + raster.length) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(raster.length) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ raster
  }

  private def pattern(seed: Int, w: Int, h: Int): Seq[Seq[(Int, Int, Int)]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(h)(Seq.fill(w)((rnd.nextInt(256), rnd.nextInt(256),
      rnd.nextInt(256))))
  }

  test("single-frame clip hashes exactly like the same image's dHash") {
    val px = pattern(5, 18, 16)
    val vh = VideoHash.hash(avi(18, 16, Seq(px)))
    val ih = ImageHash.hash(bmp(18, 16, px), dhash = true)
    assert(vh != null && ih != null)
    assert(vh === ih,
      "video grid/luma/orientation must match the image hash conventions")
  }

  test("frame-rate invariance: duplicated frames change nothing") {
    val a = pattern(9, 20, 12)
    val b = pattern(10, 20, 12)
    val once = VideoHash.hash(avi(20, 12, Seq(a, b)))
    val doubled = VideoHash.hash(avi(20, 12, Seq(a, a, b, b)))
    assert(once === doubled)
  }

  test("brightness scaling moves the hash only a few bits") {
    val px = pattern(11, 24, 16)
    val dim = px.map(_.map { case (r, g, b) => (r / 2, g / 2, b / 2) })
    val h1 = VideoHash.hash(avi(24, 16, Seq(px, px)))
    val h2 = VideoHash.hash(avi(24, 16, Seq(dim, dim)))
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 4)
  }

  test("videoNearDupPairs: same footage at different frame rates pairs up") {
    val a = pattern(1, 18, 16)
    val b = pattern(2, 18, 16)
    val clips = Seq(
      (1L, avi(18, 16, Seq(a, b))),
      (2L, avi(18, 16, Seq(a, a, b, b))),       // re-timed copy
      (3L, avi(18, 16, Seq(pattern(42, 18, 16)))), // unrelated
      (4L, "not a video".getBytes))             // undecodable → dropped
      .toDF("doc_id", "media")
    val pairs = Dedup.videoNearDupPairs(clips, "doc_id", "media", maxBits = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("contracts: undecodable, sub-grid, SQL registration") {
    assert(VideoHash.hash("junk".getBytes) === null)
    assert(VideoHash.hash(null) === null)
    // 4x4 clip is below the 9x8 grid
    assert(VideoHash.hash(avi(4, 4, Seq(pattern(3, 4, 4)))) === null)
    val d = avi(18, 16, Seq(pattern(5, 18, 16)))
    Seq(Tuple1(d)).toDF("b").createOrReplaceTempView("vh_in")
    assert(spark.sql("SELECT video_hash(b) FROM vh_in").head().getLong(0) ===
      VideoHash.hash(d).longValue())
  }
}
