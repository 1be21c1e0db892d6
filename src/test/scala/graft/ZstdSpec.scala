package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.{Multimodal, TextAnalysis}

/** Per-row zstd decompression: library round trips, multi-frame
  * streams, corruption/truncation/bomb degradation, hand-built
  * raw-block frames, and the unzstd → html_text chain. */
class ZstdSpec extends SparkSpec {

  private def zstd(data: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, 3)

  /** Minimal RFC 8878 frame holding one raw (uncompressed) block —
    * the layout q_unzstd synthesizes in SQL. */
  private def rawFrame(data: Array[Byte]): Array[Byte] = {
    val header = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x00, // FHD: no content size, window descriptor follows
      0x00) // window descriptor: 1 KiB
    val v = (data.length << 3) | 1 // raw block, last
    header ++ Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte) ++
      data
  }

  test("round-trips arbitrary bytes, including multi-frame streams") {
    import spark.implicits._
    val text = "zstd-shipped dataset record".getBytes("UTF-8")
    val rnd = new scala.util.Random(9)
    val blob = new Array[Byte](4096)
    rnd.nextBytes(blob)
    val multi = zstd("first frame ".getBytes("UTF-8")) ++
      zstd("second frame".getBytes("UTF-8"))
    val rows = Seq((1L, zstd(text)), (2L, zstd(blob)), (3L, multi),
      (4L, rawFrame("raw block body".getBytes("UTF-8"))))
      .toDF("id", "content")
      .select(F.col("id"), Multimodal.unzstd(F.col("content")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(rows(1L), text))
    assert(java.util.Arrays.equals(rows(2L), blob))
    assert(new String(rows(3L), "UTF-8") == "first frame second frame")
    assert(new String(rows(4L), "UTF-8") == "raw block body")
  }

  test("corrupt, truncated, non-zstd, trailing-garbage, and bomb inputs are NULL") {
    import spark.implicits._
    // checksummed frame: a payload bit flip is then DETECTABLE (the
    // default no-checksum frame can decode a flip silently — inherent
    // to the format, not the decoder)
    val cctx = new com.github.luben.zstd.ZstdCompressCtx()
    cctx.setChecksum(true)
    cctx.setLevel(3)
    val good = cctx.compress("some compressed body".getBytes("UTF-8"))
    val flipped = good.clone()
    flipped(good.length - 6) = (flipped(good.length - 6) ^ 0x7f).toByte
    // ~a few KiB compressing 20 MiB of zeros: ratio >> 256 trips the cap
    val bomb = zstd(new Array[Byte](20 << 20))
    assert(bomb.length < (64 << 10))
    val rows = Seq(
      (1L, flipped),
      (2L, good.take(good.length / 2)),
      (3L, "not zstd at all".getBytes("UTF-8")),
      (4L, good ++ "garbage tail".getBytes("UTF-8")),
      (5L, Array.empty[Byte]),
      (6L, bomb))
      .toDF("id", "content")
      .select(F.col("id"), Multimodal.unzstd(F.col("content")).as("b"))
      .collect()
    val alive = rows.filterNot(_.isNullAt(1)).map(_.getLong(0))
    assert(alive.isEmpty, s"rows not degraded: ${alive.mkString(",")}")
  }

  test("unzstd -> html_text chains for .zst crawl ingestion") {
    import spark.implicits._
    val page = "<html><body><p>compressed &amp; recovered</p></body></html>"
    val got = Seq(Tuple1(zstd(page.getBytes("UTF-8")))).toDF("content")
      .select(TextAnalysis.htmlText(
        F.decode(Multimodal.unzstd(F.col("content")), "UTF-8")).as("text"))
      .collect()(0).getString(0)
    assert(got == "compressed & recovered")
  }
}
