package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{functions => F}

import graft.expressions.{Unlz4, Unsnappy}
import graft.pipeline.Multimodal

/** LZ4 frame and raw-snappy-block decompression
  * ([[graft.expressions.Unlz4]], [[graft.expressions.Unsnappy]]):
  * real-codec round trips, the hand-built uncompressed-block frame the
  * SQL oracle synthesizes, corruption/truncation NULLs, the pre-alloc
  * snappy bomb check, and SQL registration. */
class Lz4SnappySpec extends SparkSpec {
  import spark.implicits._

  private def lz4Frame(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  test("lz4 round trip through the real codec, incl. concatenated frames") {
    val text = ("doc body " * 300).getBytes("UTF-8")
    assert(Unlz4.decompress(lz4Frame(text)).toSeq === text.toSeq)
    val two = lz4Frame("first.".getBytes) ++ lz4Frame("second.".getBytes)
    assert(new String(Unlz4.decompress(two), "UTF-8") === "first.second.")
    assert(Unlz4.decompress(lz4Frame(Array.emptyByteArray)).length === 0)
  }

  /** The exact byte layout the q_unlz4 oracle synthesizes in SQL: magic,
    * FLG 0x60 (v01, block-independent, no checksums), BD 0x40 (64 KiB),
    * header-checksum byte, one UNCOMPRESSED block (high bit of the size
    * word), end mark. The HC byte is (xxh32(FLG||BD, 0) >> 8) & 0xff —
    * computed here with the codec's own xxhash so the constant the SQL
    * side embeds is pinned against the real thing. */
  test("hand-built uncompressed-block frame decodes; HC constant pinned") {
    val flgBd = Array[Byte](0x60.toByte, 0x40.toByte)
    val hc = ((net.jpountz.xxhash.XXHashFactory.fastestInstance()
      .hash32().hash(flgBd, 0, 2, 0) >> 8) & 0xff).toByte
    assert((hc & 0xff) === 0x82, "oracle embeds HC=0x82 for FLG=60 BD=40")
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val payload = "payload 123".getBytes("UTF-8")
    val frame = Array[Byte](0x04, 0x22, 0x4d, 0x18) ++ flgBd ++ Array(hc) ++
      le32(payload.length | 0x80000000) ++ payload ++ le32(0)
    assert(new String(Unlz4.decompress(frame), "UTF-8") === "payload 123")
    // wrong HC must NOT silently decode
    val bad = frame.clone(); bad(6) = (bad(6) ^ 0x5a).toByte
    assert(Unlz4.decompress(bad) === null)
  }

  test("lz4: non-frame bytes, corruption, truncation -> NULL") {
    assert(Unlz4.decompress(null) === null)
    assert(Unlz4.decompress("not lz4 at all".getBytes) === null)
    val good = lz4Frame(("x" * 5000).getBytes)
    assert(Unlz4.decompress(good.dropRight(7)) === null)
    val flip = good.clone(); flip(good.length / 2) =
      (flip(good.length / 2) ^ 0x41).toByte
    // content-checksum-free frames may or may not detect a mid-block
    // flip as a format error; it must never throw
    Unlz4.decompress(flip)
    // trailing garbage after the last frame -> error (strict, like gunzip)
    assert(Unlz4.decompress(good ++ Array[Byte](1, 2, 3)) === null)
  }

  test("snappy round trip; declared length is verified") {
    val text = ("snappy block " * 200).getBytes("UTF-8")
    val block = org.xerial.snappy.Snappy.compress(text)
    assert(Unsnappy.decompress(block).toSeq === text.toSeq)
    // the tiny-literal shape the SQL oracle builds: len byte, tag
    // (len-1)<<2, raw bytes
    val lit = "hi there".getBytes("UTF-8")
    val raw = Array[Byte](lit.length.toByte, ((lit.length - 1) << 2).toByte) ++
      lit
    assert(new String(Unsnappy.decompress(raw), "UTF-8") === "hi there")
  }

  test("snappy: bombs refused before allocation; corrupt -> NULL") {
    // declared length 2^40 in 6 varint bytes; no body — must return
    // null fast without trying to allocate a terabyte
    val bomb = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x80.toByte, 0x40, 0x00)
    assert(Unsnappy.decompress(bomb) === null)
    assert(Unsnappy.decompress(null) === null)
    assert(Unsnappy.decompress(Array[Byte](5, 16, 'a')) === null) // short body
    val good = org.xerial.snappy.Snappy.compress("abcdef" * 50)
    assert(Unsnappy.decompress(good.dropRight(3)) === null)
  }

  test("SQL registration + column wrappers") {
    val lz = lz4Frame("from sql".getBytes("UTF-8"))
    val sn = org.xerial.snappy.Snappy.compress("from sql too")
    val df = Seq((lz, sn)).toDF("a", "b")
    df.createOrReplaceTempView("lz4_in")
    val viaSql = spark.sql(
      """SELECT cast(unlz4(a) AS STRING), cast(unsnappy(b) AS STRING)
         FROM lz4_in""").as[(String, String)].head()
    assert(viaSql === ("from sql", "from sql too"))
    val viaCol = df.select(
      Multimodal.unlz4(F.col("a")).cast("string"),
      Multimodal.unsnappy(F.col("b")).cast("string"))
      .as[(String, String)].head()
    assert(viaCol === ("from sql", "from sql too"))
  }
}
