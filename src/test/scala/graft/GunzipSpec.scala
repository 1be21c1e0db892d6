package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.{Multimodal, TextAnalysis}

/** Per-row gzip decompression: JDK round trips, multi-member streams,
  * corruption/truncation degradation, the zip-bomb cap, and the
  * gunzip → html_text crawl-ingestion composition. */
class GunzipSpec extends SparkSpec {

  private def gz(data: Array[Byte]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(baos)
    out.write(data); out.close()
    baos.toByteArray
  }

  test("round-trips arbitrary bytes, including multi-member streams") {
    import spark.implicits._
    val text = "crawl record body, compressed at rest".getBytes("UTF-8")
    val rnd = new scala.util.Random(5)
    val blob = new Array[Byte](4096)
    rnd.nextBytes(blob)
    val multi = gz("first member ".getBytes("UTF-8")) ++
      gz("second member".getBytes("UTF-8"))
    val rows = Seq((1L, gz(text)), (2L, gz(blob)), (3L, multi))
      .toDF("id", "content")
      .select(F.col("id"), Multimodal.gunzip(F.col("content")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(rows(1L), text))
    assert(java.util.Arrays.equals(rows(2L), blob))
    assert(new String(rows(3L), "UTF-8") == "first member second member")
  }

  test("corrupt, truncated, non-gzip, and bomb inputs degrade to NULL") {
    import spark.implicits._
    val good = gz("some body".getBytes("UTF-8"))
    val badCrc = good.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x55).toByte
    // ~20 KiB member inflating to 20 MiB of zeros: ratio ≈ 1000× must
    // trip the 256× cap
    val bomb = gz(new Array[Byte](20 << 20))
    assert(bomb.length < (64 << 10))
    val rows = Seq(
      (1L, badCrc),
      (2L, good.take(good.length / 2)),
      (3L, "not gzip at all".getBytes("UTF-8")),
      (4L, bomb))
      .toDF("id", "content")
      .select(F.col("id"), Multimodal.gunzip(F.col("content")).as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows.values.forall(_.isEmpty))
  }

  test("undecodable bytes after a valid member degrade to NULL, not truncation") {
    // GZIPInputStream silently treats unparseable trailing bytes as EOF
    // and would return the first member's bytes — a silent truncation.
    // The strict member walk must return NULL for the whole row instead.
    import spark.implicits._
    val good = gz("first member".getBytes("UTF-8"))
    val garbageTail = good ++ "NOT A MEMBER".getBytes("UTF-8")
    val corruptSecond = {
      val second = gz("second member".getBytes("UTF-8"))
      second(12) = (second(12) ^ 0x7f).toByte // damage the deflate body
      good ++ second
    }
    val truncatedSecond = good ++ gz("second".getBytes("UTF-8")).take(9)
    val rows = Seq((1L, garbageTail), (2L, corruptSecond),
        (3L, truncatedSecond), (4L, good))
      .toDF("id", "content")
      .select(F.col("id"), Multimodal.gunzip(F.col("content")).as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty && rows(3L).isEmpty)
    assert(new String(rows(4L).get.asInstanceOf[Array[Byte]], "UTF-8") ==
      "first member")
  }

  test("gunzip -> html_text unwraps a compressed crawl page") {
    import spark.implicits._
    val page = "<html><body><h1>Hi</h1><p>a &amp; b</p></body></html>"
    val got = Seq(Tuple1(gz(page.getBytes("UTF-8")))).toDF("content")
      .select(TextAnalysis.htmlText(
        F.decode(Multimodal.gunzip(F.col("content")), "UTF-8")).as("t"))
      .collect().head.getString(0)
    assert(got == "Hi\na & b")
  }

  test("SQL function gunzip is registered") {
    val got = spark.sql(
      "SELECT decode(gunzip(unhex('" +
        gz("sql".getBytes("UTF-8")).map("%02X".format(_)).mkString +
        "')), 'UTF-8') AS t").collect().head.getString(0)
    assert(got == "sql")
  }
}
