package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.ZipOps
import graft.pipeline.Multimodal

/** ZIP triage + entry extraction ([[graft.expressions.ZipOps]]):
  * real archives written by the JDK (streaming deflate AND stored),
  * central-directory listing, extraction parity, corruption/missing
  * contracts, SQL registration. */
class ZipSpec extends SparkSpec {
  import spark.implicits._

  private def mkZip(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    for ((name, data, stored) <- entries) {
      val e = new ZipEntry(name)
      if (stored) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(data.length)
        e.setCompressedSize(data.length)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e)
      z.write(data)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val docXml =
    "<w:document><w:body><w:p>Quarterly results</w:p></w:body></w:document>"
  private lazy val archive = mkZip(Seq(
    ("word/document.xml", docXml.getBytes("UTF-8"), false), // deflated
    ("media/logo.bin", Array.tabulate[Byte](500)(_.toByte), true), // stored
    ("[Content_Types].xml", "<Types/>".getBytes("UTF-8"), false)))

  private def list(b: Array[Byte]): Seq[(String, Int, Long)] = {
    val a = ZipOps.entries(b)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(3))
    }
  }

  test("entries: JDK streaming archive lists with true sizes and methods") {
    val es = list(archive)
    assert(es.map(_._1) === Seq("word/document.xml", "media/logo.bin",
      "[Content_Types].xml"))
    val byName = es.map(e => e._1 -> e).toMap
    assert(byName("word/document.xml")._2 === 8) // deflate
    assert(byName("word/document.xml")._3 === docXml.length.toLong)
    assert(byName("media/logo.bin")._2 === 0)    // stored
    assert(byName("media/logo.bin")._3 === 500L)
  }

  test("entry extraction: deflate and stored round-trip byte-exactly") {
    assert(new String(ZipOps.entryBytes(archive, "word/document.xml"),
      "UTF-8") === docXml)
    assert(ZipOps.entryBytes(archive, "media/logo.bin").toSeq ===
      Array.tabulate[Byte](500)(_.toByte).toSeq)
    assert(ZipOps.entryBytes(archive, "missing.txt") === null)
  }

  test("contracts: non-zip, truncation, null") {
    assert(ZipOps.entries("not a zip at all".getBytes) === null)
    assert(ZipOps.entries(null) === null)
    // chop off the central directory: no EOCD → null (not a guess)
    assert(ZipOps.entries(archive.dropRight(60)) === null)
    // corrupt the deflate stream: extraction nulls, listing still works
    val broken = archive.clone()
    val dataStart = 30 + "word/document.xml".length
    for (i <- dataStart until dataStart + 8) broken(i) = 0x55
    assert(list(broken).size === 3)
    assert(ZipOps.entryBytes(broken, "word/document.xml") === null)
  }

  test("the docx chain: zip_entry -> html_text strips the XML to text") {
    val text = Seq(Tuple1(archive)).toDF("b")
      .select(graft.pipeline.TextAnalysis.htmlText(
        F.decode(Multimodal.zipEntry(F.col("b"),
          F.lit("word/document.xml")), "UTF-8")))
      .as[String].head()
    assert(text === "Quarterly results")
    // SQL registration
    Seq(Tuple1(archive)).toDF("b").createOrReplaceTempView("zip_in")
    val viaSql = spark.sql(
      """SELECT size(zip_entries(b)),
           CAST(zip_entry(b, 'media/logo.bin') IS NOT NULL AS INT)
         FROM zip_in""").head()
    assert(viaSql.getInt(0) === 3 && viaSql.getInt(1) === 1)
  }
}
