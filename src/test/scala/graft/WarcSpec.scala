package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.TextAnalysis
import graft.sources.Warc

/** WARC (ISO 28500) ingestion: the `warc_records` splitter, the
  * `http_message` response parser (incl. chunked transfer framing),
  * the whole-file and constant-memory streamed readers, and the
  * records → pages → html_text crawl chain. */
class WarcSpec extends SparkSpec {

  // ---- fixture builders ------------------------------------------------

  private def rec(typ: String, uri: String, payload: Array[Byte],
      date: String = "2024-01-02T03:04:05Z",
      id: String = "<urn:uuid:1>",
      contentType: String = "application/http;msgtype=response"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(typ).append("\r\n")
    if (uri != null) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    sb.append("WARC-Record-ID: ").append(id).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    sb.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def http(status: Int, body: String,
      contentType: String = "text/html",
      extraHeaders: String = ""): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      extraHeaders + s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n" +
      body).getBytes("UTF-8")

  private def gz(data: Array[Byte]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(baos)
    out.write(data); out.close()
    baos.toByteArray
  }

  private def parseRecords(b: Array[Byte]) = {
    import spark.implicits._
    Seq(Tuple1(b)).toDF("content")
      .select(F.explode(Warc.records(F.col("content"))).as("r"))
      .select("r.warc_type", "r.target_uri", "r.date", "r.record_id",
        "r.content_type", "r.payload")
      .collect()
  }

  // ---- warc_records ----------------------------------------------------

  test("warc_records splits a multi-record segment with exact fields") {
    val seg = rec("warcinfo", null, "software: test\r\n".getBytes("UTF-8"),
        contentType = "application/warc-fields") ++
      rec("request", "http://a.example/x", "GET /x HTTP/1.1\r\n\r\n".getBytes("UTF-8")) ++
      rec("response", "http://a.example/x", http(200, "hello body"))
    val rows = parseRecords(seg)
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "warcinfo")
    assert(rows(0).isNullAt(1)) // warcinfo has no target URI
    assert(rows(1).getString(0) == "request")
    assert(rows(1).getString(1) == "http://a.example/x")
    assert(rows(2).getString(0) == "response")
    assert(rows(2).getString(2) == "2024-01-02T03:04:05Z")
    assert(rows(2).getString(3) == "<urn:uuid:1>")
    assert(rows(2).getString(4) == "application/http;msgtype=response")
    val payload = new String(rows(2).getAs[Array[Byte]](5), "UTF-8")
    assert(payload.startsWith("HTTP/1.1 200 OK") && payload.endsWith("hello body"))
  }

  test("warc_records keeps binary payloads byte-exact") {
    val rnd = new scala.util.Random(7)
    val blob = new Array[Byte](2048)
    rnd.nextBytes(blob)
    val rows = parseRecords(rec("resource", "http://b.example/img", blob,
      contentType = "image/png"))
    assert(rows.length == 1)
    assert(java.util.Arrays.equals(rows(0).getAs[Array[Byte]](5), blob))
  }

  test("truncation mid-record keeps the complete prefix; junk is NULL") {
    import spark.implicits._
    val good = rec("response", "http://a/1", http(200, "one")) ++
      rec("response", "http://a/2", http(200, "two"))
    val truncated = good.take(good.length - 40) // cuts record 2's payload
    val rows = parseRecords(truncated)
    assert(rows.length == 1 && rows(0).getString(1) == "http://a/1")
    // junk and empty inputs → NULL array (not empty, not a throw)
    val nulls = Seq(
      (1L, "plain text, no WARC here".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, "WARC/1.0\r\nContent-Length: oops\r\n\r\n".getBytes("UTF-8")))
      .toDF("id", "content")
      .select(Warc.records(F.col("content")).as("r"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("folded header continuation lines append to the previous field") {
    val seg = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://long.example/a\r\n very/long/path\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val rows = parseRecords(seg)
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "http://long.example/a very/long/path")
  }

  // ---- http_message ----------------------------------------------------

  private def parseHttp(b: Array[Byte]) = {
    import spark.implicits._
    Seq(Tuple1(b)).toDF("payload")
      .select(Warc.httpMessage(F.col("payload")).as("m"))
      .select("m.status", "m.content_type", "m.content_encoding", "m.body")
      .collect()
  }

  test("http_message parses status, headers, and identity body") {
    val rows = parseHttp(http(404, "not here", contentType = "text/plain; charset=utf-8"))
    assert(rows(0).getInt(0) == 404)
    assert(rows(0).getString(1) == "text/plain; charset=utf-8")
    assert(rows(0).isNullAt(2))
    assert(new String(rows(0).getAs[Array[Byte]](3), "UTF-8") == "not here")
  }

  test("http_message surfaces content-encoding for the gunzip stage") {
    val body = gz("compressed page".getBytes("UTF-8"))
    val msg = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++ body
    import spark.implicits._
    val rows = Seq(Tuple1(msg)).toDF("payload")
      .select(Warc.httpMessage(F.col("payload")).as("m"))
      .select(F.col("m.content_encoding"),
        F.decode(Warc.gunzip(F.col("m.body")), "UTF-8").as("text"))
      .collect()
    assert(rows(0).getString(0) == "gzip")
    assert(rows(0).getString(1) == "compressed page")
  }

  test("http_message de-chunks transfer-encoding: chunked bodies") {
    val msg = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "6\r\nchunk1\r\n" +
      "B;ext=1\r\n and chunk2\r\n" +
      "0\r\nX-Trailer: dropped\r\n\r\n").getBytes("UTF-8")
    val rows = parseHttp(msg)
    assert(rows(0).getInt(0) == 200)
    assert(new String(rows(0).getAs[Array[Byte]](3), "UTF-8") == "chunk1 and chunk2")
  }

  test("http_message degrades to NULL on junk and corrupt chunk framing") {
    import spark.implicits._
    val corruptChunk = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "ZZ\r\nnope\r\n0\r\n\r\n").getBytes("UTF-8")
    val oversized = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "FFFFFFFFFF\r\nx\r\n0\r\n\r\n").getBytes("UTF-8")
    val rows = Seq(
      (1L, "not http".getBytes("UTF-8")),
      (2L, "HTTP/1.1 banana\r\n\r\n".getBytes("UTF-8")),
      (3L, corruptChunk),
      (4L, oversized),
      (5L, Array.empty[Byte]))
      .toDF("id", "payload")
      .select(Warc.httpMessage(F.col("payload")).as("m"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  // ---- file readers ----------------------------------------------------

  private def writeTemp(dir: java.nio.file.Path, name: String,
      bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(dir.resolve(name), bytes)

  test("read and readStreamed agree on plain and gzipped files") {
    val dir = java.nio.file.Files.createTempDirectory("warc-read")
    val segA = rec("response", "http://a/1", http(200, "alpha")) ++
      rec("response", "http://a/2", http(200, "beta"))
    val segB = rec("response", "http://b/1", http(200, "gamma"))
    writeTemp(dir, "a.warc", segA)
    writeTemp(dir, "b.warc.gz", gz(segB))
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select(F.col("target_uri"), F.col("warc_type"),
          F.decode(F.col("payload"), "UTF-8").as("p"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
    val viaExpr = normalize(Warc.read(spark, dir.toString + "/*"))
    val viaStream = normalize(Warc.readStreamed(spark, dir.toString))
    assert(viaExpr.length == 3)
    assert(viaExpr.toSeq == viaStream.toSeq)
    assert(viaExpr.map(_._1).toSeq ==
      Seq("http://a/1", "http://a/2", "http://b/1"))
  }

  test("readStreamed skips oversized payloads and survives truncation") {
    val dir = java.nio.file.Files.createTempDirectory("warc-stream")
    val big = new Array[Byte](8192) // over the 1 KiB test cap below
    val seg = rec("response", "http://c/small1", http(200, "s1")) ++
      rec("resource", "http://c/big", big) ++
      rec("response", "http://c/small2", http(200, "s2"))
    writeTemp(dir, "c.warc", seg)
    // a second file truncated mid-payload: its first record still reads
    val two = rec("response", "http://d/1", http(200, "d-one")) ++
      rec("response", "http://d/2", http(200, "d-two"))
    writeTemp(dir, "d.warc", two.take(two.length - 30))
    val uris = Warc.readStreamed(spark, dir.toString, maxPayload = 1024)
      .select("target_uri").collect().map(_.getString(0)).sorted.toSeq
    assert(uris == Seq("http://c/small1", "http://c/small2", "http://d/1"))
  }

  test("a WARC file curates end to end: read -> pages -> curate") {
    import spark.implicits._
    val goodProse = "the cat sat on the mat and it was happy with that " +
      "state of affairs for the rest of the day in the sun by the window " +
      "with a warm blanket"
    def page(body: String) =
      s"<html><head><script>x()</script></head><body><p>$body</p></body></html>"
    val dir = java.nio.file.Files.createTempDirectory("warc-curate")
    writeTemp(dir, "seg.warc",
      rec("response", "http://w/good", http(200, page(goodProse))) ++
        rec("response", "http://w/dup", http(200, page(goodProse))) ++
        rec("response", "http://w/junk", http(200, page("tiny"))))
    val pages = Warc.pages(Warc.read(spark, dir.toString + "/*.warc"))
      .select(F.col("url").as("doc_id"),
        F.decode(F.col("body"), "UTF-8").as("text"))
    val out = graft.pipeline.Curation.curate(pages, "doc_id", "text",
      minQuality = 0.7, htmlInput = true, chunkSize = 8, chunkStride = 4)
    val urls = out.select("doc_id").distinct()
      .collect().map(_.getString(0)).toSet
    // junk gated out; the duplicate page collapses to the min url
    assert(urls == Set("http://w/dup"))
  }

  test("pages unwraps responses and feeds html_text end to end") {
    import spark.implicits._
    val page = "<html><head><script>junk()</script></head>" +
      "<body><h1>Title</h1><p>Crawled &amp; extracted.</p></body></html>"
    val seg = rec("request", "http://e/x", "GET /x HTTP/1.1\r\n\r\n".getBytes("UTF-8")) ++
      rec("response", "http://e/x", http(200, page)) ++
      rec("response", "http://e/y", http(301, "", contentType = "text/html")) ++
      rec("metadata", "http://e/x", "via: test\r\n".getBytes("UTF-8"),
        contentType = "application/warc-fields")
    val records = Seq(Tuple1(seg)).toDF("content")
      .select(F.lit("mem").as("file"),
        F.explode(Warc.records(F.col("content"))).as("r"))
      .select(F.col("file"), F.col("r.warc_type").as("warc_type"),
        F.col("r.target_uri").as("target_uri"), F.col("r.date").as("date"),
        F.col("r.record_id").as("record_id"),
        F.col("r.content_type").as("content_type"),
        F.col("r.payload").as("payload"))
    val pages = Warc.pages(records)
    val rows = pages
      .select(F.col("url"), F.col("status"),
        TextAnalysis.htmlText(F.decode(F.col("body"), "UTF-8")).as("text"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1)
    assert(rows.length == 2) // request + metadata records dropped
    assert(rows(0) == ("http://e/x", 200, "Title\nCrawled & extracted."))
    assert(rows(1)._2 == 301)
  }
}
