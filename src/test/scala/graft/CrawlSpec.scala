package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.pipeline.Crawl

/** The one-call crawl flagship ([[graft.pipeline.Crawl]]): WARC files
  * in, curated corpus + frontier + host ranks out, with every
  * filtering decision pinned (status, mime, content-encoding unwrap,
  * deterministic ids, seen-URL subtraction). */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private def rec(typ: String, uri: String, payload: Array[Byte]): Array[Byte] = {
    val head = s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      "WARC-Date: 2024-01-02T03:04:05Z\r\nWARC-Record-ID: <urn:uuid:1>\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def http(status: Int, body: Array[Byte],
      contentType: String = "text/html; charset=utf-8",
      extra: String = ""): Array[Byte] =
    (s"HTTP/1.1 $status X\r\nContent-Type: $contentType\r\n" + extra +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++ body

  private def gz(data: Array[Byte]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(baos)
    out.write(data); out.close()
    baos.toByteArray
  }

  private val pageA =
    ("<html><body><p>Alpha page with the spark data table and more " +
      "plain english words about joins filters and columns.</p>" +
      "<a href=\"/other\">self</a>" +
      "<a href=\"http://beta.example/next\">b</a>" +
      "<a href=\"http://gamma.example/new\">g</a></body></html>")
      .getBytes("UTF-8")
  private val pageB =
    ("<html><body><p>Beta page text about query plans partitions and " +
      "shuffles written for the curation gate to accept.</p>" +
      "<a href=\"http://alpha.example/\">a</a></body></html>")
      .getBytes("UTF-8")

  private lazy val warcDir: String = {
    val segment =
      rec("response", "http://alpha.example/", http(200, pageA)) ++
      rec("response", "http://beta.example/",
        http(200, gz(pageB), extra = "Content-Encoding: gzip\r\n")) ++
      rec("response", "http://alpha.example/miss",
        http(404, "<html>gone</html>".getBytes("UTF-8"))) ++
      rec("response", "http://alpha.example/logo",
        http(200, Array[Byte](1, 2, 3), contentType = "image/png")) ++
      rec("request", "http://alpha.example/",
        "GET / HTTP/1.1\r\n\r\n".getBytes("UTF-8"))
    val dir = Files.createTempDirectory("crawl")
    Files.write(dir.resolve("seg.warc"), segment)
    dir.toString
  }

  test("htmlPages: 200 + text/html only, gzip bodies unwrapped, stable ids") {
    val pages = Crawl.htmlPages(
      graft.sources.Warc.readStreamed(spark, warcDir))
      .orderBy("url")
      .collect()
    assert(pages.map(_.getString(1)).toSeq ===
      Seq("http://alpha.example/", "http://beta.example/"))
    assert(pages(1).getString(2).contains("Beta page text"))
    // ids are xxhash64(url): deterministic, no coordination
    val expect = Seq("http://alpha.example/", "http://beta.example/")
      .toDF("url").select(F.xxhash64(F.col("url"))).as[Long].collect().toSeq
    assert(pages.map(_.getLong(0)).toSeq === expect)
  }

  test("pdf triage: version, page count, encryption; non-PDF null") {
    import graft.expressions.PdfMeta
    def pdf(body: String) = ("%PDF-1.7\n" + body + "\n%%EOF").getBytes("UTF-8")
    val threePages = pdf(
      """1 0 obj <</Type /Pages /Kids [2 0 R] /Count 3>> endobj
         2 0 obj <</Type /Page>> endobj
         3 0 obj <</Type/Page>> endobj
         4 0 obj <</Type
         /Page>> endobj""")
    val m = PdfMeta.parse(threePages)
    assert(m.getUTF8String(0).toString === "1.7")
    assert(m.getInt(1) === 3) // /Pages tree node not counted
    assert(!m.getBoolean(2))
    val enc = PdfMeta.parse(pdf("trailer <</Encrypt 5 0 R>>"))
    assert(enc.getBoolean(2))
    assert(PdfMeta.parse("not a pdf".getBytes) === null)
    assert(PdfMeta.parse(null) === null)
    // hitsHosts composes over real markup-derived edges
    import spark.implicits._
    val edges = Seq(("a.example", "b.example"), ("c.example", "b.example"))
      .toDF("src_host", "dst_host")
    val hh = graft.pipeline.Graphs.hitsHosts(edges)
      .select("host", "hub_scaled", "auth_scaled")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(hh("b.example")._2 === (1L << 20)) // the sole authority
    assert(hh("a.example")._1 === (1L << 20)) // joint top hub
  }

  test("redirects: 3xx Location resolved against the request URL") {
    val segment =
      rec("response", "http://a.example/old",
        ("HTTP/1.1 301 Moved\r\nLocation: /new\r\nContent-Length: 0\r\n\r\n")
          .getBytes("UTF-8")) ++
      rec("response", "http://a.example/other",
        ("HTTP/1.1 302 Found\r\nlocation:  http://b.example/x \r\n" +
          "Content-Length: 0\r\n\r\n").getBytes("UTF-8")) ++
      rec("response", "http://a.example/fine", http(200, pageA))
    val dir = Files.createTempDirectory("redir")
    Files.write(dir.resolve("seg.warc"), segment)
    val out = Crawl.redirects(
      graft.sources.Warc.readStreamed(spark, dir.toString))
      .as[(String, Int, String)].collect().toSet
    assert(out === Set(
      ("http://a.example/old", 301, "http://a.example/new"),
      ("http://a.example/other", 302, "http://b.example/x")))
    // a Location-looking line in the BODY must not fabricate an edge
    val bodyTrap = rec("response", "http://a.example/trap",
      ("HTTP/1.1 300 Choices\r\nContent-Length: 29\r\n\r\n" +
        "see:\r\nLocation: http://evil/x\r\n").getBytes("UTF-8"))
    val dir2 = Files.createTempDirectory("redir2")
    Files.write(dir2.resolve("seg.warc"), bodyTrap)
    assert(Crawl.redirects(
      graft.sources.Warc.readStreamed(spark, dir2.toString)).count() === 0)
  }

  test("sitemap discovery: robots Sitemap lines, urlset and index locs") {
    val robots = "User-agent: *\nDisallow: /x\n" +
      "Sitemap: http://a.example/sitemap.xml\n" +
      "  sitemap:   http://a.example/s2.xml.gz\n"
    val sm = Seq(Tuple1(robots)).toDF("r")
      .select(Crawl.sitemapsFromRobots(F.col("r"))).as[Seq[String]].head()
    assert(sm === Seq("http://a.example/sitemap.xml",
      "http://a.example/s2.xml.gz"))
    val urlset = """<?xml version="1.0"?>
      <urlset><url><loc> http://a.example/p?x=1&amp;y=2 </loc></url>
      <url><loc>http://a.example/q</loc><lastmod>2024-01-01</lastmod></url>
      </urlset>"""
    val urls = Seq(Tuple1(urlset)).toDF("x")
      .select(Crawl.sitemapUrls(F.col("x"))).as[Seq[String]].head()
    assert(urls === Seq("http://a.example/p?x=1&y=2", "http://a.example/q"))
    val index = """<sitemapindex><sitemap>
      <loc>http://a.example/part1.xml</loc></sitemap></sitemapindex>"""
    assert(Seq(Tuple1(index)).toDF("x")
      .select(Crawl.sitemapUrls(F.col("x"))).as[Seq[String]].head() ===
      Seq("http://a.example/part1.xml"))
  }

  test("schedule: per-host budget, deterministic dense fetch order") {
    val frontier = (Seq.tabulate(7)(i => s"http://big.example/p$i") ++
      Seq("http://small.example/only", "not a url")).toDF("url")
    val out = Crawl.schedule(frontier.repartition(5), maxPerHost = 3)
      .as[(String, String, Long)].collect().sortBy(r => (r._2, r._3))
    assert(out.count(_._2 == "big.example") === 3)
    assert(out.filter(_._2 == "big.example").map(_._1).toSeq ===
      Seq("http://big.example/p0", "http://big.example/p1",
        "http://big.example/p2"))
    assert(out.filter(_._2 == "small.example").map(_._3).toSeq === Seq(0L))
    // deterministic under repartitioning
    val again = Crawl.schedule(frontier.repartition(2), maxPerHost = 3)
      .as[(String, String, Long)].collect().sortBy(r => (r._2, r._3))
    assert(again.toSeq === out.toSeq)
  }

  test("round with politeness: robots gate + budget inside the one call") {
    val robots = Seq(("beta.example", "User-agent: *\nDisallow: /next"))
      .toDF("host", "robots_txt")
    val out = Crawl.round(spark, warcDir,
      minQuality = 0.0, chunkSize = 16, chunkStride = 16,
      robots = Some((robots, "graftbot")), maxPerHost = Some(5))
    // beta/next is robots-blocked; alpha/other and gamma/new survive
    // with dense per-host order
    val rows = out.frontier.select("url", "fetch_order")
      .as[(String, Long)].collect().toMap
    assert(rows === Map("http://alpha.example/other" -> 0L,
      "http://gamma.example/new" -> 0L))
  }

  test("round: corpus + frontier + host ranks from one call") {
    val out = Crawl.round(spark, warcDir,
      seenUrls = Some(Seq("http://gamma.example/new").toDF("url")),
      minQuality = 0.0, chunkSize = 16, chunkStride = 16)
    // both pages survive curation (plain english, no mojibake)
    assert(out.documents.select("doc_id").distinct().count() === 2)
    assert(out.documents.columns.toSeq ===
      Seq("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens"))
    // link targets: alpha/other, beta/next, gamma/new, alpha/ —
    // alpha/ and beta/ are fetched pages (dropped as own), gamma/new
    // is seen (dropped); the two never-fetched paths remain
    val frontier = out.frontier.as[String].collect().toSet
    assert(frontier === Set("http://alpha.example/other",
      "http://beta.example/next"))
    val ranks = out.hostRanks.as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(ranks.keySet === Set("alpha.example", "beta.example",
      "gamma.example"))
    // alpha is linked by beta; gamma only receives — alpha's rank is
    // highest because beta links it AND it has gamma's dangling mass
    assert(ranks("alpha.example") >= ranks("gamma.example"))
  }
}
