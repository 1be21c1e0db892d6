package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, functions => F}
import graft.rdf.{Terms, RDF, XSD}
import graft.sources.SparqlResults

/** Content-negotiated decode in the protocol source: the endpoint answers
  * with results-XML, TSV, or CSV instead of JSON and
  * `spark.read.format("sparql")` must still produce the same term
  * structs. Lossless formats (XML, TSV) round-trip through our own
  * serializers; CSV checks the REC-sanctioned lossy heuristics. */
class ResultDecodersSpec extends SparkSpec {

  /** Stub serving a fixed body under a given Content-Type; records the
    * request's Accept header. */
  private def withServer(body: String, contentType: String)(
      f: (String, () => String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastAccept = ""
    server.createContext("/sparql", (ex: HttpExchange) => {
      lastAccept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
      val out = body.getBytes(UTF_8)
      if (contentType.nonEmpty)
        ex.getResponseHeaders.add("Content-Type", contentType)
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/sparql",
      () => lastAccept)
    finally server.stop(0)
  }

  private def readVia(url: String, vars: String): DataFrame =
    spark.read.format("sparql")
      .option("url", url)
      .option("query", "SELECT * { ?s ?p ?o }") // shipped verbatim; unused
      .option("vars", vars)
      .load()

  /** Result frame with every term shape the lossless formats carry. */
  private def mixedFrame = spark.range(1).select(
    Terms.iri(F.lit("http://example.com/s")).as("i"),
    Terms.plainLit(F.lit("pl ain\t\"x\\")).as("pl"),
    Terms.langLit(F.lit("chat"), F.lit("fr")).as("ll"),
    Terms.lit(F.lit("42"), XSD.integer).as("tl"),
    Terms.blank(F.lit("b0")).as("bn"),
    F.lit(null).cast(Terms.termType).as("ub"))

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("XML round trip: writeXml output decodes to the same term structs") {
    val dir = java.nio.file.Files.createTempDirectory("xmlrt").toString
    SparqlResults.writeXml(mixedFrame.coalesce(1), s"$dir/x")
    val doc = new java.io.File(s"$dir/x").listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
      .mkString
    withServer(doc, "application/sparql-results+xml") { (url, accept) =>
      val back = readVia(url, "i,pl,ll,tl,bn,ub")
      assert(sortedRows(back) == sortedRows(mixedFrame))
      assert(accept().contains("application/sparql-results+xml"))
    }
  }

  test("XML: content-type parameters tolerated; generic xml types accepted") {
    val dir = java.nio.file.Files.createTempDirectory("xmlct").toString
    SparqlResults.writeXml(mixedFrame.coalesce(1), s"$dir/x")
    val doc = new java.io.File(s"$dir/x").listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
      .mkString
    for (ct <- Seq("application/sparql-results+xml;charset=utf-8", "text/xml"))
      withServer(doc, ct) { (url, _) =>
        assert(readVia(url, "i,pl,ll,tl,bn,ub").count() == 1)
      }
  }

  test("TSV round trip: writeTsv output decodes losslessly incl. escapes") {
    val dir = java.nio.file.Files.createTempDirectory("tsvrt").toString
    SparqlResults.writeTsv(mixedFrame.coalesce(1), s"$dir/t")
    val doc = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
      .mkString
    withServer(doc, "text/tab-separated-values") { (url, _) =>
      val back = readVia(url, "i,pl,ll,tl,bn,ub")
      assert(sortedRows(back) == sortedRows(mixedFrame))
    }
  }

  test("TSV: header order differs from reader vars; bare numbers/booleans") {
    val tsv =
      "?n\t?f\t?b\n" +           // reader asks for (b, n, f): name-matched
        "42\t4.5\ttrue\n" +
        "-7\t1.0e3\tfalse\n"
    withServer(tsv, "text/tab-separated-values") { (url, _) =>
      val rows = readVia(url, "b,n,f").collect().sortBy(_.toString)
      assert(rows.length == 2)
      val r = rows.find(_.getStruct(1).getString(1) == "42").get
      assert(r.getStruct(0).getString(1) == "true")
      assert(r.getStruct(0).getString(2) == XSD.boolean)
      assert(r.getStruct(1).getString(2) == XSD.integer)
      assert(r.getStruct(2).getString(1) == "4.5")
      assert(r.getStruct(2).getString(2) == XSD.decimal)
      val r2 = rows.find(_.getStruct(1).getString(1) == "-7").get
      assert(r2.getStruct(2).getString(2) == XSD.double)
    }
  }

  test("TSV: quoted triple field decodes to the packed columnar encoding") {
    val tsv = "?t\n" +
      "<< <http://e/a> <http://e/p> \"o x\"@en >>\n"
    withServer(tsv, "text/tab-separated-values") { (url, _) =>
      val r = readVia(url, "t").collect()(0).getStruct(0)
      assert(r.getByte(0) == Terms.KIND_TRIPLE)
      val q = Terms.unpackString(r.getString(1))
      assert(q.s == rdf.Iri("http://e/a"))
      assert(q.o == rdf.Lit("o x", RDF.langString, "en"))
    }
  }

  test("TSV: empty field is unbound, not an empty literal") {
    val tsv = "?a\t?b\n\t<http://e/x>\n"
    withServer(tsv, "text/tab-separated-values") { (url, _) =>
      val r = readVia(url, "a,b").collect()(0)
      assert(r.isNullAt(0))
      assert(r.getStruct(1).getString(1) == "http://e/x")
    }
  }

  test("CSV: lossy heuristic decode — IRI shape, _: bnode, plain literal") {
    val csv = "s,o\r\n" +
      "http://example.com/a,\"hello, world\"\r\n" +
      "_:b0,just text\r\n" +
      "urn:isbn:12,\"line\nbreak\"\r\n" // quoted field may span lines
    withServer(csv, "text/csv") { (url, _) =>
      val rows = readVia(url, "s,o").collect().sortBy(_.toString)
      assert(rows.length == 3)
      val byS = rows.map(r => (if (r.isNullAt(0)) "" else
        r.getStruct(0).getString(1), r)).toMap
      assert(byS("http://example.com/a").getStruct(0).getByte(0) ==
        Terms.KIND_IRI)
      assert(byS("http://example.com/a").getStruct(1).getString(1) ==
        "hello, world")
      assert(byS("b0").getStruct(0).getByte(0) == Terms.KIND_BLANK)
      assert(byS("b0").getStruct(1).getString(1) == "just text")
      assert(byS("urn:isbn:12").getStruct(0).getByte(0) == Terms.KIND_IRI)
      assert(byS("urn:isbn:12").getStruct(1).getString(1) == "line\nbreak")
    }
  }

  test("JSON: SPARQL 1.2 triple-extension bindings decode (round trip)") {
    val qtFrame = spark.range(1).select(
      Terms.termCol(rdf.QuotedTriple(
        rdf.Iri("http://e/a"), rdf.Iri("http://e/p"),
        rdf.QuotedTriple(rdf.Iri("http://e/x"), rdf.Iri("http://e/q"),
          rdf.Lit.plain("deep")))).as("t"))
    val doc = SparqlResults.json(qtFrame)
    withServer(doc, "application/sparql-results+json") { (url, _) =>
      val back = readVia(url, "t")
      assert(sortedRows(back) == sortedRows(qtFrame))
    }
  }

  test("JSON: malformed triple term (literal predicate / missing slot) " +
      "raises the decoder's IOException, not a ClassCastException") {
    val badPred = """{"head":{"vars":["t"]},"results":{"bindings":[
      {"t":{"type":"triple","value":{
        "subject":{"type":"uri","value":"http://e/a"},
        "predicate":{"type":"literal","value":"not-an-iri"},
        "object":{"type":"literal","value":"x"}}}}]}}"""
    val noSubj = """{"head":{"vars":["t"]},"results":{"bindings":[
      {"t":{"type":"triple","value":{
        "predicate":{"type":"uri","value":"http://e/p"},
        "object":{"type":"literal","value":"x"}}}}]}}"""
    for (doc <- Seq(badPred, noSubj))
      withServer(doc, "application/sparql-results+json") { (url, _) =>
        val e = intercept[org.apache.spark.SparkException] {
          readVia(url, "t").collect()
        }
        def chain(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: chain(t.getCause)
        assert(chain(e).exists(_.isInstanceOf[java.io.IOException]),
          s"expected an IOException in the cause chain, got $e")
      }
  }

  test("missing Content-Type falls back to the JSON decoder") {
    val doc = SparqlResults.json(mixedFrame)
    withServer(doc, "") { (url, _) =>
      assert(readVia(url, "i,pl,ll,tl,bn,ub").count() == 1)
    }
  }

  test("SERVICE against an XML-only endpoint joins like the JSON path") {
    val served = Engine.inline(
      """@prefix ex: <http://example.com/> .
        |ex:i1 ex:label "one"@en . ex:i2 ex:label "two"@en .
        |""".stripMargin)
    val raw = served.selectRaw(
      "SELECT ?item ?label WHERE { ?item <http://example.com/label> ?label }")
    val dir = java.nio.file.Files.createTempDirectory("svcxml").toString
    SparqlResults.writeXml(raw.coalesce(1), s"$dir/x")
    val doc = new java.io.File(s"$dir/x").listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
      .mkString
    withServer(doc, "application/sparql-results+xml") { (url, _) =>
      val local = Engine.inline(
        """@prefix ex: <http://example.com/> .
          |ex:i1 ex:price 10 . ex:i2 ex:price 20 .
          |""".stripMargin)
      val rows = local.select(
        s"""SELECT ?item ?price ?label {
              ?item <http://example.com/price> ?price
              SERVICE <$url> { ?item <http://example.com/label> ?label }
            } ORDER BY ?price""").collect()
      assert(rows.length == 2)
      assert(rows.map(_.get(2).toString).toSeq == Seq("one", "two"))
    }
  }
}
