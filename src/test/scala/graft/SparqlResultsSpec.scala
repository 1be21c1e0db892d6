package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{functions => F}
import graft.rdf.{Blank, Iri, Lit, QuotedTriple, Terms, XSD}
import graft.sources.SparqlResults

/** The four W3C result formats (CSV/TSV REC, JSON REC, XML REC): term
  * encoding per shape, field escaping, unbound handling, the distributed
  * per-part document contract, and a JSON round-trip back through the
  * protocol SOURCE's decoder (write → serve → SERVICE → same terms). */
class SparqlResultsSpec extends SparkSpec {

  /** One row with every term shape: iri, plain/lang/typed literal,
    * bnode, quoted triple, unbound. */
  private def mixedFrame = spark.range(1).select(
    Terms.iri(F.lit("http://example.com/s")).as("i"),
    Terms.plainLit(F.lit("plain")).as("pl"),
    Terms.langLit(F.lit("chat"), F.lit("fr")).as("ll"),
    Terms.lit(F.lit("42"), XSD.integer).as("tl"),
    Terms.blank(F.lit("b0")).as("bn"),
    Terms.termCol(QuotedTriple(
      Iri("http://example.com/a"), Iri("http://example.com/p"),
      Lit.plain("o"))).as("qt"),
    F.lit(null).cast(Terms.termType).as("ub"))

  test("TSV: Turtle term syntax, ?-prefixed header, unbound empty") {
    val lines = SparqlResults.tsv(mixedFrame).split("\n")
    assert(lines(0) == "?i\t?pl\t?ll\t?tl\t?bn\t?qt\t?ub")
    val f = lines(1).split("\t", -1)
    assert(f(0) == "<http://example.com/s>")
    assert(f(1) == "\"plain\"") // xsd:string stays bare
    assert(f(2) == "\"chat\"@fr")
    assert(f(3) == "\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    assert(f(4) == "_:b0")
    assert(f(5) ==
      "<< <http://example.com/a> <http://example.com/p> \"o\" >>")
    assert(f(6) == "")
  }

  test("TSV: literal escapes tab, newline, quote, backslash") {
    val df = spark.range(1).select(
      Terms.plainLit(F.lit("a\tb\nc\"d\\e")).as("v"))
    val lines = SparqlResults.tsv(df).split("\n")
    assert(lines(1) == """"a\tb\nc\"d\\e"""")
  }

  test("CSV: bare lexical forms, RFC 4180 quoting, CRLF line ends") {
    val df = spark.range(1).select(
      Terms.iri(F.lit("http://example.com/s")).as("i"),
      Terms.plainLit(F.lit("with,comma")).as("c"),
      Terms.plainLit(F.lit("with\"quote")).as("q"),
      Terms.langLit(F.lit("plain lex"), F.lit("en")).as("l"),
      Terms.blank(F.lit("b1")).as("b"))
    val lines = SparqlResults.csv(df).split("\n")
    assert(lines(0) == "i,c,q,l,b\r")
    assert(lines(1) ==
      "http://example.com/s,\"with,comma\",\"with\"\"quote\",plain lex,_:b1\r")
  }

  test("JSON: typed binding objects; unbound absent; control chars escaped") {
    val df = spark.range(1).select(
      Terms.iri(F.lit("http://example.com/s")).as("i"),
      Terms.langLit(F.lit("chat"), F.lit("fr")).as("ll"),
      Terms.lit(F.lit("4.5"), XSD.decimal).as("tl"),
      Terms.plainLit(F.lit("ctl\"x\\")).as("pl"),
      F.lit(null).cast(Terms.termType).as("ub"))
    val json = SparqlResults.json(df)
    // must be machine-parseable: decode with Jackson (on the classpath)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    assert(root.path("head").path("vars").size() == 5)
    val b = root.path("results").path("bindings").get(0)
    assert(b.path("i").path("type").asText == "uri")
    assert(b.path("i").path("value").asText == "http://example.com/s")
    assert(b.path("ll").path("xml:lang").asText == "fr")
    assert(!b.path("ll").has("datatype")) // langString implied by xml:lang
    assert(b.path("tl").path("datatype").asText == XSD.decimal)
    assert(!b.path("pl").has("datatype")) // xsd:string omitted
    assert(b.path("pl").path("value").asText == "ctl\"x\\")
    assert(!b.has("ub"))
  }

  test("JSON: quoted triple uses the SPARQL 1.2 triple extension") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(SparqlResults.json(mixedFrame))
    val qt = root.path("results").path("bindings").get(0).path("qt")
    assert(qt.path("type").asText == "triple")
    assert(qt.path("value").path("subject").path("value").asText ==
      "http://example.com/a")
    assert(qt.path("value").path("object").path("type").asText == "literal")
  }

  test("XML: sparql-results namespace, entity escapes, ASK forms") {
    val df = spark.range(1).select(
      Terms.iri(F.lit("http://example.com/a&b<c")).as("i"),
      Terms.lit(F.lit("7"), XSD.integer).as("n"))
    val xml = SparqlResults.xml(df)
    assert(xml.startsWith("""<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#">"""))
    assert(xml.contains("""<variable name="i"/>"""))
    assert(xml.contains("<uri>http://example.com/a&amp;b&lt;c</uri>"))
    assert(xml.contains(
      """<literal datatype="http://www.w3.org/2001/XMLSchema#integer">7</literal>"""))
    assert(SparqlResults.askJson(true) == """{"head":{},"boolean":true}""")
    assert(SparqlResults.askXml(false).contains("<boolean>false</boolean>"))
  }

  test("empty result set: header-only CSV, empty JSON bindings array") {
    val none = mixedFrame.where(F.lit(false))
    assert(SparqlResults.csv(none) == "i,pl,ll,tl,bn,qt,ub\r\n")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(SparqlResults.json(none))
    assert(root.path("results").path("bindings").size() == 0)
  }

  test("distributed writeTsv/writeJson: every part is a standalone document") {
    val e = Engine.inline(
      """@prefix ex: <http://example.com/> .
        |ex:i1 ex:p "a" . ex:i2 ex:p "b"@en . ex:i3 ex:p 3 .
        |ex:i4 ex:p ex:o .
        |""".stripMargin)
    val raw = e.selectRaw(
      "SELECT ?s ?o WHERE { ?s <http://example.com/p> ?o }").repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("results").toString

    SparqlResults.writeTsv(raw, s"$dir/tsv")
    val tsvParts = new java.io.File(s"$dir/tsv").listFiles()
      .filter(_.getName.startsWith("part-")).map(f =>
        new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
    assert(tsvParts.forall(_.startsWith("?s\t?o"))) // header per part
    val dataLines = tsvParts.flatMap(_.split("\n").drop(1)).filter(_.nonEmpty)
    assert(dataLines.length == 4)
    assert(dataLines.exists(_.endsWith("\"b\"@en")))

    SparqlResults.writeJson(raw, s"$dir/json")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val jsonParts = new java.io.File(s"$dir/json").listFiles()
      .filter(_.getName.startsWith("part-")).map(f =>
        new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
    // every part parses standalone; bindings union to the result set
    val all = jsonParts.map(m.readTree)
    assert(all.forall(_.path("head").path("vars").size() == 2))
    assert(all.map(_.path("results").path("bindings").size()).sum == 4)
  }

  test("TSV: quoted triple with tab/nesting escapes; round-trips via read") {
    // a raw tab inside a component literal must render as the ECHAR \t
    // (it is the field separator), and nesting must stay textual
    val qt = QuotedTriple(
      Iri("http://e/a"), Iri("http://e/p"),
      QuotedTriple(Iri("http://e/x"), Iri("http://e/q"),
        Lit.plain("tab\there")))
    val df = spark.range(1).select(Terms.termCol(qt).as("t"))
    val tsv = SparqlResults.tsv(df)
    assert(tsv.split("\n")(1) ==
      "<< <http://e/a> <http://e/p> << <http://e/x> <http://e/q> \"tab\\there\" >> >>")
    val dir = java.nio.file.Files.createTempDirectory("qt_tsv").toString
    SparqlResults.writeTsv(df, s"$dir/t")
    val back = SparqlResults.read(spark, s"$dir/t", Seq("t")).collect()(0)
    assert(Terms.unpackString(back.getStruct(0).getString(1)) == qt)
  }

  test("XML: control characters in a literal are rejected, not emitted") {
    val df = spark.range(1).select(
      Terms.plainLit(F.lit("badchar")).as("v"))
    intercept[Exception](SparqlResults.xml(df))
    // JSON carries the same data losslessly
    assert(SparqlResults.json(df).contains("\\u0001"))
  }

  test("read: written directories decode back, format sniffed per file") {
    val raw = Engine.inline(
      """@prefix ex: <http://example.com/> .
        |ex:i1 ex:p "a" . ex:i2 ex:p "b"@en . ex:i3 ex:p 3 .
        |ex:i4 ex:p ex:o .
        |""".stripMargin)
      .selectRaw("SELECT ?s ?o WHERE { ?s <http://example.com/p> ?o }")
      .repartition(2)
    val want = raw.collect().toSeq.sortBy(_.toString)
    val dir = java.nio.file.Files.createTempDirectory("res_read").toString
    SparqlResults.writeJson(raw, s"$dir/j")
    SparqlResults.writeXml(raw, s"$dir/x")
    SparqlResults.writeTsv(raw, s"$dir/t")
    for (sub <- Seq("j", "x", "t")) {
      val back = SparqlResults.read(spark, s"$dir/$sub", Seq("s", "o"))
        .collect().toSeq.sortBy(_.toString)
      assert(back == want, s"sub-dir $sub")
    }
  }

  test("round trip: writeJson output feeds the protocol source unchanged") {
    val e = Engine.inline(
      """@prefix ex: <http://example.com/> .
        |ex:i1 ex:label "one"@en . ex:i2 ex:label "two"@en .
        |""".stripMargin)
    val raw = e.selectRaw(
      "SELECT ?item ?label WHERE { ?item <http://example.com/label> ?label }")
      .withColumnRenamed("label", "label").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("rt").toString
    SparqlResults.writeJson(
      raw.select(F.col("item"), F.col("label")), s"$dir/out")
    val doc = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
      .mkString
    // serve the written document; SERVICE must decode the same bindings
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val out = doc.getBytes(UTF_8)
      ex.getResponseHeaders.add(
        "Content-Type", "application/sparql-results+json")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
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
    } finally server.stop(0)
  }
}
