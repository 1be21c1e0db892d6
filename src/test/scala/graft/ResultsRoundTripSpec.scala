package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.util.Random

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.rdf._
import graft.sources.SparqlResults

/** Randomized round trips for the SPARQL RESULTS formats — the same
  * hostile-random treatment the graph serializations get in
  * FormatRoundTripSpec: seeded random solution sets (unbound cells,
  * duplicate rows, escape-heavy lexicals, case-carrying language tags,
  * non-canonical numeric lexical forms, custom datatypes, blank nodes,
  * quoted triples) go through our writer → the protocol source's
  * decoder and must come back as IDENTICAL term structs for the
  * lossless formats (JSON, XML, TSV). CSV is the documented lossy
  * projection and is pinned separately in ResultDecodersSpec.
  * Deepen with GRAFT_ROUNDTRIP_ROUNDS. */
class ResultsRoundTripSpec extends SparkSpec {

  private val rnd = new Random(379)

  // ------------------------------------------------------- random frames

  private val hostileLex: Seq[String] = Seq(
    "plain", "with \"quotes\"", "line\nbreak", "tab\there",
    "back\\slash", "très tôt", "你好", "a\rb", "",
    "ends with space ", "<tag> & entity")

  private def randTerm(quoted: Boolean): RdfTerm = rnd.nextInt(8) match {
    case 0 => Iri("http://example.com/" + Seq("a", "b", "中文")(rnd.nextInt(3)))
    case 1 => Blank("b" + rnd.nextInt(3))
    case 2 => Lit.plain(hostileLex(rnd.nextInt(hostileLex.length)))
    case 3 => Lit.tagged(hostileLex(rnd.nextInt(hostileLex.length)),
      Seq("en", "en-US", "de-CH")(rnd.nextInt(3)))
    case 4 => Lit.typed(Seq("42", "042", "-0")(rnd.nextInt(3)), XSD.integer)
    case 5 => Lit.typed(hostileLex(rnd.nextInt(hostileLex.length)),
      "http://example.com/customType")
    case 6 if quoted =>
      QuotedTriple(Iri("http://example.com/s"),
        Iri("http://example.com/p"),
        Lit.tagged(hostileLex(rnd.nextInt(hostileLex.length)), "en-US"))
    case _ => Lit.typed(if (rnd.nextBoolean()) "true" else "false",
      XSD.boolean)
  }

  private def structOf(t: RdfTerm): Row = t match {
    case Iri(v) => Row(Terms.KIND_IRI, v, null, null)
    case Blank(l) => Row(Terms.KIND_BLANK, l, null, null)
    case Lit(lex, dt, lang) => Row(Terms.KIND_LIT, lex, dt, lang)
    case q: QuotedTriple =>
      Row(Terms.KIND_TRIPLE, Terms.packString(q), null, null)
  }

  private val vars = Seq("v0", "v1", "v2")

  private def randFrame(quoted: Boolean): DataFrame = {
    val n = 1 + rnd.nextInt(5)
    val base = Seq.fill(n)(Row(vars.map { _ =>
      if (rnd.nextInt(5) == 0) null else structOf(randTerm(quoted))
    }: _*))
    // result sets are bags: duplicate a row sometimes
    val rows = if (rnd.nextBoolean()) base ++ base.take(1) else base
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(vars.map(v => StructField(v, Terms.termType, true))))
  }

  // ------------------------------------------------------ serve + decode

  private def withServer(body: String, contentType: String)(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val out = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", contentType)
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
    finally server.stop(0)
  }

  private def readVia(url: String): DataFrame =
    spark.read.format("sparql")
      .option("url", url)
      .option("query", "SELECT * { ?s ?p ?o }") // shipped verbatim; unused
      .option("vars", vars.mkString(","))
      .load()

  private def partFiles(dir: String): String =
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8))
      .mkString

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  private def checkBack(label: String, df: DataFrame, url: String): Unit = {
    val (want, got) = (sortedRows(df), sortedRows(readVia(url)))
    assert(want == got,
      s"$label round trip differs:\nwant: ${want.mkString("\n      ")}\n" +
        s"got:  ${got.mkString("\n      ")}")
  }

  private val rounds: Int =
    sys.env.get("GRAFT_ROUNDTRIP_ROUNDS").map(_.toInt).getOrElse(6)

  for (round <- 0 until rounds) {
    test(s"results-JSON round-trips a random hostile solution set (round $round)") {
      val df = randFrame(quoted = true)
      withServer(SparqlResults.json(df),
        "application/sparql-results+json")(url => checkBack("json", df, url))
    }

    test(s"results-XML round-trips a random hostile solution set (round $round)") {
      val df = randFrame(quoted = true)
      val dir = java.nio.file.Files.createTempDirectory("resxml").toString
      SparqlResults.writeXml(df.coalesce(1), s"$dir/x")
      withServer(partFiles(s"$dir/x"),
        "application/sparql-results+xml")(url => checkBack("xml", df, url))
    }

    test(s"results-TSV round-trips a random hostile solution set (round $round)") {
      val df = randFrame(quoted = true)
      val dir = java.nio.file.Files.createTempDirectory("restsv").toString
      SparqlResults.writeTsv(df.coalesce(1), s"$dir/t")
      withServer(partFiles(s"$dir/t"),
        "text/tab-separated-values")(url => checkBack("tsv", df, url))
    }

    test(s"results-CSV decodes as the documented lossy projection (round $round)") {
      val df = randFrame(quoted = false)
      val dir = java.nio.file.Files.createTempDirectory("rescsv").toString
      SparqlResults.writeCsv(df.coalesce(1), s"$dir/c")
      withServer(partFiles(s"$dir/c"), "text/csv") { url =>
        val got = sortedRows(readVia(url))
        val want = df.collect().toSeq.map { row =>
          Row(vars.indices.map { i =>
            val cell = if (row.isNullAt(i)) None
              else Some(termOfStruct(row.getStruct(i)))
            csvProjection(cell).map(structOf).orNull
          }: _*)
        }.sortBy(_.toString)
        assert(got == want,
          s"csv lossy projection differs:\nwant: ${want.mkString("\n      ")}\n" +
            s"got:  ${got.mkString("\n      ")}")
      }
    }
  }

  // --------------------------------------- the CSV contract, independent

  private def termOfStruct(r: Row): RdfTerm = r.getByte(0) match {
    case Terms.KIND_IRI => Iri(r.getString(1))
    case Terms.KIND_BLANK => Blank(r.getString(1))
    case _ => Lit(r.getString(1), r.getString(2), r.getString(3))
  }

  private val iriShape = "^[A-Za-z][A-Za-z0-9+.-]*:[^\\s]*$".r

  /** The REC's documented lossy CSV projection, written independently:
    * the writer emits bare lexical forms (`_:label` for bnodes, empty
    * for unbound), the reader classifies by shape — `_:` prefix →
    * blank, absolute-IRI shape → IRI, empty → unbound, anything else →
    * plain xsd:string literal. */
  private def csvProjection(cell: Option[RdfTerm]): Option[RdfTerm] = {
    val s = cell match {
      case None => ""
      case Some(Blank(l)) => "_:" + l
      case Some(Iri(v)) => v
      case Some(Lit(lex, _, _)) => lex
      case Some(q) => sys.error(s"not in the CSV pool: $q")
    }
    if (s.isEmpty) None
    else if (s.startsWith("_:")) Some(Blank(s.substring(2)))
    else if (iriShape.matches(s)) Some(Iri(s))
    else Some(Lit(s, XSD.string, null))
  }
}
