package graft

import graft.rdf._
import scala.util.Random

/** Randomized cross-format round trips: seeded random graphs built
  * from HOSTILE term pools (escape-heavy literals, unicode IRIs,
  * language/direction tags, datatyped literals, blank nodes, quoted
  * triples, named graphs) go through every serializer → parser pair
  * and must come back RDFC-isomorphic. Complements the per-format
  * fixpoint specs: those use curated fixtures, this explores the
  * combinatorial space of term shapes the serializers must escape
  * correctly. Formats skip only what their data model cannot carry
  * (documented per case below). */
class FormatRoundTripSpec extends SparkSpec {

  private val rnd = new Random(271)

  // ---------------------------------------------------- term pools

  private val iris: Seq[Iri] = Seq(
    Iri("http://example.com/a"),
    Iri("http://example.com/path/with#frag"),
    Iri("urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66"),
    Iri("http://example.com/unicode/中文"),
    Iri("http://example.com/q?x=1&y=2"),
    Iri("http://example.com/~user/%20esc"))

  private val preds: Seq[Iri] = Seq(
    Iri("http://example.com/p"), Iri("http://example.com/q"),
    Iri("http://example.com/ns#r"))

  private val hostileLex: Seq[String] = Seq(
    "plain", "with \"quotes\"", "line\nbreak", "tab\there",
    "back\\slash", "très tôt", "你好",
    "ends with space ", "'single' and \"double\"",
    "a\rb", "", "<not-a-tag> & entity")

  private def randLit(): Lit = rnd.nextInt(6) match {
    case 0 => Lit.plain(hostileLex(rnd.nextInt(hostileLex.length)))
    case 1 => Lit.tagged(hostileLex(rnd.nextInt(hostileLex.length)),
      Seq("en", "en-US", "de")(rnd.nextInt(3)))
    case 2 => Lit.typed(rnd.nextInt(1000).toString, XSD.integer)
    case 3 => Lit.typed(s"${rnd.nextInt(100)}.5", XSD.decimal)
    case 4 => Lit.typed(if (rnd.nextBoolean()) "true" else "false",
      XSD.boolean)
    case 5 => Lit.typed(hostileLex(rnd.nextInt(hostileLex.length)),
      "http://example.com/customType")
  }

  private def randNode(bnodes: Boolean): RdfTerm =
    if (bnodes && rnd.nextInt(4) == 0) Blank("n" + rnd.nextInt(5))
    else iris(rnd.nextInt(iris.length))

  private def randTriples(n: Int, bnodes: Boolean,
      quoted: Boolean): Seq[(RdfTerm, RdfTerm, RdfTerm)] =
    Seq.fill(n) {
      val s = randNode(bnodes)
      val p = preds(rnd.nextInt(preds.length))
      val o = rnd.nextInt(3) match {
        case 0 => randNode(bnodes)
        case 1 => randLit()
        case 2 if quoted && rnd.nextInt(3) == 0 =>
          QuotedTriple(randNode(bnodes), preds(rnd.nextInt(preds.length)),
            randLit())
        case _ => randLit()
      }
      (s, p, o)
    }.distinct

  private def graphOf(ts: Seq[(RdfTerm, RdfTerm, RdfTerm)]): RdfGraph =
    RdfGraph.fromTriples(spark, ts, Map("ex" -> "http://example.com/"))

  private def quadGraphOf(n: Int): RdfGraph = {
    val names = Seq(None, Some(Iri("http://example.com/g1")),
      Some(Iri("http://example.com/g2")), Some(Blank("gb")))
    RdfGraph.fromQuads(spark,
      randTriples(n, bnodes = true, quoted = false).map { case (s, p, o) =>
        (s, p, o, names(rnd.nextInt(names.length)))
      }, Map.empty)
  }

  private def check(label: String, g: RdfGraph, back: RdfGraph): Unit =
    assert(g.isomorphic(back),
      s"$label round trip lost isomorphism:\n--- original:\n" +
        g.canonicalNQuads() + "--- reparsed:\n" + back.canonicalNQuads())

  // ------------------------------------- deterministic pinned corners

  test("JSON-LD preserves language-tag case (en-US stays en-US)") {
    // JSON-LD 1.1 made tag lowercasing a MAY; this engine's policy is
    // case-preservation in every reader (tags compare case-insensitively
    // only where SPARQL says so, i.e. langMatches)
    val g = graphOf(Seq(
      (iris.head, preds.head, Lit.tagged("Hi", "en-US")),
      (iris.head, preds(1), Lit.tagged("مرحبا", "AR--rtl"))))
    val back =
      graft.sources.JsonLd.parse(graft.sources.JsonLd.serialize(g), spark)
    check("jsonld-langcase", g, back)
    assert(back.canonicalNQuads().contains("@en-US"),
      "language-tag case was not preserved through JSON-LD")
  }

  test("RDF/XML round-trips \\r and attribute-hostile whitespace") {
    // \r in text content must be emitted as &#xD; (XML 1.0 §2.11
    // line-end normalization folds a raw \r to \n on any reparse)
    val g = graphOf(Seq(
      (iris.head, preds.head, Lit.tagged("a\rb", "en-US")),
      (iris.head, preds(1), Lit.typed("x\r\ny\tz",
        "http://example.com/customType")),
      (iris.head, preds(2), Lit.plain("trailing\r"))))
    check("rdfxml-cr", g,
      graft.sources.RdfXml.parse(graft.sources.RdfXml.serialize(g), spark))
  }

  test("RDF/XML XMLLiteral keeps attribute whitespace as char refs") {
    // §3.3.3 attribute-value normalization folds raw \t/\n to spaces:
    // the captured XMLLiteral lexical form must char-reference them so
    // reparsing the literal's XML cannot corrupt it
    val doc =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://example.com/">
        |  <rdf:Description rdf:about="http://example.com/s">
        |    <ex:p rdf:parseType="Literal"><e a="x&#x9;y&#xA;z&#xD;w">t&#xD;u</e></ex:p>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val g = graft.sources.RdfXml.parse(doc, spark)
    val nq = g.canonicalNQuads()
    assert(nq.contains("&#x9;") && nq.contains("&#xA;") && nq.contains("&#xD;"),
      s"XMLLiteral lexical form lost whitespace char refs:\n$nq")
    check("rdfxml-xmlliteral", g,
      graft.sources.RdfXml.parse(graft.sources.RdfXml.serialize(g), spark))
  }

  test("N-Triples read: strict names the malformed line; lenient skips it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntbad").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/bad.nt"),
      "<http://e/s> <http://e/p> \"ok\" .\n" +
        "<http://e/s> <http://e/p> \"unterminated .\n" + // no closing quote
        "<http://e/s2> <http://e/p> \"ok2\" .\n")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.NTriples.read(spark, s"$dir/bad.nt").triples.count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[GraftException] &&
      c.getMessage.contains("unterminated")),
      s"strict read must surface the documented error naming the line: $e")
    val g = graft.sources.NTriples.read(spark, s"$dir/bad.nt", lenient = true)
    assert(g.size == 2, "lenient read keeps exactly the well-formed lines")
  }

  // ------------------------------------------------------- the runs

  /** Extra rounds from the environment — a deep one-off fuzz runs many
    * more random graphs through every serializer pair without editing
    * the pinned 3-round default. */
  private val rounds: Int =
    sys.env.get("GRAFT_ROUNDTRIP_ROUNDS").map(_.toInt).getOrElse(3)

  for (round <- 1 to rounds) {
    test(s"Turtle round-trips a random hostile graph (round $round)") {
      // Turtle carries everything incl. quoted triples
      val g = graphOf(randTriples(30, bnodes = true, quoted = true))
      check("turtle", g,
        graft.sources.Turtle.parse(graft.sources.Turtle.serialize(g), spark))
    }

    test(s"TriG round-trips a random hostile quad store (round $round)") {
      val g = quadGraphOf(30)
      check("trig", g,
        graft.sources.Trig.parse(graft.sources.Trig.serialize(g), spark))
    }

    test(s"JSON-LD round-trips a random hostile quad store (round $round)") {
      // JSON-LD has no quoted triples; named graphs (incl. a blank
      // graph name) and everything else must survive
      val g = quadGraphOf(30)
      check("jsonld", g,
        graft.sources.JsonLd.parse(graft.sources.JsonLd.serialize(g), spark))
    }

    test(s"RDF/XML round-trips a random hostile graph (round $round)") {
      // RDF/XML: triples only, no quoted triples (no syntax exists)
      val g = graphOf(randTriples(30, bnodes = true, quoted = false))
      check("rdfxml", g,
        graft.sources.RdfXml.parse(graft.sources.RdfXml.serialize(g), spark))
    }

    test(s"N-Triples file round-trips a random hostile graph (round $round)") {
      val g = graphOf(randTriples(30, bnodes = true, quoted = true))
      val dir = java.nio.file.Files.createTempDirectory("graft_nt").toString
      graft.sources.NTriples.write(g, s"$dir/g.nt")
      check("ntriples", g, graft.sources.NTriples.read(spark, s"$dir/g.nt"))
    }

    test(s"N-Quads file round-trips a random hostile quad store (round $round)") {
      val g = quadGraphOf(30)
      val dir = java.nio.file.Files.createTempDirectory("graft_nq").toString
      graft.sources.NQuads.write(g, s"$dir/g.nq")
      check("nquads", g, graft.sources.NQuads.read(spark, s"$dir/g.nq"))
    }
  }
}
