package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Mutation-robustness fuzz over every text parser: random single and
  * multi-edit corruptions of valid documents must either parse or
  * raise the format's DOCUMENTED rejection (the same closed set the
  * W3C negative-syntax runner accepts) — never an implementation
  * artifact (NPE, StackOverflow, MatchError, ClassCast, index errors,
  * raw NumberFormat…). An engine that ingests 100 TB of crawled data
  * meets corrupt bytes constantly; "crash differently per input" is a
  * robustness bug even when rejection is correct. Driver-side parse
  * APIs only, so thousands of mutations run in seconds. */
class ParserRobustnessSpec extends AnyFunSuite {

  private val turtleDoc =
    """@prefix ex: <http://example.com/> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |@base <http://example.com/base/> .
      |ex:s ex:p "esc \"q\" \n tab\t" ; ex:q 42, 3.14, 1.0e2 ;
      |  ex:r "tag"@en-US, "2024-01-01"^^xsd:date .
      |_:b1 ex:list ( 1 2 "three" ( ex:nested ) ) .
      |[ ex:anon true ] ex:ref <rel/iri#frag> .
      |<< ex:s ex:p "esc \"q\" \n tab\t" >> ex:certainty 0.9 .
      |""".stripMargin

  private val trigDoc =
    """@prefix ex: <http://example.com/> .
      |ex:s ex:p "default" .
      |ex:g1 { ex:s ex:p "in g1", "tag"@en ; ex:n 7 . _:b ex:q ex:s . }
      |GRAPH _:gb { ex:s ex:p ( 1 2 ) . }
      |""".stripMargin

  private val jsonldDoc =
    """{
      |  "@context": {"ex": "http://example.com/", "name": "ex:name",
      |    "tags": {"@id": "ex:tag", "@container": "@set"}},
      |  "@graph": [
      |    {"@id": "ex:s", "name": {"@value": "Hi", "@language": "en-US"},
      |     "tags": ["a", "b"], "ex:n": 42, "ex:d": 2.5,
      |     "ex:nested": {"@id": "_:b1", "ex:deep": {"@list": [1, 2]}}},
      |    {"@id": "ex:g1", "@graph": [{"@id": "ex:x", "ex:y": true}]}
      |  ]
      |}
      |""".stripMargin

  private val rdfxmlDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://example.com/" xml:base="http://example.com/b/">
      |  <rdf:Description rdf:about="http://example.com/s">
      |    <ex:p xml:lang="en-US">tagged</ex:p>
      |    <ex:n rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">7</ex:n>
      |    <ex:lit rdf:parseType="Literal"><e a="x&#x9;y">t</e></ex:lit>
      |    <ex:res rdf:resource="rel#frag"/>
      |    <ex:blank rdf:nodeID="b1"/>
      |    <ex:col rdf:parseType="Collection"><rdf:Description rdf:about="http://example.com/m"/></ex:col>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin

  private val sparqlQuery =
    """PREFIX ex: <http://example.com/>
      |SELECT ?s (COUNT(DISTINCT ?o) AS ?n) WHERE {
      |  ?s ex:p ?o . OPTIONAL { ?s ex:q ?w FILTER(?w > 3 && REGEX(STR(?o), "^a")) }
      |  { SELECT ?s WHERE { ?s (ex:a/ex:b)+|^ex:c ?x . VALUES ?x { 1 "two" ex:three UNDEF } } }
      |  GRAPH ?g { ?s ex:r "lit"@en-US } MINUS { ?s ex:dead true }
      |} GROUP BY ?s HAVING (COUNT(*) > 1) ORDER BY DESC(?n) LIMIT 10 OFFSET 2
      |""".stripMargin

  private val sparqlUpdate =
    """PREFIX ex: <http://example.com/>
      |DELETE { GRAPH ex:g { ?s ex:old ?o } } INSERT { ?s ex:new ?o }
      |USING NAMED ex:g WHERE { GRAPH ?g { ?s ex:old ?o FILTER(?o != 3) } } ;
      |INSERT DATA { ex:a ex:b "c"@en-US . GRAPH ex:g { ex:d ex:e 1 } } ;
      |COPY SILENT GRAPH ex:g TO DEFAULT
      |""".stripMargin

  /** The closed, documented rejection set (same as W3cRdfSyntaxSpec's
    * negative runner). */
  private def documented(t: Throwable): Boolean = t match {
    case _: GraftException => true
    case _: graft.sparql.SparqlParseException => true
    case _: graft.sources.RdfXml.RdfXmlParseException => true
    case _: graft.sources.JsonLd.JsonLdParseException => true
    case _: IllegalArgumentException => true
    case _ => false
  }

  private val interesting =
    "{}[]<>\"'@\\.;,()#%&^`|*+?$=:_- \n\t0123456789aZé中😀"

  private def mutate(doc: String, rnd: Random): String = {
    val sb = new StringBuilder(doc)
    val edits = 1 + rnd.nextInt(3)
    (1 to edits).foreach { _ =>
      if (sb.isEmpty) ()
      else rnd.nextInt(5) match {
        case 0 => // replace one char
          sb.setCharAt(rnd.nextInt(sb.length),
            interesting.charAt(rnd.nextInt(interesting.length)))
        case 1 => // delete a short span
          val at = rnd.nextInt(sb.length)
          sb.delete(at, math.min(sb.length, at + 1 + rnd.nextInt(3)))
        case 2 => // insert an interesting char
          sb.insert(rnd.nextInt(sb.length + 1),
            interesting.charAt(rnd.nextInt(interesting.length)))
        case 3 => // truncate
          sb.setLength(rnd.nextInt(sb.length + 1))
        case 4 => // duplicate a span elsewhere
          val from = rnd.nextInt(sb.length)
          val span = sb.substring(from,
            math.min(sb.length, from + 1 + rnd.nextInt(8)))
          sb.insert(rnd.nextInt(sb.length + 1), span)
      }
    }
    sb.toString
  }

  private def fuzz(name: String, doc: String, rounds: Int)
      (parse: String => Any): Unit =
    test(s"$name: $rounds mutations either parse or raise the documented rejection") {
      val rnd = new Random(name.hashCode ^ 20260815)
      var rejected = 0
      (1 to rounds).foreach { i =>
        val mutated = mutate(doc, rnd)
        try parse(mutated)
        catch {
          case t: Throwable if documented(t) => rejected += 1
          case t: Throwable =>
            fail(s"$name mutation $i leaked ${t.getClass.getName}: " +
              s"${t.getMessage}\n--- input:\n$mutated", t)
        }
      }
      // sanity: the fuzz actually exercises the reject path
      assert(rejected > rounds / 10, s"only $rejected rejections — " +
        "mutations too tame?")
    }

  private val rounds =
    sys.env.get("GRAFT_FUZZ_ROUNDS").map(_.toInt).getOrElse(400)

  fuzz("turtle", turtleDoc, rounds)(graft.sources.Turtle.parseTriples(_))
  fuzz("trig", trigDoc, rounds)(graft.sources.Trig.parseQuads(_))
  fuzz("jsonld", jsonldDoc, rounds)(graft.sources.JsonLd.parseQuads(_))
  fuzz("rdfxml", rdfxmlDoc, rounds)(graft.sources.RdfXml.parseTriples(_))
  fuzz("sparql-query", sparqlQuery, rounds)(
    new graft.sparql.Parser(Map.empty).parseQuery(_))
  fuzz("sparql-update", sparqlUpdate, rounds)(
    new graft.sparql.Parser(Map.empty).parseUpdate(_))

  private val ntLine =
    """<http://example.com/s> <http://example.com/p> "esc \"q\" A tab\t x"@en-US ."""
  private val nqLine =
    """_:b1 <http://example.com/p> "1.5"^^<http://www.w3.org/2001/XMLSchema#decimal> <http://example.com/g> ."""

  // the 100 TB ingest path: one mutated line, strict mode — the ONLY
  // allowed failure is the documented GraftException naming the line
  fuzz("ntriples-line", ntLine, rounds)(
    graft.sources.NTriples.parseLineChecked(_, lenient = false))
  fuzz("nquads-line", nqLine, rounds)(
    graft.sources.NQuads.parseLineChecked(_, lenient = false))

  test("lenient line mode NEVER throws — it drops, whatever the corruption") {
    val rnd = new Random(99)
    (1 to rounds).foreach { _ =>
      graft.sources.NTriples.parseLineChecked(mutate(ntLine, rnd),
        lenient = true)
      graft.sources.NQuads.parseLineChecked(mutate(nqLine, rnd),
        lenient = true)
    }
  }
}
