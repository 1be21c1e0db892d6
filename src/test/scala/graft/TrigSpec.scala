package graft

import graft.rdf._
import graft.sources.Trig

/** TriG reader/writer ([[graft.sources.Trig]]): all four statement
  * shapes of the grammar, GRAPH scoping through the engine after a
  * parse, the serialize→parse fixpoint, and the Turtle degeneration
  * for triple-only stores. */
class TrigSpec extends SparkSpec {

  private val ex = "http://example.org/"
  private def iri(s: String) = Iri(ex + s)

  private val doc = s"""
    @prefix ex: <$ex> .
    # default graph, bare Turtle statement
    ex:g1 ex:label "graph one" .
    # default graph, wrapped block
    { ex:g2 ex:label "graph two" . }
    # named graph, GRAPH keyword
    GRAPH ex:g1 {
      ex:alice ex:knows ex:bob .
      ex:bob ex:name "Bob" .
    }
    # named graph, bare label form; trailing dot optional
    ex:g2 { ex:carol ex:name "Carol" }
    # blank-node graph label
    _:b0 { ex:dave ex:name "Dave" . }
  """

  private def quadSet(g: RdfGraph): Set[(String, String, String, String)] =
    g.triples.collect().map { r =>
      def v(i: Int) = if (r.isNullAt(i)) "" else r.getStruct(i).getString(1)
      (v(0), v(1), v(2), v(3))
    }.toSet

  test("parse: every statement shape lands in the right graph") {
    val g = Trig.parse(doc, spark)
    assert(g.isQuads)
    assert(quadSet(g) === Set(
      (ex + "g1", ex + "label", "graph one", ""),
      (ex + "g2", ex + "label", "graph two", ""),
      (ex + "alice", ex + "knows", ex + "bob", ex + "g1"),
      (ex + "bob", ex + "name", "Bob", ex + "g1"),
      (ex + "carol", ex + "name", "Carol", ex + "g2"),
      (ex + "dave", ex + "name", "Dave", "b0")))
  }

  test("parsed store answers GRAPH queries") {
    val engine = Engine.fromGraph(Trig.parse(doc, spark))
    val rows = engine.select(
      "SELECT ?g ?n WHERE { GRAPH ?g { ?s ex:name ?n } } ORDER BY ?n")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(
      ("ex:g1", "Bob"), ("ex:g2", "Carol"), ("_:b0", "Dave")))
    val dflt = engine.select("SELECT ?l WHERE { ?s ex:label ?l } ORDER BY ?l")
      .collect().map(_.getString(0))
    assert(dflt.toSeq === Seq("graph one", "graph two"))
  }

  test("serialize -> parse is a fixpoint on the quad set") {
    val g = RdfGraph.fromQuads(spark, Seq(
      (iri("s1"), iri("p"), Lit.plain("v1"), None),
      (iri("s1"), iri("q"), Lit.typed("7",
        "http://www.w3.org/2001/XMLSchema#integer"), None),
      (iri("s2"), iri("p"), iri("o2"), Some(iri("gA"))),
      (iri("s3"), iri("p"), Lit.tagged("hallo", "de"), Some(iri("gB")))),
      Map("ex" -> ex))
    val text = Trig.serialize(g)
    assert(text.contains("ex:gA {") && text.contains("ex:gB {"))
    val back = Trig.parse(text, spark)
    assert(quadSet(back) === quadSet(g))
  }

  test("triple-only store serializes as pure Turtle (still valid TriG)") {
    val g = RdfGraph.fromTriples(spark,
      Seq((iri("s"), iri("p"), Lit.plain("v"))), Map("ex" -> ex))
    val text = Trig.serialize(g)
    assert(!text.contains("{"))
    // both readers accept it and agree
    assert(quadSet(Trig.parse(text, spark)) ===
      Set((ex + "s", ex + "p", "v", "")))
    val viaTurtle = graft.sources.Turtle.parse(text, spark)
    assert(viaTurtle.triples.count() === 1)
  }

  test("hostile input: parse throws cleanly, never hangs") {
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 150) {
      val junk = (0 until rnd.nextInt(60)).map(_ =>
        "<>{}.;@prefixGRAPH:_ \"a".charAt(rnd.nextInt(23))).mkString
      try { Trig.parse(junk, spark); () }
      catch {
        case _: graft.sparql.SparqlParseException => ()
        case _: IllegalArgumentException => ()
      }
    }
  }

  test("parse errors carry position context") {
    val e = intercept[graft.sparql.SparqlParseException] {
      Trig.parse("GRAPH ex:g ex:not-a-block", spark,
        Map("ex" -> ex))
    }
    assert(e.getMessage.nonEmpty)
  }
}
