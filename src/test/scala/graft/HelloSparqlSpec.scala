package graft

import graft.rdf._

/** The reference's "hello world": the NYC boroughs Turtle document and its
  * first queries (notebooks/local/RDFContainers.ipynb cells 5-15).
  * Expected values are the committed notebook outputs. */
class HelloSparqlSpec extends SparkSpec {

  // notebooks/local/RDFContainers.ipynb cell 5 (~:230)
  val boroughsTtl: String =
    """
      @prefix : <http://example.com/> .
      :New_York_City :boro :Manhattan , :Brooklyn , :The_Bronx , :Queens , :Staten_Island .
    """

  lazy val engine: Engine = {
    val e = Engine.inline(boroughsTtl)
    e.bindNamespace("", "http://example.com/")
    e
  }

  test("turtle parse: 5 triples") {
    assert(engine.graph.size == 5)
  }

  test("single BGP + ORDER BY returns boroughs sorted") {
    val df = engine.select(
      "SELECT ?boro { :New_York_City :boro ?boro } ORDER BY ?boro")
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == Seq(":Brooklyn", ":Manhattan", ":Queens",
      ":Staten_Island", ":The_Bronx"))
  }

  test("set semantics: re-asserting a triple is idempotent") {
    val e2 = Engine.inline(boroughsTtl)
    e2.update("PREFIX : <http://example.com/> " +
      "INSERT DATA { :New_York_City :boro :Manhattan }")
    assert(e2.graph.size == 5)
  }

  test("COUNT(*) global aggregate") {
    val n = Engine.one(engine.select("SELECT (COUNT(*) AS ?n) { ?s ?p ?o }"))
    assert(n == 5L)
  }

  test("parameter substitution: ?_b as constant") {
    val df = engine.select(
      "SELECT ?s { ?s :boro ?_b }",
      Map("b" -> Iri("http://example.com/Queens")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq(":New_York_City"))
  }

  test("ASK") {
    assert(engine.ask("ASK { :New_York_City :boro :Queens }"))
    assert(!engine.ask("ASK { :New_York_City :boro :Chicago }"))
  }

  test("parse error renders caret") {
    val e = intercept[GraftException] {
      engine.select("SELECT ?x { ?x :boro ?y")
    }
    assert(e.getMessage.contains("^"))
  }

  test("PN_PREFIX forbids a trailing dot (PREFIX decl and PNAME use)") {
    // grammar: PN_PREFIX ::= PN_CHARS_BASE ((PN_CHARS | '.')* PN_CHARS)?
    // — dots only INSIDE, so `ex.:x` / `PREFIX ex.:` must be rejected
    intercept[GraftException] {
      engine.select("PREFIX ex.: <http://e/> SELECT ?x { ?x ex.:p ?y }")
    }
    intercept[GraftException] {
      engine.select("SELECT ?x { ?x ex.:p ?y }")
    }
    // dots INSIDE a prefix label stay legal
    val ok = engine.select(
      "PREFIX e.x: <http://example.com/> SELECT ?b { :New_York_City e.x:boro ?b }")
    assert(ok.count() == 5)
  }
}
