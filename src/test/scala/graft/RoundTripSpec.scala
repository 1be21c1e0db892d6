package graft

import graft.rdf._

/** Display→query round-trip: a QName-shortened value copied out of a
  * result frame must re-substitute as the IRI it displays (the
  * reference's GastrodonURI str-subclass, gastrodon/__init__.py:54-75;
  * exercised in DBpedia_Schema_Queries.ipynb cells 23-29), and ALL
  * query-time errors surface as notebook-friendly GraftExceptions with
  * the query text (gastrodon/__init__.py:536-594). */
class RoundTripSpec extends SparkSpec {

  private val ttl =
    """
      @prefix : <http://example.com/> .
      :Brooklyn :pop 2576771 .
      :Queens :pop 2270976 .
    """

  private def fresh(): Engine = {
    val e = Engine.inline(ttl)
    e.bindNamespace("", "http://example.com/")
    e
  }

  test("pasted display QName resolves to the full IRI in bindings") {
    val e = fresh()
    val displayed = e.select("SELECT ?b { ?b :pop ?p } ORDER BY ?b")
      .collect()(0).getString(0)
    assert(displayed == ":Brooklyn") // shortened form, as the user sees it
    val pop = Engine.one(e.select(
      "SELECT ?p { ?_b :pop ?p }", Map("b" -> displayed)))
    assert(pop == 2576771L)
  }

  test("pasted prefixed QName from a non-default namespace resolves") {
    val e = fresh()
    e.bindNamespace("ex", "http://example.com/")
    assert(e.toTerm("ex:Queens") == Iri("http://example.com/Queens"))
  }

  test("colon strings with unbound prefixes stay plain literals") {
    val e = fresh()
    assert(e.toTerm("12:30") == Lit.plain("12:30"))
    assert(e.toTerm("urn:other:thing") == Iri("urn:other:thing"))
    assert(e.toTerm("http://x.org/y") == Iri("http://x.org/y"))
    // displayed blank-node labels round-trip as blank nodes
    assert(e.toTerm("_:b0") == Blank("b0"))
  }

  test("bound-prefix strings that display could not have produced stay literals") {
    val e = fresh()
    e.bindNamespace("label", "http://example.com/label/")
    // local part not PN_LOCAL-shaped → a genuine literal, not a QName
    assert(e.toTerm("label: value") == Lit.plain("label: value"))
    assert(e.toTerm("label:a/b") == Lit.plain("label:a/b"))
    assert(e.toTerm("label:") == Lit.plain("label:"))
    // the same prefix with a QName-shaped local still resolves
    assert(e.toTerm("label:v1") == Iri("http://example.com/label/v1"))
  }

  test("GraftUri forces an IRI and Lit.plain forces a literal (escape hatches)") {
    val e = fresh()
    // not QName-shaped and not http/urn — the wrapper still makes it an IRI
    assert(e.toTerm(GraftUri("mailto:a@b.c")) == Iri("mailto:a@b.c"))
    // QName-shaped string a user wants bound as a literal
    e.bindNamespace("ex", "http://example.com/")
    assert(e.toTerm(Lit.plain("ex:Queens")) == Lit.plain("ex:Queens"))
  }

  test("unknown IRI function surfaces as GraftException with query text") {
    val q = "SELECT ?x { ?b :pop ?p BIND(<http://no.such/fn>(?p) AS ?x) }"
    val err = intercept[GraftException] { fresh().select(q) }
    assert(err.getMessage.contains("no.such/fn"))
    assert(err.getMessage.contains("In query:"))
  }

  test("unsupported CONSTRUCT template surfaces with query text") {
    val q = "CONSTRUCT { ?a :p/:q ?b } WHERE { ?a :pop ?b }"
    val err = intercept[GraftException] { fresh().construct(q) }
    assert(err.getMessage.contains("In query:"))
  }

  test("parse errors keep the caret rendering") {
    val err = intercept[GraftException] {
      fresh().select("SELECT ?x { ?x :pop ")
    }
    assert(err.getMessage.contains("^"))
  }
}
