package graft

import org.apache.spark.sql.{functions => F}
import graft.rdf.Iri

/** Golden tests against the reference's committed DBpedia 2015-10 ontology
  * fixture (notebooks/local/data/dbpedia_2015-10.nt.gz — 30,318 triples).
  * Every expected value below is a COMMITTED cell output of
  * notebooks/local/DBpedia_Schema_Queries.ipynb (cell numbers cited). */
class DBpediaGoldenSpec extends SparkSpec {

  private lazy val engine: Engine = {
    val g = sources.NTriples.read(spark,
      "/root/reference/notebooks/local/data/dbpedia_2015-10.nt.gz")
    Engine.fromGraph(g.cache()
      .withPrefix("dbo", "http://dbpedia.org/ontology/")
      .withPrefix("dcterms", "http://purl.org/dc/terms/")
      .withPrefix("prov", "http://www.w3.org/ns/prov#")
      .withPrefix("dul", "http://www.ontologydesignpatterns.org/ont/dul/DUL.owl#")
      .withPrefix("type", "http://dbpedia.org/datatype/"))
  }

  test("graph loads 30,318 triples (cell 6)") {
    assert(engine.graph.size == 30318L)
  }

  test("predicate histogram: rdfs:label 11645, rdf:type 6681 (cell 13)") {
    val top = engine.select(
      """SELECT ?p (COUNT(*) AS ?cnt) { ?s ?p ?o }
         GROUP BY ?p ORDER BY DESC(?cnt) LIMIT 2""").collect()
    assert(top(0).getString(0) == "rdfs:label" && top(0).getLong(1) == 11645L)
    assert(top(1).getString(0) == "rdf:type" && top(1).getLong(1) == 6681L)
  }

  test("GROUP BY LANG(?label): en 3953, de 2049 (cell 40)") {
    val rows = engine.select(
      """SELECT (LANG(?label) AS ?lang) (COUNT(*) AS ?cnt) {
           ?s rdfs:label ?label
         } GROUP BY LANG(?label) ORDER BY DESC(?cnt) LIMIT 2""").collect()
    assert(rows(0).getString(0) == "en" && rows(0).getLong(1) == 3953L)
    assert(rows(1).getString(0) == "de" && rows(1).getLong(1) == 2049L)
  }

  test("COUNT(DISTINCT ?s) over labels = 3954 (cell 44)") {
    val n = Engine.one(engine.select(
      "SELECT (COUNT(DISTINCT ?s) AS ?cnt) { ?s rdfs:label ?o }"))
    assert(n == 3954L)
  }

  test("NOT EXISTS black sheep is dbo:hasSurfaceForm (cell 46)") {
    val s = Engine.one(engine.select(
      """SELECT ?s { ?s rdfs:label ?o
           FILTER NOT EXISTS { ?s rdfs:label ?o2 . FILTER(LANG(?o2)='en') } }"""))
    assert(s == "dbo:hasSurfaceForm")
  }

  test("subClassOf* closure of dbo:Painter (cells 79-80)") {
    val up = engine.select(
      "SELECT ?type { dbo:Painter rdfs:subClassOf* ?type }")
      .collect().map(_.getString(0)).toSet
    assert(up == Set("dbo:Painter", "dbo:Artist", "dbo:Person", "dbo:Agent",
      "owl:Thing"))
    // inverse-star from the constant end reaches the same set
    val inv = engine.select(
      "SELECT ?type { ?type ^rdfs:subClassOf* dbo:Painter }")
      .collect().map(_.getString(0)).toSet
    assert(inv == up)
  }

  test("FILTER IN property-kind counts: 2695 / 1734 / 1099 (cell 115)") {
    val rows = engine.select(
      """SELECT ?type (COUNT(*) AS ?cnt) {
           ?s a ?type
           FILTER (?type IN (rdf:Property, owl:DatatypeProperty, owl:ObjectProperty))
         } GROUP BY ?type ORDER BY DESC(?cnt)""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("rdf:Property", 2695L), ("owl:DatatypeProperty", 1734L),
      ("owl:ObjectProperty", 1099L)))
  }

  test("every rdf:Property is a Datatype- or Object-property (cell 124, MINUS of UNION)") {
    val df = engine.select(
      """SELECT ?p { ?p a rdf:Property
           MINUS { { ?p a owl:DatatypeProperty } UNION { ?p a owl:ObjectProperty } } }""")
    assert(df.count() == 0)
  }

  test("no property is both datatype and object property (cell 119)") {
    val df = engine.select(
      "SELECT ?k { ?k a owl:DatatypeProperty . ?k a owl:ObjectProperty }")
    assert(df.count() == 0)
  }

  test("datatype star pattern: rdf:type 382, rdfs:label 382 (cell 105)") {
    val rows = engine.select(
      """SELECT ?p (COUNT(*) AS ?cnt) { ?s a rdfs:Datatype . ?s ?p ?o }
         GROUP BY ?p ORDER BY ?p""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet == Set(
      ("rdf:type", 382L), ("rdfs:label", 382L)))
  }

  test("parameter substitution pre-filters (cell 29 shape)") {
    val df = engine.select(
      "SELECT ?s ?o { ?s ?_p ?o }",
      bindings = Map("p" -> Iri("http://purl.org/dc/terms/source")))
    assert(df.count() == 1)
  }
}
