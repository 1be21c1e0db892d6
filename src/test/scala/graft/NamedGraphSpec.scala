package graft

import graft.rdf._

/** Named-graph surface: quad stores (g column), GRAPH patterns binding
  * or naming the graph, FROM / FROM NAMED dataset clauses, and the
  * triple-store degenerations (no named graphs → GRAPH matches nothing).
  * Mirrors SPARQL 1.1 §13 dataset semantics on the quad data model
  * (VERDICT r7 task 6). */
class NamedGraphSpec extends SparkSpec {

  private val ex = "http://example.org/"
  private def iri(s: String) = Iri(ex + s)

  /** default graph: labels of the two graph IRIs; g1: alice knows bob,
    * bob name "Bob"; g2: carol name "Carol". */
  private lazy val quadEngine: Engine = Engine.fromGraph(RdfGraph.fromQuads(
    spark,
    Seq(
      (iri("g1"), iri("label"), Lit.plain("graph one"), None),
      (iri("g2"), iri("label"), Lit.plain("graph two"), None),
      (iri("alice"), iri("knows"), iri("bob"), Some(iri("g1"))),
      (iri("bob"), iri("name"), Lit.plain("Bob"), Some(iri("g1"))),
      (iri("carol"), iri("name"), Lit.plain("Carol"), Some(iri("g2")))),
    Map("ex" -> ex)))

  test("GRAPH ?g binds the graph name; patterns co-bind inside one graph") {
    val rows = quadEngine.select(
      "SELECT ?g ?s ?n WHERE { GRAPH ?g { ?s ex:name ?n } } ORDER BY ?n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("ex:g1", "ex:bob", "Bob"),
      ("ex:g2", "ex:carol", "Carol")))
    // two patterns under one GRAPH ?g must land in the SAME graph:
    // alice knows bob (g1) and carol's name (g2) never co-occur
    val crossed = quadEngine.select(
      "SELECT ?g WHERE { GRAPH ?g { ex:alice ex:knows ?x . ?y ex:name \"Carol\" } }")
    assert(crossed.count() == 0)
    val same = quadEngine.select(
      "SELECT ?g ?n WHERE { GRAPH ?g { ex:alice ex:knows ?x . ?x ex:name ?n } }")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(same.toSeq == Seq(("ex:g1", "Bob")))
  }

  test("GRAPH <iri> scopes to that graph; default graph excludes named triples") {
    val g2 = quadEngine.select(
      "SELECT ?n WHERE { GRAPH ex:g2 { ?s ex:name ?n } }")
      .collect().map(_.getString(0))
    assert(g2.toSeq == Seq("Carol"))
    // the default graph holds only the labels
    val dflt = quadEngine.select("SELECT ?s ?o WHERE { ?s ex:label ?o }")
    assert(dflt.count() == 2)
    val dfltNames = quadEngine.select("SELECT ?n WHERE { ?s ex:name ?n }")
    assert(dfltNames.count() == 0)
  }

  test("default graph joins against GRAPH ?g bindings (metadata join)") {
    val rows = quadEngine.select(
      "SELECT ?l ?n WHERE { ?g ex:label ?l . GRAPH ?g { ?s ex:name ?n } } ORDER BY ?n")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("graph one", "Bob"), ("graph two", "Carol")))
  }

  test("FROM merges named graphs into the default graph") {
    val both = quadEngine.select(
      "SELECT ?n FROM ex:g1 FROM ex:g2 WHERE { ?s ex:name ?n } ORDER BY ?n")
      .collect().map(_.getString(0))
    assert(both.toSeq == Seq("Bob", "Carol"))
    val one = quadEngine.select(
      "SELECT ?n FROM ex:g2 WHERE { ?s ex:name ?n }")
      .collect().map(_.getString(0))
    assert(one.toSeq == Seq("Carol"))
    // with a dataset clause, the store's own default graph is hidden
    val labels = quadEngine.select(
      "SELECT ?l FROM ex:g1 WHERE { ?g ex:label ?l }")
    assert(labels.count() == 0)
  }

  test("FROM NAMED restricts the graphs GRAPH ranges over") {
    val restricted = quadEngine.select(
      "SELECT ?g ?n FROM NAMED ex:g1 WHERE { GRAPH ?g { ?s ex:name ?n } }")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(restricted.toSeq == Seq(("ex:g1", "Bob")))
    // GRAPH <iri> outside the FROM NAMED set is empty
    val outside = quadEngine.select(
      "SELECT ?n FROM NAMED ex:g1 WHERE { GRAPH ex:g2 { ?s ex:name ?n } }")
    assert(outside.count() == 0)
    // FROM NAMED without FROM → default graph is empty
    val noDefault = quadEngine.select(
      "SELECT ?l FROM NAMED ex:g1 WHERE { ?g ex:label ?l }")
    assert(noDefault.count() == 0)
  }

  test("ASK and CONSTRUCT honor GRAPH and dataset clauses") {
    assert(quadEngine.ask("ASK { GRAPH ex:g1 { ex:alice ex:knows ex:bob } }"))
    assert(!quadEngine.ask("ASK { GRAPH ex:g2 { ex:alice ex:knows ex:bob } }"))
    assert(!quadEngine.ask("ASK { ex:alice ex:knows ex:bob }")) // default graph
    val g = quadEngine.construct(
      "CONSTRUCT { ?s ex:called ?n } WHERE { GRAPH ?g { ?s ex:name ?n } }")
    assert(g.size == 2)
  }

  test("a triple-only store has no named graphs: GRAPH and FROM match nothing") {
    val e = Engine.fromGraph(RdfGraph.fromTriples(spark,
      Seq((iri("a"), iri("p"), iri("b"))), Map("ex" -> ex)))
    assert(e.select("SELECT ?g ?s WHERE { GRAPH ?g { ?s ?p ?o } }").count() == 0)
    assert(e.select("SELECT ?s FROM ex:g1 WHERE { ?s ?p ?o }").count() == 0)
    assert(e.select("SELECT ?s WHERE { ?s ?p ?o }").count() == 1)
  }

  test("DESCRIBE/peel and decollect range over the DEFAULT graph on a " +
      "quad store (named graphs stay behind GRAPH queries)") {
    // DESCRIBE g1 must return its default-graph label triple only —
    // not the named graph g1's content
    val d = quadEngine.describe(s"DESCRIBE <${ex}g1>")
    assert(!d.isQuads)
    val got = d.triples.collect().map(r =>
      (r.getStruct(0).getString(1), r.getStruct(2).getString(1))).toSet
    assert(got == Set((ex + "g1", "graph one")), got)
    // an rdf:Seq probed by decollect sees default-graph members only
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val e = Engine.fromGraph(RdfGraph.fromQuads(spark, Seq(
      (iri("seq"), Iri(rdfNs + "type"), Iri(rdfNs + "Seq"), None),
      (iri("seq"), Iri(rdfNs + "_1"), Lit.plain("first"), None),
      (iri("seq"), Iri(rdfNs + "_2"), Lit.plain("phantom"),
        Some(iri("g1"))))))
    assert(e.decollect(iri("seq")) == Seq("first"))
  }

  test("UPDATE on a quad store: inserts and deletes hit the default graph only") {
    val e = Engine.fromGraph(RdfGraph.fromQuads(spark,
      Seq(
        (iri("x"), iri("p"), Lit.plain("named"), Some(iri("g1"))),
        (iri("x"), iri("p"), Lit.plain("default"), None)),
      Map("ex" -> ex)))
    e.update("INSERT DATA { ex:y ex:p \"fresh\" }")
    assert(e.select("SELECT ?o WHERE { ex:y ex:p ?o }").count() == 1)
    assert(e.select("SELECT ?o WHERE { GRAPH ex:g1 { ?s ex:p ?o } }").count() == 1)
    // delete by pattern removes the default-graph row, not g1's
    e.update("DELETE WHERE { ex:x ex:p ?o }")
    assert(e.select("SELECT ?o WHERE { ex:x ex:p ?o }").count() == 0)
    assert(e.select("SELECT ?o WHERE { GRAPH ex:g1 { ?s ex:p ?o } }").count() == 1)
  }

  test("property path inside GRAPH ?var evaluates per named graph") {
    // hops confined to ONE graph per solution, the variable bound to it
    // (compiled as the per-name union — perGraphUnion)
    val rows = quadEngine.select(
      "SELECT ?g ?x WHERE { GRAPH ?g { ex:alice ex:knows+ ?x } }")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("ex:g1", "ex:bob")))
    // a path anchored at a node of ANOTHER graph finds nothing there
    val none = quadEngine.select(
      "SELECT ?g ?x WHERE { GRAPH ?g { ex:carol ex:knows+ ?x } }").collect()
    assert(none.isEmpty)
    // constant graph scope composes fine with paths
    val ok = quadEngine.select(
      "SELECT ?x WHERE { GRAPH ex:g1 { ex:alice ex:knows+ ?x } }")
      .collect().map(_.getString(0))
    assert(ok.toSeq == Seq("ex:bob"))
  }

  test("quad round-trip through parquet keeps graph scoping") {
    val path = java.nio.file.Files.createTempDirectory("graft_quads").toString
    quadEngine.graph.triples.write.mode("overwrite").parquet(path)
    val loaded = Engine.fromGraph(RdfGraph.fromQuadFrame(
      spark.read.parquet(path), Map("ex" -> ex)))
    val rows = loaded.select(
      "SELECT ?l ?n WHERE { ?g ex:label ?l . GRAPH ?g { ?s ex:name ?n } } ORDER BY ?n")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("graph one", "Bob"), ("graph two", "Carol")))
  }
}
