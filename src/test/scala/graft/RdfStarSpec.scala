package graft

import graft.rdf._

/** RDF-star / SPARQL 1.2 quoted triples (public W3C WG drafts): Turtle-star
  * data terms, SPARQL-star patterns with variables, the
  * TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE builtins, CONSTRUCT-star
  * templates, nesting, serializer round-trip, and the packed-encoding
  * escape corners. */
class RdfStarSpec extends SparkSpec {

  private val ttl =
    """@prefix : <http://example/> .
      << :alice :age 30 >> :certainty 0.9e0 .
      << :alice :age 30 >> :statedBy :census .
      << :bob :age 23 >> :certainty 0.4e0 .
      :alice :age 30 .
    """
  private lazy val e: Engine = Engine.inline(ttl)

  test("Turtle-star parses quoted-triple subjects; terms are set-deduped") {
    assert(e.graph.size === 4)
  }

  test("quoted pattern with variables binds the components") {
    val rows = e.selectRaw(
      """PREFIX : <http://example/>
         SELECT ?who ?age ?c WHERE { << ?who :age ?age >> :certainty ?c }""")
      .collect().map(r => (r.getStruct(0).getString(1),
        r.getStruct(1).getString(1), r.getStruct(2).getString(1))).toSet
    assert(rows === Set(
      ("http://example/alice", "30", "0.9e0"),
      ("http://example/bob", "23", "0.4e0")))
  }

  test("fully concrete quoted term matches as a constant") {
    assert(e.ask(
      """PREFIX : <http://example/>
         ASK { << :alice :age 30 >> :statedBy :census }"""))
    assert(!e.ask(
      """PREFIX : <http://example/>
         ASK { << :bob :age 23 >> :statedBy :census }"""))
  }

  test("repeated variable inside and outside the quote joins") {
    // the asserted :alice :age 30 triple must join with the quoted one
    val rows = e.select(
      """PREFIX : <http://example/>
         SELECT ?who WHERE { ?who :age ?a . << ?who :age ?a >> :certainty ?c }""")
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq(":alice"))
  }

  test("TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE builtins") {
    val df = e.selectRaw(
      """PREFIX : <http://example/>
         SELECT ?s ?p ?o ?isq ?isq2 ?same WHERE {
           ?t :certainty ?c . FILTER(?c > 0.5)
           BIND(SUBJECT(?t) AS ?s) BIND(PREDICATE(?t) AS ?p)
           BIND(OBJECT(?t) AS ?o)
           BIND(isTRIPLE(?t) AS ?isq) BIND(isTRIPLE(?s) AS ?isq2)
           BIND(sameTerm(TRIPLE(?s, ?p, ?o), ?t) AS ?same)
         }""").collect()
    assert(df.length === 1)
    val r = df.head
    assert(r.getStruct(0).getString(1) === "http://example/alice")
    assert(r.getStruct(1).getString(1) === "http://example/age")
    assert(r.getStruct(2).getString(1) === "30")
    assert(r.getStruct(3).getString(1) === "true")
    assert(r.getStruct(4).getString(1) === "false")
    assert(r.getStruct(5).getString(1) === "true")
  }

  test("TRIPLE errors on a non-IRI predicate or unbound component") {
    val r = e.selectRaw(
      """PREFIX : <http://example/>
         SELECT ?bad ?unb WHERE {
           BIND(TRIPLE(:s, "notiri", :o) AS ?bad)
           BIND(TRIPLE(:s, ?nope, :o) AS ?unb)
         }""").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("nested quoted triples round-trip through the encoding") {
    val nested = Engine.inline(
      """@prefix : <http://example/> .
        << << :a :p :b >> :q :c >> :meta "outer" .
      """)
    val rows = nested.selectRaw(
      """PREFIX : <http://example/>
         SELECT ?inner ?m WHERE { << ?inner :q :c >> :meta ?m }""").collect()
    assert(rows.length === 1)
    val inner = rows.head.getStruct(0)
    assert(inner.getByte(0) === Terms.KIND_TRIPLE)
    assert(Terms.unpackString(inner.getString(1)) ===
      QuotedTriple(Iri("http://example/a"), Iri("http://example/p"),
        Iri("http://example/b")))
  }

  test("packed encoding survives '%' and the separator char in literals") {
    val hostile = "100%  sep%1F%25"
    val q = QuotedTriple(Iri("http://example/s"), Iri("http://example/p"),
      Lit.plain(hostile))
    val rt = Terms.unpackString(Terms.packString(q))
    assert(rt === q)
    // and through a real graph + query
    val g = Engine.fromGraph(RdfGraph.fromTriples(spark, Seq(
      (q, Iri("http://example/sure"), Lit.plain("yes")))))
    val got = g.selectRaw(
      """SELECT ?o WHERE { << ?s <http://example/p> ?o >> <http://example/sure> "yes" }""")
      .collect().head.getStruct(0)
    assert(got.getString(1) === hostile)
  }

  test("CONSTRUCT-star builds quoted terms from bindings") {
    val out = e.construct(
      """PREFIX : <http://example/>
         CONSTRUCT { << ?w :age ?a >> :confirmed true }
         WHERE { ?w :age ?a . FILTER(?w = :alice) }""")
    assert(out.size === 1)
    val s = out.triples.collect().head.getStruct(0)
    assert(s.getByte(0) === Terms.KIND_TRIPLE)
    assert(Terms.unpackString(s.getString(1)).s === Iri("http://example/alice"))
  }

  test("INSERT DATA with a quoted triple; ttl round-trips it") {
    val e2 = Engine.inline("@prefix : <http://example/> . :x :p :y .")
    e2.update(
      """PREFIX : <http://example/>
         INSERT DATA { << :x :p :y >> :source :manual }""")
    assert(e2.graph.size === 2)
    val text = e2.ttl()
    assert(text.contains("<<"), text)
    val re = Engine.inline(text)
    assert(re.graph.size === 2)
    assert(re.ask(
      """PREFIX : <http://example/>
         ASK { << :x :p :y >> :source :manual }"""))
  }

  test("INSERT WHERE with a quoted-triple template (variables inside)") {
    val e2 = Engine.inline(
      """@prefix : <http://example/> .
        |:x :p :y . :x :p :z .
        |""".stripMargin)
    e2.update(
      """PREFIX : <http://example/>
         INSERT { << :x :p ?o >> :derived true }
         WHERE { :x :p ?o }""")
    assert(e2.graph.size === 4)
    val rows = e2.select(
      """PREFIX : <http://example/>
         SELECT ?o WHERE { << :x :p ?o >> :derived true } ORDER BY ?o""")
      .collect()
    assert(rows.map(_.get(0).toString).toSeq === Seq(":y", ":z"))
  }

  test("display renders quoted terms as << s p o >>") {
    val df = e.select(
      """PREFIX : <http://example/>
         SELECT ?t WHERE { ?t :statedBy :census }""")
    val shown = df.collect().head.getString(0)
    assert(shown.startsWith("<< ") && shown.endsWith(" >>"), shown)
    assert(shown.contains("alice"))
  }

  test("annotation syntax {| … |} asserts the triple AND annotates its quote") {
    val g = Engine.inline(
      """@prefix : <http://example/> .
        :alice :age 30 {| :certainty 0.9e0 ; :statedBy :census |} .
        :bob :age 23 .
      """)
    // 2 asserted triples + 2 annotation triples
    assert(g.graph.size === 4)
    assert(g.ask(
      """PREFIX : <http://example/> ASK { :alice :age 30 }"""))
    assert(g.ask(
      """PREFIX : <http://example/>
         ASK { << :alice :age 30 >> :statedBy :census }"""))
    // annotation does NOT assert anything about the un-annotated triple
    assert(!g.ask(
      """PREFIX : <http://example/>
         ASK { << :bob :age 23 >> ?p ?o }"""))
  }

  test("annotation nests and composes with object lists") {
    val g = Engine.inline(
      """@prefix : <http://example/> .
        :a :p :b {| :src :s1 {| :conf 0.5e0 |} |} , :c .
      """)
    // :a :p :b ; :a :p :c ; <<:a :p :b>> :src :s1 ;
    // << <<:a :p :b>> :src :s1 >> :conf 0.5
    assert(g.graph.size === 4)
    assert(g.ask(
      """PREFIX : <http://example/>
         ASK { << << :a :p :b >> :src :s1 >> :conf 0.5e0 }"""))
    assert(g.ask("PREFIX : <http://example/> ASK { :a :p :c }"))
  }

  test("annotation works in SPARQL query patterns (binds both layers)") {
    val rows = e.selectRaw(
      """PREFIX : <http://example/>
         SELECT ?who ?c WHERE { ?who :age 30 {| :certainty ?c |} }""")
      .collect().map(r => (r.getStruct(0).getString(1),
        r.getStruct(1).getString(1))).toSet
    // requires BOTH the asserted triple and the annotation: only alice
    // has :age 30 asserted AND quoted-with-certainty
    assert(rows === Set(("http://example/alice", "0.9e0")))
  }

  test("Turtle-star accepts a labeled blank node inside a quoted triple") {
    val g = Engine.inline(
      """@prefix : <http://example/> .
        << _:b :p 1 >> :q 2 .
        << :s :p << _:b :r 3 >> >> :q 4 .
        _:b :name "node b" .
      """)
    assert(g.graph.size === 3)
    // the blank node in the quote and the asserted one are the SAME label
    val rows = g.selectRaw(
      """PREFIX : <http://example/>
         SELECT ?n WHERE { << ?b :p 1 >> :q 2 . ?b :name ?n }""")
      .collect().map(_.getStruct(0).getString(1)).toSeq
    assert(rows === Seq("node b"))
    // a real variable inside quoted data is still rejected
    val err = intercept[IllegalArgumentException] {
      Engine.inline("""@prefix : <http://example/> .
        << ?v :p 1 >> :q 2 .""")
    }
    assert(err.getMessage.contains("not allowed"))
  }

  test("quoted terms sort after literals in ORDER BY") {
    val g = Engine.inline(
      """@prefix : <http://example/> .
        :s :p << :a :b :c >> .
        :s :p "lit" .
        :s :p :iri .
      """)
    val kinds = g.selectRaw(
      "SELECT ?o WHERE { <http://example/s> <http://example/p> ?o } ORDER BY ?o")
      .collect().map(_.getStruct(0).getByte(0)).toSeq
    assert(kinds === Seq(Terms.KIND_IRI, Terms.KIND_LIT, Terms.KIND_TRIPLE))
  }
}
