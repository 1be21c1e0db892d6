package graft

import graft.rdf._

/** Golden tests for the SPARQL operator surface, derived from the
  * reference's notebooks (SURVEY.md §2B citations on each test). */
class OperatorSpec extends SparkSpec {

  test("explain returns the compiled physical plan without executing") {
    val g = graft.rdf.RdfGraph.fromTriples(spark, Seq(
      (graft.rdf.Iri("http://e/s"), graft.rdf.Iri("http://e/p"),
        graft.rdf.Lit.plain("v"))), Map("e" -> "http://e/"))
    val engine = Engine.fromGraph(g)
    val txt = engine.explain("SELECT ?o WHERE { ?s e:p ?o }")
    assert(txt.contains("== Physical Plan =="))
    val simple = engine.explain("SELECT ?o WHERE { ?s e:p ?o }", "simple")
    assert(simple.nonEmpty && !simple.contains("== Parsed Logical Plan =="))
    intercept[GraftException] { engine.explain("SELECT ?o WHERE { broken") }
    // a typo'd mode stays inside the engine's error contract
    val e = intercept[GraftException] {
      engine.explain("SELECT ?o WHERE { ?s e:p ?o }", "formated")
    }
    assert(e.getMessage.contains("explain mode"))
  }

  // Inference_Over_RDF_Containers.ipynb fixture: horse races as containers
  val racesTtl: String =
    """
      @prefix : <http://example.com/> .
      @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
      @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
      :monticello_3 a rdf:Seq ;
        rdf:_1 :saratoga_snacks ; rdf:_2 :fast_money ; rdf:_3 :boston_red .
      :tioga_2 a rdf:Seq ;
        rdf:_1 :fast_money ; rdf:_2 :im_a_swift ; rdf:_3 :saratoga_snacks .
      :bag_race a rdf:Bag ;
        rdf:_1 :fast_money ; rdf:_2 :fast_money ; rdf:_3 :boston_red .
    """

  def fresh(): Engine = {
    val e = Engine.inline(racesTtl)
    e.bindNamespace("", "http://example.com/")
    e
  }
  lazy val engine: Engine = fresh()

  test("OPTIONAL: left join keeps unmatched rows with nulls") {
    // DBpedia_Schema_Queries.ipynb:2862-2865 shape
    val df = engine.select(
      """SELECT ?race ?w {
           ?race a rdf:Seq
           OPTIONAL { ?race rdf:_1 ?w . FILTER(?w = :saratoga_snacks) }
         } ORDER BY ?race""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      (":monticello_3", ":saratoga_snacks"), (":tioga_2", null)))
  }

  test("MINUS removes compatible rows") {
    // RDFContainers.ipynb:798 — subjects that are not containers
    val df = engine.select(
      "SELECT DISTINCT ?s { ?s ?p ?o MINUS { ?s a ?t } }")
    // every subject here has rdf:type → MINUS removes all
    assert(df.count() == 0)
  }

  test("MINUS disjoint-domain rule: no shared vars → keep everything") {
    // DBpedia_Schema_Queries.ipynb:6591 semantics corner
    val df = engine.select(
      "SELECT DISTINCT ?s { ?s a rdf:Seq MINUS { ?x rdf:_9 ?y } }")
    assert(df.count() == 2) // nothing removed: {?x,?y} disjoint from {?s}
  }

  test("NOT EXISTS correlates on shared vars") {
    // DBpedia_Schema_Queries.ipynb:1799-1802 shape
    val df = engine.select(
      """SELECT ?race { ?race a rdf:Seq
           FILTER NOT EXISTS { ?race rdf:_1 :saratoga_snacks } }""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq(":tioga_2"))
  }

  test("UNION with disjoint branch vars null-fills") {
    val df = engine.select(
      """SELECT ?a ?b {
           { :monticello_3 rdf:_1 ?a } UNION { :tioga_2 rdf:_1 ?b } }""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set((":saratoga_snacks", null), (null, ":fast_money")))
  }

  test("property path sequence rdf:_3/rdf:_1-style joins") {
    // Inference notebook :1631/:1743 — seq path composition
    val df = engine.select(
      "SELECT ?x { :monticello_3 rdf:_2|rdf:_3 ?x } ORDER BY ?x")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq(":boston_red", ":fast_money"))
  }

  test("inverse path ^") {
    // Inference notebook :1767 — "?horse ^rdf:_1 ?race"
    val df = engine.select(
      "SELECT ?race { :fast_money ^rdf:_1 ?race } ORDER BY ?race")
    // both :tioga_2 and :bag_race list :fast_money first
    assert(df.collect().map(_.getString(0)).toSeq == Seq(":bag_race", ":tioga_2"))
  }

  test("transitive closure p* and p+ via fixpoint") {
    // DBpedia_Schema_Queries.ipynb:4127 — subClassOf* shape, deeper chain
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        :A rdfs:subClassOf :B . :B rdfs:subClassOf :C .
        :C rdfs:subClassOf :D . :X rdfs:subClassOf :D .
      """)
    e.bindNamespace("", "http://example.com/")
    val star = e.select("SELECT ?x { :A rdfs:subClassOf* ?x } ORDER BY ?x")
      .collect().map(_.getString(0)).toSeq
    assert(star == Seq(":A", ":B", ":C", ":D"))
    // pair closure (both endpoints open) — exercises the doubling loop
    val pairs = e.select(
      "SELECT ?a ?b { ?a rdfs:subClassOf+ ?b } ORDER BY ?a ?b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs == Seq(
      (":A", ":B"), (":A", ":C"), (":A", ":D"),
      (":B", ":C"), (":B", ":D"), (":C", ":D"), (":X", ":D")))
    val plus = e.select("SELECT ?x { :A rdfs:subClassOf+ ?x } ORDER BY ?x")
      .collect().map(_.getString(0)).toSeq
    assert(plus == Seq(":B", ":C", ":D"))
    // inverse star from the constant end
    val inv = e.select("SELECT ?x { ?x rdfs:subClassOf* :D } ORDER BY ?x")
      .collect().map(_.getString(0)).toSeq
    assert(inv == Seq(":A", ":B", ":C", ":D", ":X"))
  }

  test("subquery: aggregate-of-subquery") {
    // remote notebook :614 — COUNT over SELECT DISTINCT
    val n = Engine.one(engine.select(
      """SELECT (COUNT(*) AS ?n) { { SELECT DISTINCT ?p { ?s ?p ?o } } }"""))
    // rdf:type, rdf:_1, rdf:_2, rdf:_3
    assert(n == 4L)
  }

  test("VALUES dispatch (decollect probe shape)") {
    // gastrodon/__init__.py:411
    val df = engine.select(
      """SELECT ?s ?type { ?s a ?type
           VALUES (?type) { (rdf:Seq) (rdf:Bag) (rdf:Alt) } } ORDER BY ?s""")
    assert(df.count() == 3)
  }

  test("decollect Seq returns ordered list") {
    // RDFContainers.ipynb cell 48 assertion shape
    val got = engine.decollect(Iri("http://example.com/monticello_3"))
    assert(got == Seq(":saratoga_snacks", ":fast_money", ":boston_red"))
  }

  test("decollect Bag returns counts") {
    // RDFContainers cell 56 — Counter output
    val got = engine.decollect(Iri("http://example.com/bag_race"))
    assert(got == Map(":fast_money" -> 2L, ":boston_red" -> 1L))
  }

  test("CONSTRUCT instantiates template with dedup") {
    val g = engine.construct(
      """CONSTRUCT { ?h :ran_in ?race } WHERE { ?race a rdf:Seq . ?race ?p ?h .
           FILTER(STRSTARTS(STR(?p), "http://www.w3.org/1999/02/22-rdf-syntax-ns#_")) }""")
    assert(g.size == 6)
  }

  test("CONSTRUCT discards invalid instantiations (§16.2)") {
    // a variable in predicate position that binds to a literal, and a
    // variable in subject position that binds to a literal, are not
    // valid RDF triples — skipped, not errors (found by QueryModelSpec
    // fuzzing, pinned here)
    val e = Engine.inline(
      """@prefix : <http://example.com/> .
        :s :p "lit" . :s :q :o .
      """)
    val g = e.construct(
      """PREFIX : <http://example.com/>
         CONSTRUCT { :a ?o :b . ?o :p2 :c . :d :p3 ?o } WHERE { :s ?p ?o }""")
    // ?o ∈ { "lit", :o }: predicate slot keeps only :o; subject slot
    // keeps only :o; object slot keeps both
    assert(g.size == 4, Engine.fromGraph(g).ttl())
  }

  test("INSERT WHERE forward chaining is idempotent (rule_1 shape)") {
    // Inference_Over_RDF_Containers.ipynb:451-459, 823-833
    val e = fresh()
    val rule =
      """INSERT { ?race rdfs:member ?h } WHERE { ?race a rdf:Seq . ?race ?p ?h .
           FILTER(STRSTARTS(STR(?p), "http://www.w3.org/1999/02/22-rdf-syntax-ns#_")) }"""
    e.update(rule)
    val n1 = e.graph.size
    e.update(rule) // re-application must not grow the graph
    assert(e.graph.size == n1)
    val members = e.select(
      "SELECT (COUNT(*) AS ?n) { ?r rdfs:member ?h }")
    assert(Engine.one(members) == 6L)
  }

  test("peel copies blank-node closure") {
    // gastrodon/__init__.py:688-743
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :thing :part [ :name "wheel" ; :sub [ :name "spoke" ] ] ;
               :label "cart" .
        :other :label "nope" .
      """)
    val peeled = e.peel(Iri("http://example.com/thing"))
    // :thing{part,label} + bnode1{name,sub} + bnode2{name} = 5 triples
    assert(peeled.size == 5)
    val other = peeled.triples.where(
      org.apache.spark.sql.functions.col("s.value") === "http://example.com/other")
    assert(other.count() == 0)
  }

  test("DESCRIBE <iri> returns the concise bounded description (peel semantics)") {
    // gastrodon/__init__.py:688-743 — DESCRIBE reuses the peel walk
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :thing :part [ :name "wheel" ; :sub [ :name "spoke" ] ] ;
               :label "cart" .
        :other :label "nope" .
      """)
    val d = e.describe("DESCRIBE <http://example.com/thing>")
    assert(d.size == 5) // same closure the peel test pins
    val peeled = e.peel(Iri("http://example.com/thing"))
    assert(d.triples.except(peeled.triples).isEmpty &&
      peeled.triples.except(d.triples).isEmpty)
    // multiple targets union their descriptions
    val both = e.describe(
      "DESCRIBE <http://example.com/thing> <http://example.com/other>")
    assert(both.size == 6)
  }

  test("DESCRIBE ?x WHERE binds targets from the pattern") {
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :a a :Widget ; :name "a" ; :part [ :name "a-sub" ] .
        :b a :Widget ; :name "b" .
        :c a :Gadget ; :name "c" .
      """)
    e.bindNamespace("", "http://example.com/")
    val d = e.describe("DESCRIBE ?x WHERE { ?x a <http://example.com/Widget> }")
    // :a{type,name,part} + bnode{name} + :b{type,name} = 6; :c excluded
    assert(d.size == 6)
    assert(d.triples.where(
      org.apache.spark.sql.functions.col("s.value") === "http://example.com/c")
      .count() == 0)
    // ?_binding substitution narrows the target like any other query
    val one = e.describe("DESCRIBE ?_x", Map("x" -> Iri("http://example.com/b")))
    assert(one.size == 2)
  }

  test("UPDATE LOAD unions a document into the graph (idempotent)") {
    // gastrodon/__init__.py:905-907 parses LOAD in update()
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :x :label "seed" .
      """)
    val dir = java.nio.file.Files.createTempDirectory("graft_load").toFile
    dir.deleteOnExit()
    val nt = new java.io.File(dir, "doc.nt")
    java.nio.file.Files.writeString(nt.toPath,
      "<http://example.com/x> <http://example.com/label> \"seed\" .\n" +
      "<http://example.com/y> <http://example.com/label> \"loaded\" .\n")
    e.update(s"LOAD <file://${nt.getAbsolutePath}>")
    assert(e.graph.size == 2) // set semantics: the seed triple dedups
    e.update(s"LOAD <file://${nt.getAbsolutePath}>")
    assert(e.graph.size == 2) // idempotent re-load
    // r13: INTO GRAPH on a triples-only store is a LOUD error (it used
    // to silently retarget the default graph); GraphUpdateSpec covers
    // the honored quad-store path
    val intoOnTriples = intercept[GraftException] {
      e.update(s"LOAD <file://${nt.getAbsolutePath}> INTO GRAPH <http://example.com/g>")
    }
    assert(intoOnTriples.getMessage.contains("asQuadStore"))
    val ttl = new java.io.File(dir, "doc.ttl")
    java.nio.file.Files.writeString(ttl.toPath,
      "@prefix ex: <http://example.com/> .\nex:z ex:label \"turtle\" .\n")
    e.update(s"LOAD <file://${ttl.getAbsolutePath}>")
    assert(e.graph.size == 3)
    assert(e.graph.prefixes.get("ex").contains("http://example.com/"))
    // remote schemes and unknown formats fail with a clear error, not an
    // opaque filesystem one
    val remote = intercept[GraftException] {
      e.update("LOAD <http://example.com/data.ttl>")
    }
    assert(remote.getMessage.contains("file://"))
    val unknown = intercept[GraftException] {
      e.update(s"LOAD <file://${dir.getAbsolutePath}/doc.csv>")
    }
    assert(unknown.getMessage.contains("format"))
    // .jsonld is a supported LOAD format (named graphs flatten into
    // the default graph per SPARQL 1.1 LOAD's single-graph semantics)
    val jld = new java.io.File(dir, "doc.jsonld")
    java.nio.file.Files.writeString(jld.toPath,
      """{"@id": "http://example.com/j", "@graph": [
           {"@id": "http://example.com/w",
            "http://example.com/label": "json-ld"}]}""")
    e.update(s"LOAD <file://${jld.getAbsolutePath}>")
    assert(e.graph.size == 4)
  }

  test("GROUP BY + HAVING + ORDER BY DESC(count)") {
    // DBpedia_Schema_Queries.ipynb:309/2872 shapes
    val df = engine.select(
      """SELECT ?h (COUNT(*) AS ?cnt) { ?race ?p ?h .
           FILTER(STRSTARTS(STR(?p), "http://www.w3.org/1999/02/22-rdf-syntax-ns#_")) }
         GROUP BY ?h HAVING(COUNT(*) >= 2) ORDER BY DESC(?cnt) ?h""")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // fast_money: monticello _2 + tioga _1 + bag _1,_2 = 4;
    // boston_red: monticello _3 + bag _3 = 2; saratoga: monticello _1 + tioga _3 = 2
    assert(rows == Seq((":fast_money", 4L), (":boston_red", 2L),
      (":saratoga_snacks", 2L)))
  }

  test("BIND + xsd:integer + SUBSTR index extraction (decollect recipe)") {
    // gastrodon/__init__.py:452-463
    val df = engine.select(
      """SELECT ?i ?h { :monticello_3 ?p ?h .
           FILTER(STRSTARTS(STR(?p), "http://www.w3.org/1999/02/22-rdf-syntax-ns#_"))
           BIND(xsd:integer(SUBSTR(STR(?p), 45)) AS ?i) } ORDER BY ?i""")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, ":saratoga_snacks"), (2L, ":fast_money"),
      (3L, ":boston_red")))
  }

  test("ORDER BY numeric vs lexical (rdf:_10 pitfall)") {
    // RDFContainers.ipynb:1438 vs :1562
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :l :v "2" . :m :v "10" .
      """)
    e.bindNamespace("", "http://example.com/")
    val lex = e.select("SELECT ?x { ?s :v ?x } ORDER BY ?x")
      .collect().map(_.getString(0)).toSeq
    assert(lex == Seq("10", "2")) // plain literals sort lexically
    val num = e.select(
      "SELECT ?n { ?s :v ?x BIND(xsd:integer(?x) AS ?n) } ORDER BY ?n")
      .collect().map(_.getLong(0)).toSeq
    assert(num == Seq(2L, 10L))
  }

  test("term equality: numeric value compare across datatypes") {
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        :a :v 42 . :b :v "42.0"^^xsd:double . :c :v "x" .
      """)
    e.bindNamespace("", "http://example.com/")
    val df = e.select("SELECT ?s { ?s :v ?x FILTER(?x = 42) } ORDER BY ?s")
    assert(df.collect().map(_.getString(0)).toSeq == Seq(":a", ":b"))
  }

  test("ASK / BOUND / IF / COALESCE") {
    assert(engine.ask("ASK { :monticello_3 a rdf:Seq }"))
    val df = engine.select(
      """SELECT ?race ?label {
           ?race a rdf:Seq
           OPTIONAL { ?race rdf:_9 ?w }
           BIND(IF(BOUND(?w), "has9", COALESCE(?w, "no9")) AS ?label)
         } ORDER BY ?race""")
    assert(df.collect().map(_.getString(1)).toSeq == Seq("no9", "no9"))
  }

  test("star-scan pushdown: string != on a numeric column must not prune") {
    // FILTER(?k != "5"): SPARQL term inequality between xsd:integer and
    // xsd:string is TRUE for every row (different datatypes ⇒ different
    // terms), so all 25 nations survive. A type-blind pushdown would let
    // Spark coerce "5" to 5 on the raw int column and prune k=5 — a row
    // the reapplied term-level filter can never restore.
    val dir = "/root/testdata/sf0.001"
    val q = """PREFIX gp: <urn:graft:p/>
      SELECT ?name ?k { ?n gp:n_name ?name . ?n gp:n_nationkey ?k
        FILTER(?k != "5") }"""
    val star = Engine.fromGraph(Tables.graph(spark, dir, "nation"))
    val starRows = star.select(q).count()
    // generic path (no star tables) as the semantic baseline
    val plain = Engine.fromGraph(
      rdf.RdfGraph(Tables.graph(spark, dir, "nation").triples,
        rdf.RdfGraph.defaultPrefixes))
    assert(starRows == plain.select(q).count())
    assert(starRows == 25)
  }

  test("bench JSON reports failures as errors, not times") {
    val json = Bench.renderJson(Seq(
      ("q_ok", Seq(2.0, 1.234, 1.8), None),
      ("q_boom", Seq(0.001), Some("""AnalysisException: "col" not found"""))),
      "/tmp/sf", reps = 3)
    assert(json.contains(""""reps":3"""))
    // min under "queries", median under "medians" — the artifact itself
    // shows run-to-run variance
    assert(json.contains(""""queries":{"q_ok":1.234}"""))
    assert(json.contains(""""medians":{"q_ok":1.800}"""))
    assert(json.contains(""""errors":{"q_boom":"AnalysisException: \"col\" not found"}"""))
    assert(!json.contains(""""q_boom":0.001"""))
    assert(json.contains(""""value":1.234"""))
  }
}
