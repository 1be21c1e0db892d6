package graft

import graft.rdf._
import org.apache.spark.sql.{functions => F}

/** [[graft.rdf.Reasoner]]: ρdf RDFS closure and owl:sameAs smushing,
  * hand-computed fixtures. */
class ReasonerSpec extends SparkSpec {

  private val EX = "urn:ex:"
  private def i(l: String) = Iri(EX + l)
  private val typ = Iri(RDF.typ)
  private val sc = Iri(RDFS.subClassOf)
  private val sp = Iri(RDFS.subPropertyOf)
  private val dom = Iri(RDFS.domain)
  private val rng = Iri(RDFS.range)
  private val same = Iri(OWL.sameAs)

  private def graph(ts: (RdfTerm, RdfTerm, RdfTerm)*): RdfGraph =
    RdfGraph.fromTriples(spark, ts, Map("ex" -> EX))

  private def tripleSet(g: RdfGraph): Set[(String, String, String)] =
    g.triples.select("s", "p", "o").collect().map { r =>
      def v(k: Int) = r.getStruct(k).getString(1)
      (v(0), v(1), v(2))
    }.toSet

  private def t(s: RdfTerm, p: RdfTerm, o: RdfTerm) =
    (termStr(s), termStr(p), termStr(o))
  private def termStr(x: RdfTerm): String = x match {
    case Iri(v) => v
    case Blank(l) => l
    case Lit(l, _, _) => l
    case q: QuotedTriple => q.n3()
  }

  test("rdfs11 + rdfs9: subclass chain closes, types propagate up") {
    val g = graph(
      (i("A"), sc, i("B")), (i("B"), sc, i("C")), (i("C"), sc, i("D")),
      (i("x"), typ, i("A")))
    val closed = tripleSet(Reasoner.rdfsClosure(g))
    for (c <- Seq("B", "C", "D"))
      assert(closed.contains(t(i("x"), typ, i(c))), s"type $c")
    assert(closed.contains(t(i("A"), sc, i("D"))), "A subClassOf D")
    assert(closed.contains(t(i("B"), sc, i("D"))))
    // nothing invented downward
    assert(!closed.contains(t(i("D"), sc, i("A"))))
  }

  test("rdfs5 + rdfs7: subproperty chain closes, triples lift") {
    val g = graph(
      (i("p"), sp, i("q")), (i("q"), sp, i("r")),
      (i("s"), i("p"), i("o")))
    val closed = tripleSet(Reasoner.rdfsClosure(g))
    assert(closed.contains(t(i("s"), i("q"), i("o"))))
    assert(closed.contains(t(i("s"), i("r"), i("o"))))
    assert(closed.contains(t(i("p"), sp, i("r"))))
  }

  test("rdfs2/rdfs3 fire through the property hierarchy; range skips literals") {
    val g = graph(
      (i("p"), sp, i("q")),
      (i("q"), dom, i("DomC")), (i("q"), rng, i("RngC")),
      (i("s"), i("p"), i("o")),
      (i("s2"), i("q"), Lit.plain("text")))
    val closed = tripleSet(Reasoner.rdfsClosure(g))
    // domain of the SUPER property applies to the sub-property edge
    assert(closed.contains(t(i("s"), typ, i("DomC"))))
    assert(closed.contains(t(i("o"), typ, i("RngC"))))
    assert(closed.contains(t(i("s2"), typ, i("DomC"))))
    // a literal object never becomes a typed subject
    assert(!closed.exists { case (s, p, _) =>
      s == "text" && p == RDF.typ })
  }

  test("derived types keep propagating (rdfs2 then rdfs9)") {
    val g = graph(
      (i("p"), dom, i("C")), (i("C"), sc, i("D")),
      (i("s"), i("p"), i("o")))
    val closed = tripleSet(Reasoner.rdfsClosure(g))
    assert(closed.contains(t(i("s"), typ, i("C"))))
    assert(closed.contains(t(i("s"), typ, i("D"))))
  }

  test("schema-in-data: a property declared subPropertyOf rdfs:subClassOf feeds the class hierarchy") {
    val g = graph(
      (i("isa"), sp, sc),
      (i("A"), i("isa"), i("B")),
      (i("x"), typ, i("A")))
    val closed = tripleSet(Reasoner.rdfsClosure(g))
    assert(closed.contains(t(i("A"), sc, i("B"))), "rule 7 first")
    assert(closed.contains(t(i("x"), typ, i("B"))), "then rdfs9")
  }

  test("rounds knob closes subPropertyOf-of-subPropertyOf schemas") {
    // the documented out-of-contract corner for one pass: :mySub is a
    // SUB-PROPERTY-DECLARING property, so pass 1 derives the hierarchy
    // edge (:a sp :b) and only pass 2 can lift instance triples over it
    val g = graph(
      (i("mySub"), sp, sp),
      (i("a"), i("mySub"), i("b")),
      (i("x"), i("a"), i("y")))
    val onePass = tripleSet(Reasoner.rdfsClosure(g))
    assert(onePass.contains(t(i("a"), sp, i("b"))),
      "pass 1 derives the schema edge")
    assert(!onePass.contains(t(i("x"), i("b"), i("y"))),
      "one pass documents this as underived")
    val fixed = tripleSet(Reasoner.rdfsClosure(g, rounds = 3))
    assert(fixed.contains(t(i("x"), i("b"), i("y"))),
      "the rounds knob closes it")
    // fixpoint: another full pass adds nothing
    assert(tripleSet(Reasoner.rdfsClosure(
      Reasoner.rdfsClosure(g, rounds = 3))) == fixed)
    // a deliberately-too-low cap on a still-growing schema errors loudly
    // instead of silently under-deriving: chain two levels deep
    val deep = graph(
      (i("metaSub"), sp, sp),
      (i("mySub2"), i("metaSub"), sp),
      (i("a2"), i("mySub2"), i("b2")),
      (i("x2"), i("a2"), i("y2")))
    val err = intercept[IllegalArgumentException](
      Reasoner.rdfsClosure(deep, rounds = 2))
    assert(err.getMessage.contains("fixpoint"))
    // and enough rounds close the same ontology
    assert(tripleSet(Reasoner.rdfsClosure(deep, rounds = 4))
      .contains(t(i("x2"), i("b2"), i("y2"))))
  }

  test("closure is idempotent and keeps the input") {
    val g = graph(
      (i("A"), sc, i("B")), (i("p"), sp, i("q")),
      (i("x"), typ, i("A")), (i("x"), i("p"), i("y")))
    val once = Reasoner.rdfsClosure(g)
    val twice = Reasoner.rdfsClosure(once)
    assert(tripleSet(g).subsetOf(tripleSet(once)))
    assert(tripleSet(once) == tripleSet(twice))
  }

  test("quad store: closure reads and extends the default graph only") {
    val gName = i("g1")
    val g = RdfGraph.fromQuads(spark, Seq(
      (i("A"), sc, i("B"), None),
      (i("x"), typ, i("A"), None),
      // a named-graph type that must NOT propagate (schema is default-
      // graph scoped) and must survive untouched
      (i("y"), typ, i("A"), Some(gName))),
      Map("ex" -> EX))
    val closed = Reasoner.rdfsClosure(g)
    val dflt = closed.triples.where(F.col("g").isNull)
    val named = closed.triples.where(F.col("g").isNotNull)
    assert(dflt.where(F.col("s.value") === (EX + "x") &&
      F.col("o.value") === (EX + "B")).count() == 1)
    assert(dflt.where(F.col("s.value") === (EX + "y")).count() == 0,
      "named-graph instance data must not leak into the closure")
    assert(named.count() == 1, "named graph passes through untouched")
  }

  test("smush: chains collapse to the least term, sameAs edges vanish") {
    val g = graph(
      (i("b"), same, i("c")), (i("c"), same, i("a")),
      (i("b"), i("knows"), i("z")),
      (i("w"), i("knows"), i("c")),
      (i("a"), i("name"), Lit.plain("alice")))
    val smushed = tripleSet(Reasoner.smushSameAs(g))
    assert(smushed == Set(
      t(i("a"), i("knows"), i("z")),
      t(i("w"), i("knows"), i("a")),
      t(i("a"), i("name"), Lit.plain("alice"))))
  }

  test("smush: two components stay separate; predicates are not rewritten") {
    val g = graph(
      (i("x1"), same, i("x2")),
      (i("y1"), same, i("y2")),
      (i("x2"), i("y2"), i("y1")))
    val smushed = tripleSet(Reasoner.smushSameAs(g))
    // subject and object rewritten to their own components' minima;
    // the predicate slot — even though urn:ex:y2 is an alias — stays
    assert(smushed == Set(t(i("x1"), i("y2"), i("y1"))))
  }

  test("smush is deterministic under partitioning") {
    val ts: Seq[(RdfTerm, RdfTerm, RdfTerm)] =
      (1 to 40).map(k => (i(f"e$k%02d"), same, i(f"e${k - k % 4}%02d"))) ++
        (1 to 40).map(k => (i(f"e$k%02d"), i("p"), i(f"n$k%02d")))
    val a = tripleSet(Reasoner.smushSameAs(graph(ts: _*)))
    val shuffled = RdfGraph.fromTriples(spark, scala.util.Random.shuffle(ts),
      Map("ex" -> EX))
    val b = tripleSet(Reasoner.smushSameAs(
      shuffled.copy(triples = shuffled.triples.repartition(7))))
    assert(a == b)
    // spot-check one component: e05..e07 alias e04
    assert(a.contains(t(i("e04"), i("p"), i("n07"))))
  }

  test("no sameAs: smush is identity; sameAs to a literal is ignored") {
    val g = graph(
      (i("a"), i("p"), i("b")),
      (i("a"), same, Lit.plain("not-a-node")))
    assert(Reasoner.sameAsMap(g).count() == 0)
    assert(tripleSet(Reasoner.smushSameAs(g)) == Set(t(i("a"), i("p"), i("b"))))
  }
}
