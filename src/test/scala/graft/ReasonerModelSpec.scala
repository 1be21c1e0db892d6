package graft

import scala.util.Random

import graft.rdf._

/** Differential fuzz of the ρdf reasoner: for random ontologies mixing
  * instance triples, schema triples, and (sometimes) SCHEMA-IN-DATA
  * edges (`p ⊑ rdfs:subPropertyOf` — the corner the `rounds` knob
  * exists for), `Reasoner.rdfsClosure(g, rounds)` run to its fixpoint
  * must equal an independent naive driver-side fixpoint that just
  * applies the six ρdf rules to a triple set until nothing grows. The
  * two computations share no code: the naive model is a dozen lines of
  * set comprehension written from the rule definitions. An iterated
  * stratified pass that reaches a fixpoint is closed under every rule,
  * and only ever adds rule-derived triples, so the two least fixpoints
  * coincide — any difference is a bug on one side.
  * Deepen with GRAFT_MODEL_SEEDS_EXTRA (comma-separated extra seeds). */
class ReasonerModelSpec extends SparkSpec {

  private type T = (RdfTerm, RdfTerm, RdfTerm)
  private val SPO = Iri(RDFS.subPropertyOf)
  private val SCO = Iri(RDFS.subClassOf)
  private val DOM = Iri(RDFS.domain)
  private val RNG = Iri(RDFS.range)
  private val TYP = Iri(RDF.typ)

  /** The six ρdf rules, applied naively to a fixpoint. */
  private def naiveClosure(start: Set[T]): Set[T] = {
    var g = start
    var grew = true
    while (grew) {
      val next = g ++
        // rdfs5 / rdfs11: transitivity
        (for ((a, SPO, b) <- g; (b2, SPO, c) <- g if b == b2)
          yield (a, SPO, c)) ++
        (for ((a, SCO, b) <- g; (b2, SCO, c) <- g if b == b2)
          yield (a, SCO, c)) ++
        // rdfs7: property inheritance
        (for ((p, SPO, q) <- g; (s, p2, o) <- g if p == p2)
          yield (s, q, o)) ++
        // rdfs2 / rdfs3: domain and range typing (no literal subjects)
        (for ((p, DOM, c) <- g; (s, p2, _) <- g if p == p2)
          yield (s, TYP, c)) ++
        (for ((p, RNG, c) <- g; (_, p2, o) <- g
              if p == p2 && !o.isInstanceOf[Lit]) yield (o, TYP, c)) ++
        // rdfs9: type propagation up the class hierarchy
        (for ((c, SCO, d) <- g; (s, TYP, c2) <- g if c == c2)
          yield (s, TYP, d))
      grew = next.size > g.size
      g = next
    }
    g
  }

  private def e(x: String) = Iri(s"http://ex/$x")

  private def genGraph(rnd: Random): Set[T] = {
    val props = Seq("p", "q", "r", "pp").map(e)
    val classes = Seq("C1", "C2", "C3", "C4").map(e)
    val inds = Seq("i1", "i2", "i3").map(e)
    val out = scala.collection.mutable.Set[T]()
    // schema: a few hierarchy / domain / range edges
    for (_ <- 0 until 2 + rnd.nextInt(4)) out += (rnd.nextInt(4) match {
      case 0 => (props(rnd.nextInt(3)), SPO, props(rnd.nextInt(3)))
      case 1 => (classes(rnd.nextInt(4)), SCO, classes(rnd.nextInt(4)))
      case 2 => (props(rnd.nextInt(3)), DOM, classes(rnd.nextInt(4)))
      case _ => (props(rnd.nextInt(3)), RNG, classes(rnd.nextInt(4)))
    })
    // schema-in-data, sometimes: pp acts as subPropertyOf itself, so
    // (a pp b) entails (a subPropertyOf b) only on a LATER pass
    if (rnd.nextInt(3) == 0) {
      out += ((e("pp"), SPO, SPO))
      out += ((props(rnd.nextInt(3)), e("pp"), props(rnd.nextInt(3))))
    }
    // instance triples (literal objects included: rdfs3 must skip them)
    for (_ <- 0 until 3 + rnd.nextInt(5)) {
      val o: RdfTerm =
        if (rnd.nextInt(4) == 0) Lit(rnd.nextInt(5).toString, XSD.integer, null)
        else inds(rnd.nextInt(3))
      out += ((inds(rnd.nextInt(3)), props(rnd.nextInt(3)), o))
    }
    if (rnd.nextBoolean())
      out += ((inds(rnd.nextInt(3)), TYP, classes(rnd.nextInt(4))))
    out.toSet
  }

  private def toTurtle(ts: Set[T]): String =
    ts.toSeq.sortBy(_.toString)
      .map { case (s, p, o) => s"${s.n3()} ${p.n3()} ${o.n3()} ." }
      .mkString("\n")

  private val extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))

  // --------------------------------------------------------- smushSameAs

  /** Naive smush model: undirected components over the owl:sameAs
    * edges, canonical representative = the component's minimum IRI
    * (plain string order — the same order struct-min gives all-IRI
    * components), subjects and objects rewritten, predicates and
    * literals untouched, sameAs triples dropped, set semantics. */
  private def naiveSmush(start: Set[T]): Set[T] = {
    val SAME = Iri(OWL.sameAs)
    val edges = start.collect { case (a, SAME, b) => (a, b) }
    val parent = scala.collection.mutable.Map[RdfTerm, RdfTerm]()
    def find(x: RdfTerm): RdfTerm =
      if (parent.getOrElse(x, x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val repr = parent.keys.toSeq.groupBy(find).flatMap { case (_, members) =>
      val c = members.minBy { case Iri(v) => v; case t => t.n3() }
      members.map(_ -> c)
    }
    def r(x: RdfTerm): RdfTerm = repr.getOrElse(x, x)
    start.collect { case (s, p, o) if p != SAME => (r(s), p, r(o)) }
  }

  private def genSmushGraph(rnd: Random): Set[T] = {
    val inds = Seq("i1", "i2", "i3", "i4", "i5").map(e)
    val props = Seq("p", "q").map(e)
    val out = scala.collection.mutable.Set[T]()
    for (_ <- 0 until rnd.nextInt(4))
      out += ((inds(rnd.nextInt(5)), Iri(OWL.sameAs), inds(rnd.nextInt(5))))
    for (_ <- 0 until 3 + rnd.nextInt(5)) {
      val o: RdfTerm =
        if (rnd.nextInt(4) == 0) Lit("L" + rnd.nextInt(3), XSD.string, null)
        else inds(rnd.nextInt(5))
      out += ((inds(rnd.nextInt(5)), props(rnd.nextInt(2)), o))
    }
    out.toSet
  }

  for (seed <- Seq(5, 13, 71) ++ extraSeeds) {
    test(s"smushSameAs equals the naive union-find rewrite (seed $seed)") {
      val rnd = new Random(seed)
      for (round <- 0 until 4) {
        val start = genSmushGraph(rnd)
        val want = naiveSmush(start)
        val got = collectTriples(
          Reasoner.smushSameAs(Engine.inline(toTurtle(start)).graph))
        assert(got == want,
          s"seed $seed round $round:\n" +
            s"missing: ${(want -- got).mkString("; ")}\n" +
            s"extra: ${(got -- want).mkString("; ")}\n" +
            s"input:\n${toTurtle(start)}")
      }
    }
  }

  private def collectTriples(g: RdfGraph): Set[T] =
    g.triples.collect().map { r =>
      def t(i: Int): RdfTerm = {
        val st = r.getStruct(i)
        st.getByte(0) match {
          case Terms.KIND_IRI => Iri(st.getString(1))
          case Terms.KIND_BLANK => Blank(st.getString(1))
          case _ => Lit(st.getString(1), st.getString(2), st.getString(3))
        }
      }
      (t(0), t(1), t(2))
    }.toSet

  for (seed <- Seq(3, 17, 29, 41) ++ extraSeeds) {
    test(s"rdfsClosure fixpoint equals the naive rule fixpoint (seed $seed)") {
      val rnd = new Random(seed)
      for (round <- 0 until 3) {
        val start = genGraph(rnd)
        val want = naiveClosure(start)
        val got = collectTriples(Reasoner.rdfsClosure(
          Engine.inline(toTurtle(start)).graph, rounds = 8))
        assert(got == want,
          s"seed $seed round $round:\n" +
            s"missing: ${(want -- got).map(x => x.toString).mkString("; ")}\n" +
            s"extra: ${(got -- want).map(x => x.toString).mkString("; ")}\n" +
            s"input:\n${toTurtle(start)}")
      }
    }
  }
}
