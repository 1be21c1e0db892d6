package graft

/** CONSTRUCT evaluation conformance: manifest-driven like the other
  * categories ([[W3cHarness]]), but `mf:result` is a GRAPH (Turtle) and
  * the comparison is RDF graph isomorphism, per the upstream rdf-tests
  * construct family. Pins §16.2's template-validity discards (literal
  * subjects, non-IRI predicates), §16.2.1 per-solution blank-node
  * freshness, unbound-slot skipping, the set semantics of the result
  * graph, the CONSTRUCT WHERE shorthand, ground templates over the
  * empty pattern, and templates fed by grouped subselects. */
class W3cConstructSpec extends SparkSpec with W3cHarness {

  for (t <- loadManifest("construct")) {
    test(s"w3c/construct: ${t.name}") {
      val engine = Engine.inline(
        if (t.data.isEmpty) "" else res("construct", t.data))
      val got = engine.construct(res("construct", t.query))
      val want = Engine.inline(res("construct", t.result)).graph
      assert(want.isomorphic(got),
        s"${t.query}: expected\n${want.canonicalNQuads()}\n" +
          s"got\n${got.canonicalNQuads()}")
    }
  }
}
