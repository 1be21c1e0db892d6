package graft

import graft.rdf._

/** Manifest-driven SPARQL 1.1 evaluation conformance suite, modeled on
  * the public W3C rdf-tests harness (`w3c/rdf-tests`,
  * `sparql/sparql11/` — the DAWG/SPARQL-WG evaluation-test format).
  *
  * Each category directory under `src/test/resources/w3c/` is a W3C
  * manifest: a `manifest.ttl` using the `mf:`/`qt:` test vocabulary
  * whose entries point at a query file, a data file, and an expected
  * result set in the DAWG result-set vocabulary
  * (`http://www.w3.org/2001/sw/DataAccess/tests/result-set#`), exactly
  * the layout of the upstream suite. The fixtures here are authored
  * from the SPARQL 1.1 Query REC (primarily §17 expressions/EBV, §8
  * negation, §11 aggregates, §9 property paths, §17.4 builtins) and
  * reproduce the corners that suite exists to catch and that no data
  * corpus exercises: EBV and error propagation through
  * `||`/`&&`/`IN`/`IF`/`COALESCE`, FILTER scope inside nested groups,
  * OPTIONAL shared-variable compatibility, MINUS vs NOT EXISTS domain
  * rules, aggregate error/empty-group semantics, zero-length and
  * cyclic property paths, and string-builtin language-tag rules.
  *
  * Comparison is the W3C one (see [[W3cHarness]]): result sets match
  * when there is a blank node bijection under which they are equal as
  * multisets (sequences when the expected file carries `rs:index`);
  * numeric literals compare by value within their exact datatype,
  * everything else by term. The runner is intentionally dumb: it
  * discovers everything from the manifests, so dropping a new
  * W3C-format test file in makes it run with no Scala change.
  *
  * Skip policy (documented per the upstream harness convention): tests
  * whose outcome is implementation-defined are not authored at all —
  * ORDER BY across incomparable literal types, SAMPLE/GROUP_CONCAT
  * value choice under multi-element groups (covered instead by
  * order-independent formulations), and syntax-only tests (the parser
  * has its own caret-error specs). SERVICE evaluation tests live in
  * [[W3cServiceSpec]], which brings up live endpoints per test.
  */
class W3cSparqlSpec extends SparkSpec with W3cHarness {

  private val categories =
    Seq("algebra", "negation", "aggregates", "property-path",
      "functions", "bindings", "exists", "graph", "syntax",
      "sparql-star")

  for (cat <- categories; t <- loadManifest(cat)) {
    test(s"w3c/$cat: ${t.name}") {
      val queryText = res(cat, t.query)
      if (t.negativeSyntax) {
        // the query must be REJECTED at parse/compile time (before any
        // data is touched) — e.g. the §18.2.4.4 aggregate projection
        // restriction
        val thrown = intercept[Exception] {
          Engine.inline("").selectRaw(queryText)
        }
        assert(thrown.isInstanceOf[GraftException] ||
          thrown.isInstanceOf[graft.sparql.SparqlParseException],
          s"${t.query}: expected a parse/compile rejection, got $thrown")
      } else if (t.positiveSyntax) {
        // the query must parse and compile, whatever its form (the
        // empty store makes any execution trivial)
        val form = "(?i)\\b(SELECT|CONSTRUCT|ASK|DESCRIBE)\\b".r
          .findFirstIn(queryText).map(_.toUpperCase).getOrElse("SELECT")
        val e = Engine.inline("")
        form match {
          case "CONSTRUCT" => e.construct(queryText)
          case "ASK" => e.ask(queryText)
          case "DESCRIBE" => e.describe(queryText)
          case _ => e.selectRaw(queryText)
        }
      } else {
        // .trig data carries named graphs; .ttl is the default graph only
        val engine =
          if (t.data.endsWith(".trig"))
            Engine.fromGraph(graft.sources.Trig.parse(res(cat, t.data), spark))
          else Engine.inline(res(cat, t.data))
        loadResult(cat, t.result) match {
          case ExpectedBool(want) =>
            assert(engine.ask(queryText) === want, s"ASK ${t.query}")
          case want: ExpectedRows =>
            val (gotVars, gotRows) = runSelect(engine, queryText)
            assertRowsMatch(t.query, want, gotVars, gotRows)
        }
      }
    }
  }
}
