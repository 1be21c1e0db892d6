package graft

import graft.rdf._

/** Manifest-driven SERVICE (SPARQL 1.1 Federated Query) conformance
  * suite, after the upstream `w3c/rdf-tests` `sparql11-fed` layout:
  * each entry's `mf:action` carries the usual `qt:query`/`qt:data`
  * plus one `qt:serviceData [ qt:endpoint <iri> ; qt:data <file> ]`
  * node per remote endpoint the query names.
  *
  * Unlike the pure-evaluation categories, every test here runs over
  * the REAL wire path: for each declared endpoint the runner brings up
  * a live HTTP SPARQL endpoint (a second [[Engine]] over the declared
  * service data, speaking `application/x-www-form-urlencoded` in and
  * `application/sparql-results+json` out), rewrites the manifest's
  * placeholder endpoint IRI in the query text to the live URL, and
  * evaluates — so the rendered sub-query, the bound-join VALUES
  * injection, the executor-side JSON decode, and the compatible join
  * are all exercised exactly as they would be against a remote store.
  *
  * The special placeholder <http://dead.invalid/sparql> is NOT brought
  * up — it stays an unroutable endpoint for the SERVICE SILENT failure
  * semantics (§18.8: a failing SILENT service evaluates to μ0).
  */
class W3cServiceSpec extends SparkSpec with W3cHarness {

  private val DeadEndpoint = "http://dead.invalid/sparql"

  for (t <- loadManifest("service")) {
    test(s"w3c/service: ${t.name}") {
      if (t.negativeSyntax) {
        val thrown = intercept[Exception] {
          Engine.inline("").selectRaw(res("service", t.query))
        }
        assert(thrown.isInstanceOf[GraftException] ||
          thrown.isInstanceOf[graft.sparql.SparqlParseException] ||
          thrown.isInstanceOf[IllegalArgumentException],
          s"${t.query}: expected a rejection, got $thrown")
      } else {
        val live = t.serviceData.filterNot(_._1 == DeadEndpoint)
          .map { case (ep, file) => ep -> startEndpoint(res("service", file)) }
        try {
          var queryText = res("service", t.query)
          for ((ep, (_, url)) <- live)
            queryText = queryText.replace(s"<$ep>", s"<$url>")
          val engine = Engine.inline(
            if (t.data.isEmpty) "" else res("service", t.data))
          loadResult("service", t.result) match {
            case ExpectedBool(want) =>
              assert(engine.ask(queryText) === want, s"ASK ${t.query}")
            case want: ExpectedRows =>
              val (gotVars, gotRows) = runSelect(engine, queryText)
              assertRowsMatch(t.query, want, gotVars, gotRows)
          }
        } finally live.foreach(_._2._1.stop(0))
      }
    }
  }
}
