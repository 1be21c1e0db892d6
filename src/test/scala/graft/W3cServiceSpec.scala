package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.rdf._
import graft.sources.SparqlResults

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

  /** A live SPARQL-protocol endpoint over `dataTtl`: parses the POSTed
    * form body, evaluates the decoded query on an inline engine, and
    * answers results-JSON (HTTP 500 on any evaluation error, which is
    * what a conforming client must treat as service failure). */
  private def startEndpoint(dataTtl: String): (HttpServer, String) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val query = body.split("&").collectFirst {
        case p if p.startsWith("query=") =>
          java.net.URLDecoder.decode(p.substring("query=".length), "UTF-8")
      }.getOrElse("")
      val answer =
        try Right(SparqlResults.json(Engine.inline(dataTtl).selectRaw(query)))
        catch { case e: Exception => Left(e.toString) }
      answer match {
        case Right(json) =>
          val out = json.getBytes(UTF_8)
          ex.getResponseHeaders.add("Content-Type",
            "application/sparql-results+json")
          ex.sendResponseHeaders(200, out.length)
          ex.getResponseBody.write(out)
        case Left(err) =>
          val out = err.getBytes(UTF_8)
          ex.sendResponseHeaders(500, out.length)
          ex.getResponseBody.write(out)
      }
      ex.close()
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
  }

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
