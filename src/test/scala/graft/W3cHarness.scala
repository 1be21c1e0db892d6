package graft

import org.apache.spark.sql.Row

import graft.rdf._
import graft.sources.Turtle

/** Shared machinery for the manifest-driven W3C conformance suites
  * ([[W3cSparqlSpec]], [[W3cServiceSpec]]): manifest/result-set fixture
  * loading in the upstream `w3c/rdf-tests` vocabulary, the raw-select
  * runner, and the REC's result-set equivalence (multiset equality
  * modulo a blank-node bijection, value-normalized numerics).
  *
  * Everything here is fixture-format plumbing — the suites that mix it
  * in own their execution policy (which categories, how SERVICE
  * endpoints come up, what counts as a rejection).
  */
trait W3cHarness { this: org.scalatest.Assertions =>

  protected val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  protected val QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  protected val RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"
  protected val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  // ------------------------------------------------------------ loading

  protected def res(cat: String, name: String): String = {
    val path = s"/w3c/$cat/$name"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Tiny in-memory graph view over a driver-side triple list. */
  protected final class MiniGraph(ts: Seq[(RdfTerm, RdfTerm, RdfTerm)]) {
    private val bySP = ts.groupBy(t => (t._1, t._2))
    def objs(s: RdfTerm, p: String): Seq[RdfTerm] =
      bySP.getOrElse((s, Iri(p)), Nil).map(_._3)
    def obj(s: RdfTerm, p: String): Option[RdfTerm] = objs(s, p).headOption
    def subjectsOf(p: String, o: RdfTerm): Seq[RdfTerm] =
      ts.collect { case (s, Iri(`p`), `o`) => s }
    /** rdf:List starting at `head` → member terms in order. */
    def list(head: RdfTerm): Seq[RdfTerm] = head match {
      case Iri(i) if i == RDFNS + "nil" => Nil
      case n =>
        val first = obj(n, RDFNS + "first").getOrElse(
          sys.error(s"malformed rdf:List at $n"))
        val rest = obj(n, RDFNS + "rest").getOrElse(
          sys.error(s"malformed rdf:List at $n"))
        first +: list(rest)
    }
  }

  /** `result`/`data` are empty for (Positive|Negative)SyntaxTest11
    * entries, whose mf:action is the query IRI itself (the upstream
    * convention). `serviceData` carries the federation fixtures of the
    * sparql11-fed layout: one (endpoint IRI, data file) per
    * `qt:serviceData [ qt:endpoint <…> ; qt:data <…> ]` node. */
  protected case class W3cTest(name: String, query: String, data: String,
      result: String, negativeSyntax: Boolean,
      positiveSyntax: Boolean = false,
      serviceData: Seq[(String, String)] = Nil)

  protected def loadManifest(cat: String): Seq[W3cTest] = {
    val g = new MiniGraph(Turtle.parseTriples(res(cat, "manifest.ttl")))
    val manifest = g.subjectsOf(RDFNS + "type", Iri(MF + "Manifest")) match {
      case Seq(m) => m
      case other => sys.error(s"$cat: expected one mf:Manifest, got $other")
    }
    val entries = g.list(g.obj(manifest, MF + "entries").getOrElse(
      sys.error(s"$cat: manifest has no mf:entries")))
    assert(entries.nonEmpty, s"$cat: empty manifest")
    entries.map { e =>
      val name = g.obj(e, MF + "name") match {
        case Some(Lit(lex, _, _)) => lex
        case other => sys.error(s"$cat: entry $e has no mf:name ($other)")
      }
      val negative = g.obj(e, RDFNS + "type")
        .contains(Iri(MF + "NegativeSyntaxTest11"))
      val positive = g.obj(e, RDFNS + "type")
        .contains(Iri(MF + "PositiveSyntaxTest11"))
      val action = g.obj(e, MF + "action").getOrElse(
        sys.error(s"$cat/$name: no mf:action"))
      def fileOf(t: Option[RdfTerm], what: String): String = t match {
        case Some(Iri(rel)) => rel // relative IRI = sibling resource name
        case other => sys.error(s"$cat/$name: bad $what ref: $other")
      }
      if (negative || positive)
        W3cTest(name, query = fileOf(Some(action), "mf:action"),
          data = "", result = "", negativeSyntax = negative,
          positiveSyntax = positive)
      else {
        val svc = g.objs(action, QT + "serviceData").map { sn =>
          val ep = g.obj(sn, QT + "endpoint") match {
            case Some(Iri(i)) => i
            case other => sys.error(s"$cat/$name: bad qt:endpoint: $other")
          }
          ep -> fileOf(g.obj(sn, QT + "data"), "qt:serviceData data")
        }
        W3cTest(name,
          query = fileOf(g.obj(action, QT + "query"), "qt:query"),
          data = g.obj(action, QT + "data")
            .map(d => fileOf(Some(d), "qt:data")).getOrElse(""),
          result = fileOf(g.obj(e, MF + "result"), "mf:result"),
          negativeSyntax = false, serviceData = svc)
      }
    }
  }

  // ----------------------------------------------------- expected results

  protected sealed trait Expected
  protected case class ExpectedBool(value: Boolean) extends Expected
  protected case class ExpectedRows(vars: Set[String],
      solutions: Seq[Map[String, RdfTerm]], ordered: Boolean) extends Expected

  protected def loadResult(cat: String, file: String): Expected = {
    val g = new MiniGraph(Turtle.parseTriples(res(cat, file)))
    val rs = g.subjectsOf(RDFNS + "type", Iri(RS + "ResultSet")) match {
      case Seq(r) => r
      case other => sys.error(s"$cat/$file: expected one rs:ResultSet: $other")
    }
    g.obj(rs, RS + "boolean") match {
      case Some(Lit(lex, _, _)) => ExpectedBool(lex == "true" || lex == "1")
      case _ =>
        val vars = g.objs(rs, RS + "resultVariable")
          .collect { case Lit(lex, _, _) => lex }.toSet
        val solNodes = g.objs(rs, RS + "solution")
        val indexed = solNodes.map { sn =>
          val idx = g.obj(sn, RS + "index") match {
            case Some(Lit(lex, _, _)) => Some(BigInt(lex))
            case _ => None
          }
          val bindings = g.objs(sn, RS + "binding").map { bn =>
            val v = g.obj(bn, RS + "variable") match {
              case Some(Lit(lex, _, _)) => lex
              case other => sys.error(s"$cat/$file: bad rs:variable $other")
            }
            val value = g.obj(bn, RS + "value").getOrElse(
              sys.error(s"$cat/$file: binding without rs:value"))
            v -> value
          }.toMap
          (idx, bindings)
        }
        val ordered = indexed.exists(_._1.isDefined)
        val sols =
          if (ordered) {
            assert(indexed.forall(_._1.isDefined),
              s"$cat/$file: mixed indexed/unindexed solutions")
            indexed.sortBy(_._1.get).map(_._2)
          } else indexed.map(_._2)
        ExpectedRows(vars, sols, ordered)
    }
  }

  // ------------------------------------------------- live SPARQL endpoint

  /** A live SPARQL-protocol endpoint over `dataTtl`: parses the POSTed
    * form body, evaluates the decoded query on an inline engine, and
    * answers results-JSON (HTTP 500 on any evaluation error, which is
    * what a conforming client must treat as service failure). Used by
    * the SERVICE suites so the rendered sub-query, bound-join VALUES
    * injection, and executor-side decode run over the real wire. */
  protected def startEndpoint(dataTtl: String)(
      implicit spark: org.apache.spark.sql.SparkSession)
      : (com.sun.net.httpserver.HttpServer, String) = {
    import java.nio.charset.StandardCharsets.UTF_8
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparql", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val query = body.split("&").collectFirst {
        case p if p.startsWith("query=") =>
          java.net.URLDecoder.decode(p.substring("query=".length), "UTF-8")
      }.getOrElse("")
      val answer =
        try Right(graft.sources.SparqlResults.json(
          Engine.inline(dataTtl).selectRaw(query)))
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

  // ------------------------------------------------------------- running

  protected def rowTerm(r: Row): RdfTerm =
    r.getByte(0) match {
      case Terms.KIND_IRI => Iri(r.getString(1))
      case Terms.KIND_BLANK => Blank(r.getString(1))
      case Terms.KIND_TRIPLE => Terms.unpackString(r.getString(1))
      case _ => Lit(r.getString(1), r.getString(2), r.getString(3))
    }

  protected def runSelect(e: Engine, query: String)
      : (Set[String], Seq[Map[String, RdfTerm]]) = {
    val df = e.selectRaw(query)
    val vars = df.columns.toSeq
    val rows = df.collect().map { row =>
      vars.zipWithIndex.flatMap { case (v, i) =>
        if (row.isNullAt(i)) None
        else Some(v -> rowTerm(row.getStruct(i)))
      }.toMap
    }
    (vars.toSet, rows.toSeq)
  }

  // ---------------------------------------------------------- comparison

  /** Value-normalize a term so spec-equal answers with different
    * lexical forms compare equal: numeric literals by numeric value
    * WITHIN their exact datatype (AVG(1,3) may print "2" or "2.0";
    * xsd:integer stays distinct from xsd:decimal), booleans to
    * true/false, doubles/floats via double value. */
  protected def norm(t: RdfTerm): RdfTerm = t match {
    case Lit(lex, dt, null) if dt == XSD.double || dt == XSD.float =>
      val d = try lex.toDouble catch { case _: Exception => return t }
      Lit(d.toString, dt, null)
    case Lit(lex, dt, null) if XSD.numeric(dt) =>
      val v = try BigDecimal(lex) catch { case _: Exception => return t }
      Lit(v.underlying.stripTrailingZeros.toPlainString, dt, null)
    case Lit(lex, dt, null) if dt == XSD.boolean =>
      Lit(if (lex == "true" || lex == "1") "true" else "false", dt, null)
    case Lit(lex, dt, lang) if lang != null =>
      Lit(lex, dt, lang.toLowerCase) // BCP47 tags are case-insensitive
    case other => other
  }

  protected def normSol(m: Map[String, RdfTerm]): Map[String, RdfTerm] =
    m.map { case (k, v) => k -> norm(v) }

  /** Multiset (or sequence) equality modulo a blank-node bijection —
    * the W3C result-set equivalence. Backtracking over solution
    * pairings with a consistent expected-label → got-label mapping;
    * result sets here are small, so worst case is trivial. */
  protected def isomorphic(expected: Seq[Map[String, RdfTerm]],
      got: Seq[Map[String, RdfTerm]], ordered: Boolean): Boolean = {
    if (expected.size != got.size) return false

    def solCompatible(a: Map[String, RdfTerm], b: Map[String, RdfTerm],
        map: Map[String, String]): Option[Map[String, String]] = {
      if (a.keySet != b.keySet) return None
      var m = map
      val inv = scala.collection.mutable.Map[String, String]() ++
        m.map(_.swap)
      for ((k, av) <- a) {
        (av, b(k)) match {
          case (Blank(x), Blank(y)) =>
            (m.get(x), inv.get(y)) match {
              case (Some(y0), _) if y0 != y => return None
              case (_, Some(x0)) if x0 != x => return None
              case _ => m += (x -> y); inv += (y -> x)
            }
          case (x, y) => if (x != y) return None
        }
      }
      Some(m)
    }

    if (ordered) {
      var m = Map[String, String]()
      expected.zip(got).forall { case (a, b) =>
        solCompatible(a, b, m) match {
          case Some(m2) => m = m2; true
          case None => false
        }
      }
    } else {
      def assign(rest: List[Map[String, RdfTerm]],
          avail: List[Map[String, RdfTerm]],
          map: Map[String, String]): Boolean = rest match {
        case Nil => true
        case a :: tail =>
          avail.zipWithIndex.exists { case (b, i) =>
            solCompatible(a, b, map) match {
              case Some(m2) =>
                assign(tail, avail.patch(i, Nil, 1), m2)
              case None => false
            }
          }
      }
      assign(expected.toList, got.toList, Map.empty)
    }
  }

  protected def render(sols: Seq[Map[String, RdfTerm]]): String =
    sols.map(s => s.toSeq.sortBy(_._1)
        .map { case (k, v) => s"?$k=${v.n3()}" }.mkString("{", " ", "}"))
      .mkString("\n  ", "\n  ", "")

  /** Compare a run's (vars, rows) against an [[ExpectedRows]]. */
  protected def assertRowsMatch(label: String, want: ExpectedRows,
      gotVars: Set[String], gotRows: Seq[Map[String, RdfTerm]]): Unit = {
    assert(gotVars == want.vars, s"projected variables differ in $label")
    val e = want.solutions.map(normSol)
    val g = gotRows.map(normSol)
    assert(isomorphic(e, g, want.ordered),
      s"$label: expected${render(e)}\ngot${render(g)}")
  }
}
