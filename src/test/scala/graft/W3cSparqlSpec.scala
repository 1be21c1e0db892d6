package graft

import scala.math.BigDecimal

import graft.rdf._
import graft.sources.Turtle

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
  * Comparison is the W3C one: result sets match when there is a blank
  * node bijection under which they are equal as multisets (sequences
  * when the expected file carries `rs:index`); numeric literals
  * compare by value within their exact datatype, everything else by
  * term. The runner is intentionally dumb: it discovers everything
  * from the manifests, so dropping a new W3C-format test file in makes
  * it run with no Scala change.
  *
  * Skip policy (documented per the upstream harness convention): tests
  * whose outcome is implementation-defined are not authored at all —
  * ORDER BY across incomparable literal types, SAMPLE/GROUP_CONCAT
  * value choice under multi-element groups (covered instead by
  * order-independent formulations), and syntax-only tests (the parser
  * has its own caret-error specs).
  */
class W3cSparqlSpec extends SparkSpec {

  private val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  private val RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"
  private val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private val categories =
    Seq("algebra", "negation", "aggregates", "property-path",
      "functions", "bindings", "exists", "graph", "syntax")

  // ------------------------------------------------------------ loading

  private def res(cat: String, name: String): String = {
    val path = s"/w3c/$cat/$name"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Tiny in-memory graph view over a driver-side triple list. */
  private final class MiniGraph(ts: Seq[(RdfTerm, RdfTerm, RdfTerm)]) {
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
    * convention). */
  private case class W3cTest(name: String, query: String, data: String,
      result: String, negativeSyntax: Boolean,
      positiveSyntax: Boolean = false)

  private def loadManifest(cat: String): Seq[W3cTest] = {
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
      else
        W3cTest(name,
          query = fileOf(g.obj(action, QT + "query"), "qt:query"),
          data = fileOf(g.obj(action, QT + "data"), "qt:data"),
          result = fileOf(g.obj(e, MF + "result"), "mf:result"),
          negativeSyntax = false)
    }
  }

  // ----------------------------------------------------- expected results

  private sealed trait Expected
  private case class ExpectedBool(value: Boolean) extends Expected
  private case class ExpectedRows(vars: Set[String],
      solutions: Seq[Map[String, RdfTerm]], ordered: Boolean) extends Expected

  private def loadResult(cat: String, file: String): Expected = {
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

  // ------------------------------------------------------------- running

  private def rowTerm(r: org.apache.spark.sql.Row): RdfTerm =
    r.getByte(0) match {
      case Terms.KIND_IRI => Iri(r.getString(1))
      case Terms.KIND_BLANK => Blank(r.getString(1))
      case _ => Lit(r.getString(1), r.getString(2), r.getString(3))
    }

  private def runSelect(e: Engine, query: String)
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
  private def norm(t: RdfTerm): RdfTerm = t match {
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

  private def normSol(m: Map[String, RdfTerm]): Map[String, RdfTerm] =
    m.map { case (k, v) => k -> norm(v) }

  /** Multiset (or sequence) equality modulo a blank-node bijection —
    * the W3C result-set equivalence. Backtracking over solution
    * pairings with a consistent expected-label → got-label mapping;
    * result sets here are small, so worst case is trivial. */
  private def isomorphic(expected: Seq[Map[String, RdfTerm]],
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

  private def render(sols: Seq[Map[String, RdfTerm]]): String =
    sols.map(s => s.toSeq.sortBy(_._1)
        .map { case (k, v) => s"?$k=${v.n3()}" }.mkString("{", " ", "}"))
      .mkString("\n  ", "\n  ", "")

  // --------------------------------------------------------------- tests

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
        case ExpectedRows(wantVars, wantSols, ordered) =>
          val (gotVars, gotRows) = runSelect(engine, queryText)
          assert(gotVars === wantVars,
            s"projected variables differ in ${t.query}")
          val e = wantSols.map(normSol)
          val g = gotRows.map(normSol)
          assert(isomorphic(e, g, ordered),
            s"${t.query}: expected${render(e)}\ngot${render(g)}")
      }
      }
    }
  }
}
