package graft

import graft.rdf._
import graft.sources.Turtle

/** Manifest-driven SPARQL 1.1 UPDATE evaluation suite, modeled on the
  * public W3C harness (`w3c/rdf-tests`, `sparql/sparql11/data-sparql11/`
  * update families, `ut:` = `http://www.w3.org/2009/sparql/tests/
  * test-update#`). Companion to [[W3cSparqlSpec]] (query evaluation)
  * and [[W3cRdfSyntaxSpec]] (document grammars).
  *
  * Each entry is an `mf:UpdateEvaluationTest`: `mf:action` carries
  * `ut:request` (the update text) and optional `ut:data` (the default
  * graph's PRE state, Turtle); `mf:result` carries `ut:data` (the POST
  * state). The runner feeds the pre graph to an [[Engine]], applies the
  * request, and compares the resulting default graph to the post graph
  * under RDF graph isomorphism (blank-node bijection — what templates
  * with fresh blank nodes require). Restricted to this engine's
  * documented default-graph update surface (INSERT/DELETE DATA, DELETE
  * WHERE, DELETE/INSERT WHERE, CLEAR, `;` sequences), like the
  * reference's rdflib update path. Fixtures are authored from the
  * SPARQL 1.1 Update REC's operation semantics — notably that a Modify
  * instantiates BOTH templates against the pre-state bindings, and that
  * template blank nodes are fresh per solution.
  */
class W3cUpdateSpec extends SparkSpec {

  private val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val UT = "http://www.w3.org/2009/sparql/tests/test-update#"
  private val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private def res(name: String): String = {
    val path = s"/w3c/update/$name"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private final class MiniGraph(ts: Seq[(RdfTerm, RdfTerm, RdfTerm)]) {
    private val bySP = ts.groupBy(t => (t._1, t._2))
    def objs(s: RdfTerm, p: String): Seq[RdfTerm] =
      bySP.getOrElse((s, Iri(p)), Nil).map(_._3)
    def obj(s: RdfTerm, p: String): Option[RdfTerm] = objs(s, p).headOption
    def subjectsOf(p: String, o: RdfTerm): Seq[RdfTerm] =
      ts.collect { case (s, Iri(`p`), `o`) => s }
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

  /** One named graph of a pre/post state: `ut:graphData [ ut:graph
    * <file> ; rdfs:label "iri" ]` — the upstream harness's shape for
    * graph-update tests. */
  private case class GraphData(file: String, name: String)

  private case class UpdateTest(name: String, request: String,
      pre: Option[String], preGraphs: Seq[GraphData],
      post: String, postGraphs: Seq[GraphData], negative: Boolean)

  private def loadManifest(): Seq[UpdateTest] = {
    val g = new MiniGraph(Turtle.parseTriples(res("manifest.ttl")))
    val manifest = g.subjectsOf(RDFNS + "type", Iri(MF + "Manifest")) match {
      case Seq(m) => m
      case other => sys.error(s"update: expected one mf:Manifest, got $other")
    }
    val entries = g.list(g.obj(manifest, MF + "entries").getOrElse(
      sys.error("update: manifest has no mf:entries")))
    assert(entries.nonEmpty, "update: empty manifest")
    entries.map { e =>
      val name = g.obj(e, MF + "name") match {
        case Some(Lit(lex, _, _)) => lex
        case other => sys.error(s"update: entry $e has no mf:name ($other)")
      }
      def fileOf(t: Option[RdfTerm], what: String): Option[String] = t match {
        case Some(Iri(rel)) => Some(rel)
        case None => None
        case other => sys.error(s"update/$name: bad $what ref: $other")
      }
      val action = g.obj(e, MF + "action").getOrElse(
        sys.error(s"update/$name: no mf:action"))
      val negative = g.obj(e, RDFNS + "type")
        .contains(Iri(UT + "NegativeUpdateTest"))
      def graphsOf(node: RdfTerm): Seq[GraphData] =
        g.objs(node, UT + "graphData").map { gd =>
          val file = g.obj(gd, UT + "graph") match {
            case Some(Iri(rel)) => rel
            case other => sys.error(s"update/$name: bad ut:graph: $other")
          }
          val label = g.obj(gd, "http://www.w3.org/2000/01/rdf-schema#label") match {
            case Some(Lit(lex, _, _)) => lex
            case other => sys.error(s"update/$name: graphData needs rdfs:label: $other")
          }
          GraphData(file, label)
        }
      val (post, postGraphs) =
        if (negative) ("", Nil)
        else {
          val result = g.obj(e, MF + "result").getOrElse(
            sys.error(s"update/$name: no mf:result"))
          (fileOf(g.obj(result, UT + "data"), "result ut:data")
            .getOrElse(sys.error(s"update/$name: no result ut:data")),
            graphsOf(result))
        }
      UpdateTest(name,
        request = fileOf(g.obj(action, UT + "request"), "ut:request")
          .getOrElse(sys.error(s"update/$name: no ut:request")),
        pre = fileOf(g.obj(action, UT + "data"), "ut:data"),
        preGraphs = graphsOf(action),
        post = post, postGraphs = postGraphs, negative = negative)
    }
  }

  // --------------------------------------------------------- comparison

  private def rowTerm(r: org.apache.spark.sql.Row): RdfTerm =
    r.getByte(0) match {
      case Terms.KIND_IRI => Iri(r.getString(1))
      case Terms.KIND_BLANK => Blank(r.getString(1))
      case Terms.KIND_TRIPLE => Terms.unpackString(r.getString(1))
      case _ => Lit(r.getString(1), r.getString(2), r.getString(3))
    }

  private def storeQuads(e: Engine): Seq[Canon.Quad] = {
    val quads = e.graph.isQuads
    e.graph.triples.collect().toSeq.map { r =>
      (rowTerm(r.getStruct(0)), rowTerm(r.getStruct(1)),
        rowTerm(r.getStruct(2)),
        if (quads && !r.isNullAt(3)) rowTerm(r.getStruct(3))
        else null: RdfTerm)
    }
  }

  /** Dataset isomorphism via RDFC-1.0 canonical forms — [[Canon]] makes
    * the comparison one string equality. */
  private def isomorphic(a: Seq[Canon.Quad], b: Seq[Canon.Quad]): Boolean =
    Canon.isomorphic(a, b)

  private def n3g(g: RdfTerm): String = if (g == null) "" else s" ${g.n3()}"
  private def render(ts: Seq[Canon.Quad]): String =
    ts.map(t => s"${t._1.n3()} ${t._2.n3()} ${t._3.n3()}${n3g(t._4)} .")
      .sorted.mkString("\n  ", "\n  ", "")

  /** The dataset a pre/post description denotes: ut:data is the default
    * graph, each ut:graphData a named graph. Quad-store shaped as soon
    * as either side of the test mentions a named graph. */
  private def datasetQuads(data: Option[String],
      graphs: Seq[GraphData]): Seq[Canon.Quad] =
    data.toSeq.flatMap(f => Turtle.parseTriples(res(f)))
      .map(t => (t._1, t._2, t._3, null: RdfTerm)) ++
      graphs.flatMap(gd => Turtle.parseTriples(res(gd.file))
        .map(t => (t._1, t._2, t._3, Iri(gd.name): RdfTerm)))

  private def engineFor(t: UpdateTest, quadStore: Boolean): Engine =
    if (!quadStore) t.pre match {
      case Some(f) => Engine.inline(res(f))
      case None => Engine.inline("")
    } else Engine.fromGraph(RdfGraph.fromQuads(spark,
      datasetQuads(t.pre, t.preGraphs)
        .map(q => (q._1, q._2, q._3, Option(q._4)))))

  // --------------------------------------------------------------- tests

  for (t <- loadManifest()) {
    test(s"w3c/update: ${t.name}") {
      val quadStore = t.preGraphs.nonEmpty || t.postGraphs.nonEmpty
      val engine = engineFor(t, quadStore)
      if (t.negative) {
        // the request must be REJECTED (spec-invalid update shape),
        // leaving the store untouched
        val before = storeQuads(engine)
        intercept[GraftException](engine.update(res(t.request)))
        assert(isomorphic(before, storeQuads(engine)),
          s"${t.request}: a rejected update must not change the store")
      } else {
        engine.update(res(t.request))
        val got = storeQuads(engine)
        val want = datasetQuads(Some(t.post), t.postGraphs)
        assert(isomorphic(want, got),
          s"${t.request}: stores differ\nexpected:${render(want)}\n" +
            s"got:${render(got)}")
      }
    }
  }
}
