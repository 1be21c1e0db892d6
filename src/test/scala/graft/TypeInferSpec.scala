package graft

import graft.sparql.{Ast, Compiler, Parser, TypeInfer}

/** The static display-type path (TypeInfer + Display.toDisplayStatic) must
  * decide exactly what the data-driven sniff (Display.toDisplay) would have
  * decided — the singleton soundness rule. These cases cover the oracle
  * query shapes over schema-typed graphs (Tables.predObjTypes present).
  */
class TypeInferSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val P =
    """PREFIX gp: <urn:graft:p/>
      |PREFIX g: <urn:graft:>
      |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |""".stripMargin

  /** Compile once; render through both paths; results must match exactly. */
  private def check(tables: Seq[String], sparql: String): Unit = {
    val g = Tables.graph(spark, dir, tables: _*)
    val q = new Parser(g.prefixes).parseQuery(P + sparql).query match {
      case s: Ast.SelectQuery => s
      case other => fail(s"not a SELECT: $other")
    }
    val raw = new Compiler(g, spark).compileSelect(q)
    val dec = TypeInfer.selectDecisions(q, g)
    assert(dec.isDefined, s"expected a static decision for: $sparql")
    val static = Display.toDisplayStatic(raw, dec.get, g.prefixes)
    val sniffed = Display.toDisplay(raw, g.prefixes)
    assert(static.schema == sniffed.schema,
      s"schema mismatch\nstatic:  ${static.schema}\nsniffed: ${sniffed.schema}")
    val a = static.collect().map(_.toString).sorted.toSeq
    val b = sniffed.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"row mismatch for: $sparql")
  }

  test("static == sniffed: BGP join with FK refs") {
    check(Seq("customer", "nation"),
      """SELECT ?cname ?nname {
           ?c gp:c_nation_ref ?n . ?c gp:c_name ?cname . ?n gp:n_name ?nname }""")
  }

  test("static == sniffed: BIND arithmetic stays integral") {
    check(Seq("nation"),
      """SELECT ?name ?x { ?n gp:n_name ?name . ?n gp:n_nationkey ?k
           BIND(?k * 2 + 1 AS ?x) }""")
  }

  test("static == sniffed: aggregate suite over doubles") {
    check(Seq("lineitem"),
      """SELECT ?flag (SUM(?q) AS ?sum_qty) (AVG(?q) AS ?avg_qty)
                (MIN(?q) AS ?min_qty) (MAX(?q) AS ?max_qty) (COUNT(*) AS ?n) {
           ?l gp:l_returnflag ?flag . ?l gp:l_quantity ?q } GROUP BY ?flag""")
  }

  test("static == sniffed: OPTIONAL leaves nullable typed column") {
    check(Seq("customer", "orders"),
      """SELECT ?cname ?okey {
           ?c gp:c_name ?cname
           OPTIONAL { ?o gp:o_cust_ref ?c . ?o gp:o_orderkey ?okey .
                      ?o gp:o_totalprice ?tp FILTER(?tp > 400000.0) } }""")
  }

  test("static == sniffed: dates and extracted parts") {
    check(Seq("orders"),
      """SELECT ?okey ?od ?yr {
           ?o gp:o_orderkey ?okey . ?o gp:o_orderdate ?od
           BIND(YEAR(?od) AS ?yr) FILTER(MONTH(?od) <= 2) }""")
  }

  test("static == sniffed: property-path sequence + aggregate") {
    check(Seq("lineitem", "orders", "customer"),
      """SELECT ?cname (COUNT(*) AS ?cnt) {
           ?l gp:l_order_ref/gp:o_cust_ref/gp:c_name ?cname } GROUP BY ?cname""")
  }

  test("predObjTypes survives DELETE: post-delete select stays static " +
    "and matches the sniff") {
    val g = Tables.graph(spark, dir, "region")
    val e = Engine.fromGraph(g)
    val pre = P + """DELETE { ?r gp:r_name ?n }
      WHERE { ?r gp:r_regionkey ?k . ?r gp:r_name ?n FILTER(?k = 0) }"""
    e.update(pre)
    val post = e.graph
    assert(post.predObjTypes.nonEmpty,
      "delete must retain the schema metadata (types can only shrink)")
    val q = new Parser(post.prefixes)
      .parseQuery(P + "SELECT ?name ?k { ?r gp:r_name ?name . " +
        "?r gp:r_regionkey ?k }").query.asInstanceOf[Ast.SelectQuery]
    val raw = new Compiler(post, spark).compileSelect(q)
    val dec = TypeInfer.selectDecisions(q, post)
    assert(dec.isDefined, "post-delete query must type statically")
    val static = Display.toDisplayStatic(raw, dec.get, post.prefixes)
    val sniffed = Display.toDisplay(raw, post.prefixes)
    assert(static.schema == sniffed.schema)
    assert(static.collect().map(_.toString).sorted.toSeq ==
      sniffed.collect().map(_.toString).sorted.toSeq)
  }

  test("mixed-type column falls back to sniff (None)") {
    val g = Tables.graph(spark, dir, "customer", "supplier")
    // ?x ranges over two predicates with different datatypes via UNION
    val q = new Parser(g.prefixes).parseQuery(P +
      """SELECT ?x { { ?c gp:c_name ?x } UNION { ?s gp:s_acctbal ?x } }""")
      .query.asInstanceOf[Ast.SelectQuery]
    assert(TypeInfer.selectDecisions(q, g).isEmpty)
  }

  test("untyped graph (no metadata) falls back to sniff (None)") {
    val e = Engine.inline("@prefix : <http://example.com/> . :a :b 5 .")
    val q = new Parser(e.graph.prefixes)
      .parseQuery("PREFIX : <http://example.com/> SELECT ?o { ?s :b ?o }")
      .query.asInstanceOf[Ast.SelectQuery]
    assert(TypeInfer.selectDecisions(q, e.graph).isEmpty)
  }
}
