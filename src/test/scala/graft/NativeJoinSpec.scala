package graft

import org.apache.spark.sql.DataFrame

/** The native long-key join path (RdfGraph.predNat / StarTable.keyNat):
  * BGP and path joins over the relational direct mapping must run on the
  * raw 8-byte keys (`__nk:` companion columns), not on synthesized
  * IRI-string term structs — the difference between shuffling 8 bytes and
  * ~40 bytes per join key at 100 TB. These tests pin BOTH the plan shape
  * (join keys are the companions) and the results (identical to the
  * struct-join semantics). */
class NativeJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val P =
    """PREFIX gp: <urn:graft:p/>
      |""".stripMargin

  private def eng(tables: String*): Engine =
    Engine.fromGraph(Tables.graph(spark, dir, tables: _*))

  private def joinPlan(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("vertical-scan BGP join runs on native long keys") {
    val df = eng("customer", "nation").selectRaw(P +
      """SELECT ?cname ?nname {
           ?c gp:c_nation_ref ?n . ?n gp:n_name ?nname . ?c gp:c_name ?cname }""")
    val plan = joinPlan(df)
    assert(plan.contains("__nk:"),
      s"expected a native-key join in plan:\n$plan")
    assert(df.count() == 150)
  }

  test("path sequence joins on native long keys end-to-end") {
    val df = eng("lineitem", "orders", "customer").selectRaw(P +
      """SELECT ?cname (COUNT(*) AS ?cnt) {
           ?l gp:l_order_ref/gp:o_cust_ref/gp:c_name ?cname } GROUP BY ?cname""")
    val plan = joinPlan(df)
    // both chain links carry a template-compatible key → two long joins
    val nkJoins = "__nk:".r.findAllIn(plan).size
    assert(nkJoins >= 2, s"expected ≥2 native-key references in:\n$plan")
    // results identical to the relational ground truth
    val expected = Tables.read(spark, dir, "lineitem")
      .join(Tables.read(spark, dir, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .join(Tables.read(spark, dir, "customer"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .groupBy("c_name").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val got = df.collect()
      .map(r => (r.getStruct(0).getString(1), r.getStruct(1).getString(1).toLong))
      .toMap
    assert(got == expected)
  }

  test("star-table subject key joins natively against a vertical scan") {
    val df = eng("customer", "nation").selectRaw(P +
      """SELECT ?cname ?nname {
           ?c gp:c_nation_ref ?n . ?c gp:c_name ?cname .
           ?c gp:c_acctbal ?bal . ?n gp:n_name ?nname
           FILTER(?bal > 0.0) }""")
    assert(joinPlan(df).contains("__nk:"))
    assert(df.count() > 0)
  }

  test("constant IRI endpoint filters on the raw key (pushable predicate)") {
    val df = eng("customer", "nation").selectRaw(P +
      "SELECT ?c { ?c gp:c_nation_ref <urn:graft:nation/3> }")
    val plan = joinPlan(df)
    // the synthesized-IRI equality must be rewritten to c_nationkey = 3
    assert(plan.contains("c_nationkey"), s"raw-key filter missing in:\n$plan")
    val expected = Tables.read(spark, dir, "customer")
      .where("c_nationkey = 3").count()
    assert(df.count() == expected)
  }

  test("constant IRI that cannot match the template yields empty, not error") {
    val df = eng("customer", "nation").selectRaw(P +
      "SELECT ?c { ?c gp:c_nation_ref <urn:graft:nation/not-a-key> }")
    assert(df.count() == 0)
  }

  test("MINUS/EXISTS anti-semi joins use native keys") {
    val e = eng("customer", "orders")
    val df = e.selectRaw(P +
      """SELECT ?cname { ?c gp:c_name ?cname
           MINUS { ?o gp:o_cust_ref ?c . ?o gp:o_totalprice ?tp
                   FILTER(?tp > 400000.0) } }""")
    assert(joinPlan(df).contains("__nk:"))
    val exp = {
      val c = Tables.read(spark, dir, "customer")
      val o = Tables.read(spark, dir, "orders").where("o_totalprice > 400000.0")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    }
    assert(df.count() == exp)
  }

  test("subquery aggregate keeps its group key native for the outer join") {
    val df = eng("customer", "nation").selectRaw(P +
      """SELECT ?nname ?cnt { ?n gp:n_name ?nname
           { SELECT ?n (COUNT(*) AS ?cnt) { ?c gp:c_nation_ref ?n } GROUP BY ?n } }""")
    val plan = joinPlan(df)
    assert(plan.contains("__nk:"),
      s"aggregate-then-join should run on the raw key:\n$plan")
    val expected = Tables.read(spark, dir, "customer")
      .groupBy("c_nationkey").count()
      .join(Tables.read(spark, dir, "nation"),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .select("n_name", "count").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val got = df.collect()
      .map(r => (r.getStruct(0).getString(1), r.getStruct(1).getString(1).toLong))
      .toMap
    assert(got == expected)
  }

  test("OPTIONAL keeps native keys for the matched side") {
    val df = eng("customer", "orders").selectRaw(P +
      """SELECT ?cname ?okey {
           ?c gp:c_name ?cname
           OPTIONAL { ?o gp:o_cust_ref ?c . ?o gp:o_orderkey ?okey } }""")
    assert(joinPlan(df).contains("__nk:"))
    val left = Tables.read(spark, dir, "customer").count()
    val inner = Tables.read(spark, dir, "orders").count()
    // every order matches a customer; customers without orders null-pad
    assert(df.count() >= math.max(left, inner))
    assert(df.where("okey is null").count() ==
      Tables.read(spark, dir, "customer").join(
        Tables.read(spark, dir, "orders"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"),
        "left_anti").count())
  }
}
