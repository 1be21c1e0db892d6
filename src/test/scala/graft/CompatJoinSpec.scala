package graft

/** SPARQL compatible-join semantics (spec §18.5 Join/Minus): an UNBOUND
  * shared variable is compatible with anything and the joined solution
  * takes the bound side's value. Spark's equi-join drops null keys, so
  * these shapes need the Compiler's condition-join path — each test here
  * failed (lost solutions) before it existed. */
class CompatJoinSpec extends SparkSpec {

  private val ttl =
    """
      @prefix : <http://example.com/> .
      :a :p :x .
      :b :q :whatever .
      :a :r :x .
      :b :r :y .
    """

  private def fresh(): Engine = {
    val e = Engine.inline(ttl)
    e.bindNamespace("", "http://example.com/")
    e
  }

  test("UNION-padded var still joins (unbound matches anything)") {
    val df = fresh().select(
      """SELECT ?s ?x {
           { ?s :p ?x } UNION { ?s :q ?z }
           ?s :r ?x
         } ORDER BY ?s""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // branch 1 binds ?x=:x and joins :a :r :x; branch 2 leaves ?x unbound,
    // which is compatible with :b :r :y — the join must fill ?x = :y
    assert(rows == Seq((":a", ":x"), (":b", ":y")))
  }

  test("OPTIONAL-padded var still joins downstream") {
    val df = fresh().select(
      """SELECT ?s ?x {
           ?s :r ?o
           OPTIONAL { ?s :p ?x }
           ?s :r ?x
         } ORDER BY ?s""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq((":a", ":x"), (":b", ":y")))
  }

  test("MINUS removes partially-bound solutions with overlapping domain") {
    val df = fresh().select(
      """SELECT ?s {
           { ?s :p ?x } UNION { ?s :q ?z }
           MINUS { ?s :r ?x }
         }""")
    // μ1 = {s=:a, x=:x} — μ2 = {s=:a, x=:x} compatible, overlap → removed.
    // μ1 = {s=:b} (x unbound) — μ2 = {s=:b, x=:y} compatible, dom overlap
    // on ?s → removed. Nothing survives.
    assert(df.count() == 0)
  }

  test("MINUS disjoint-domain rule still holds with maybe-unbound vars") {
    val df = fresh().select(
      """SELECT ?s {
           { ?s :p ?o1 } UNION { ?s :q ?o2 }
           MINUS { ?nothere :nope ?x }
         }""")
    assert(df.count() == 2) // no shared vars → nothing removed
  }

  test("bound-both-sides joins keep the equi-join fast path") {
    val df = fresh().selectRaw(
      "SELECT ?s ?x { ?s :p ?x . ?s :r ?x }")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"certain-bound join must stay an equi-join:\n$plan")
    assert(df.count() == 1)
  }

  test("EXISTS with a maybe-unbound outer var uses substitution semantics") {
    // outer ?x unbound on the :b branch → not substituted → the inner
    // pattern's ?x is free, and { ?s :r ?x } matches for :b → EXISTS true
    val df = fresh().select(
      """SELECT ?s {
           { ?s :p ?x } UNION { ?s :q ?z }
           FILTER EXISTS { ?s :r ?x }
         } ORDER BY ?s""")
    val rows = df.collect().map(_.getString(0)).toSeq
    assert(rows == Seq(":a", ":b"))
  }

  test("EXISTS whose inner pattern binds a shared var only optionally") {
    // inner solution for :a is { o=:x } with ?x UNBOUND (:a has no :q);
    // substituting the outer ?x = :x into the inner pattern leaves the
    // OPTIONAL free to fail while the required part matches → EXISTS true.
    // Before inner-side null compatibility this solution was lost.
    val df = fresh().select(
      """SELECT ?s {
           ?s :p ?x
           FILTER EXISTS { ?s :r ?o OPTIONAL { ?s :q ?x } }
         }""")
    assert(df.collect().map(_.getString(0)).toSeq == Seq(":a"))
  }

  test("NOT EXISTS with a maybe-unbound outer var") {
    val df = fresh().select(
      """SELECT ?s {
           { ?s :p ?x } UNION { ?s :q ?z }
           FILTER NOT EXISTS { ?s :r ?x }
         }""")
    // both :a (x bound, matches) and :b (x free, pattern matches) have a
    // witness → nothing survives
    assert(df.count() == 0)
  }

  test("path alternation is bag semantics: both-branch matches count twice") {
    val e = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :a :p :x . :a :q :x . :b :p :y .
      """)
    e.bindNamespace("", "http://example.com/")
    // (:a,:x) matches via :p AND via :q → 2 solutions; (:b,:y) → 1
    val n = Engine.one(e.select(
      "SELECT (COUNT(*) AS ?n) { ?s :p|:q ?o }"))
    assert(n == 3L)
    // ...while the transitive forms stay set-valued
    val star = Engine.one(e.select(
      "SELECT (COUNT(*) AS ?n) { :a (:p|:q)+ ?o }"))
    assert(star == 1L)
  }

  test("VALUES with UNDEF joins compatibly") {
    val df = fresh().select(
      """SELECT ?s ?x {
           VALUES (?s ?x) { (:a UNDEF) (:b :y) }
           ?s :r ?x
         } ORDER BY ?s""")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq((":a", ":x"), (":b", ":y")))
  }
}
