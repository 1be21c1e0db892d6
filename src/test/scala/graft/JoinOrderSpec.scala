package graft.sparql

import graft.{Engine, SparkSpec}
import graft.rdf.{Iri, RdfGraph}
import graft.sources.{GraphStore, Turtle}
import Ast._

/** Statistics-driven BGP join ordering (SURVEY §4.2's S2RDF lever):
  * within one constant-shape class, the pattern with the SMALLER
  * estimated predicate cardinality compiles first, so the greedy
  * connected-join grows from the most selective relation. Pins the
  * ordering function directly (stats flip the order; no stats keep the
  * author's order), the stats plumbing end-to-end (parse-time counts,
  * GraphStore sidecar round-trip), and the compiled plan shape. */
class JoinOrderSpec extends SparkSpec {

  private val ex = "http://example/"
  private def tp(s: String, p: String, o: String): TriplePattern =
    TriplePattern(VarNode(s), VerbNode(TermNode(Iri(ex + p))), VarNode(o))

  /** dense: 60 triples of :dense, 3 of :sparse, chained a→b→c. */
  private lazy val skewed: Engine = {
    val sb = new StringBuilder(s"@prefix : <$ex> .\n")
    for (i <- 0 until 60) sb.append(s":a$i :dense :b${i % 3} .\n")
    for (i <- 0 until 3) sb.append(s":b$i :sparse :c$i .\n")
    Engine.inline(sb.toString)
  }

  test("parse-time stats are exact") {
    assert(skewed.graph.predCounts === Map(
      ex + "dense" -> 60L, ex + "sparse" -> 3L))
  }

  test("equal-shape patterns order by ascending predicate cardinality") {
    val c = new Compiler(skewed.graph, spark)
    val dense = tp("a", "dense", "b")
    val sparse = tp("b", "sparse", "c")
    // author wrote dense first; stats flip it
    assert(c.patternOrder(Seq(dense, sparse)) === Seq(sparse, dense))
    // already-optimal order is kept
    assert(c.patternOrder(Seq(sparse, dense)) === Seq(sparse, dense))
  }

  test("without stats the author's order is kept (stable fallback)") {
    val noStats = new Compiler(skewed.graph.copy(predCounts = Map.empty), spark)
    val dense = tp("a", "dense", "b")
    val sparse = tp("b", "sparse", "c")
    assert(noStats.patternOrder(Seq(dense, sparse)) === Seq(dense, sparse))
  }

  test("shape class still dominates: a bound-object pattern beats stats") {
    val c = new Compiler(skewed.graph, spark)
    val denseBound = TriplePattern(VarNode("a"),
      VerbNode(TermNode(Iri(ex + "dense"))), TermNode(Iri(ex + "b0")))
    val sparse = tp("b", "sparse", "c")
    // constant object (score 6) outranks constant-predicate-only (2)
    assert(c.patternOrder(Seq(sparse, denseBound)) ===
      Seq(denseBound, sparse))
  }

  test("compiled plan starts from the sparse relation; results unchanged") {
    val q = s"""PREFIX : <$ex>
      SELECT ?a ?c WHERE { ?a :dense ?b . ?b :sparse ?c }"""
    // the optimized plan's left (first-joined) subtree is the sparse scan
    val plan = skewed.explain(q, mode = "extended")
    val opt = plan.substring(plan.indexOf("== Optimized Logical Plan =="))
    assert(opt.indexOf("sparse") >= 0 && opt.indexOf("dense") >= 0)
    assert(opt.indexOf("sparse") < opt.indexOf("dense"),
      s"expected the sparse relation first:\n$opt")
    val rows = skewed.select(q).collect()
    assert(rows.length === 60)
  }

  test("GraphStore sidecar round-trips the stats") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-joinorder").toString + "/store"
    GraphStore.save(skewed.graph, dir)
    val loaded = GraphStore.load(spark, dir)
    assert(loaded.predCounts === Map(
      ex + "dense" -> 60L, ex + "sparse" -> 3L))
    // stats survive into ordering on the reloaded store
    val c = new Compiler(loaded, spark)
    assert(c.patternOrder(Seq(tp("a", "dense", "b"), tp("b", "sparse", "c")))
      .head === tp("b", "sparse", "c"))
  }

  test("sequence path joins grow from the smallest predicate link") {
    val sb = new StringBuilder(s"@prefix : <$ex> .\n")
    for (i <- 0 until 40) sb.append(s":s$i :hopA :m$i .\n")
    for (i <- 0 until 40) sb.append(s":m$i :hopB :t$i .\n")
    for (i <- 0 until 3) sb.append(s":t$i :hopC :u$i .\n")
    val e = Engine.inline(sb.toString)
    assert(e.graph.predCounts(ex + "hopC") === 3L)
    val q = s"PREFIX : <$ex> SELECT ?x ?y WHERE { ?x :hopA/:hopB/:hopC ?y }"
    // author order is left-deep (hopA⋈hopB first); stats must merge the
    // (hopB, hopC) pair first, making hopA the OUTER input of the top
    // join — i.e. the hopA scan prints before the second Join node
    val plan = e.explain(q, mode = "extended")
    val opt = plan.substring(plan.indexOf("== Optimized Logical Plan =="),
      plan.indexOf("== Physical Plan =="))
    val firstJoin = opt.indexOf("Join ")
    val secondJoin = opt.indexOf("Join ", firstJoin + 1)
    assert(firstJoin >= 0 && secondJoin > firstJoin, s"two joins:\n$opt")
    val hopA = opt.indexOf("hopA")
    assert(hopA >= 0 && hopA < secondJoin,
      s"expected right-deep tree (hopA outer, hopB⋈hopC inner):\n$opt")
    // results are order-independent: only the 3 chains through hopC
    val rows = e.select(q).collect()
    assert(rows.length === 3)
  }

  test("path build-side steering: small link broadcast, big-big join " +
      "shuffle_hash (never a broadcast-built fact side)") {
    // stats are optimizer hints, so a tiny graph with INJECTED
    // fact-scale counts pins the policy: hopC (150k est) joins as a
    // broadcast build; the (hopA 6M, merged 1.5M) join must become a
    // shuffled hash join — at sf1 Catalyst's byte estimate of the
    // narrow hopA projection slipped under the broadcast threshold and
    // built a 6M-row hash relation on the driver (r12's 3.93× outlier)
    val sb = new StringBuilder(s"@prefix : <$ex> .\n")
    for (i <- 0 until 10) sb.append(s":s$i :hopA :m$i .\n")
    for (i <- 0 until 10) sb.append(s":m$i :hopB :t$i .\n")
    for (i <- 0 until 3) sb.append(s":t$i :hopC :u$i .\n")
    val e = Engine.fromGraph(Engine.inline(sb.toString).graph.copy(
      predCounts = Map(ex + "hopA" -> 6000000L, ex + "hopB" -> 1500000L,
        ex + "hopC" -> 150000L)))
    val q = s"PREFIX : <$ex> SELECT ?x ?y WHERE { ?x :hopA/:hopB/:hopC ?y }"
    val plan = e.explain(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"hopC (est 150k) should be a broadcast build:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"the big-big join should be a shuffled hash join:\n$plan")
    assert(e.select(q).collect().length === 3)
  }

  test("BGP build-side steering mirrors the path policy") {
    val sb = new StringBuilder(s"@prefix : <$ex> .\n")
    for (i <- 0 until 10) sb.append(s":s$i :hopA :m$i .\n")
    for (i <- 0 until 10) sb.append(s":m$i :hopB :t$i .\n")
    for (i <- 0 until 3) sb.append(s":t$i :hopC :u$i .\n")
    val e = Engine.fromGraph(Engine.inline(sb.toString).graph.copy(
      predCounts = Map(ex + "hopA" -> 6000000L, ex + "hopB" -> 1500000L,
        ex + "hopC" -> 150000L)))
    // two known-big sides → shuffled hash join, never a broadcast-built
    // fact side; a known-small side → explicit broadcast
    val big = e.explain(
      s"PREFIX : <$ex> SELECT ?x ?y { ?x :hopA ?m . ?m :hopB ?y }")
    assert(big.contains("ShuffledHashJoin"), big)
    val small = e.explain(
      s"PREFIX : <$ex> SELECT ?m ?z { ?m :hopB ?y . ?y :hopC ?z }")
    assert(small.contains("BroadcastHashJoin"), small)
    // bound-subject patterns keep an UNKNOWN estimate — steering stays
    // hands-off (no forced shuffle_hash; Catalyst's own choice stands,
    // which for a stats-less RDD-backed store is a sort-merge join)
    val bound = e.explain(
      s"PREFIX : <$ex> SELECT ?m ?y { :s1 :hopA ?m . ?m :hopB ?y }")
    assert(!bound.contains("ShuffledHashJoin"), bound)
    assert(e.select(
      s"PREFIX : <$ex> SELECT ?x ?z { ?x :hopA/:hopB ?m . ?m :hopC ?z }")
      .count() === 3)
  }

  test("stats are dropped on UPDATE (they describe the pre-update state)") {
    val e = Engine.inline(s"@prefix : <$ex> .\n:x :p :y .")
    assert(e.graph.predCounts.nonEmpty)
    e.update(s"PREFIX : <$ex> INSERT DATA { :x :q :z }")
    assert(e.graph.predCounts.isEmpty)
  }
}
