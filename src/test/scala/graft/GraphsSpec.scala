package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.Graphs

/** PageRank over link graphs: exactness (scaled-integer arithmetic vs a
  * local reference implementation), hand-computed tiny graphs, dangling
  * nodes, determinism across partitionings, and the per-iteration plan
  * shape. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Local reference: same integer update rule, computed sequentially. */
  private def local(edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Long = 85L): Map[Long, Long] = {
    val e = edges.filter { case (s, d) => s != d }.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (100L - dampingPct) * Scale / (100L * n)
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 0 until iters) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => dampingPct * r(s) / (100L * deg(s)) }.sum
      }
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("pageRank equals the local integer reference on a random digraph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val got = Graphs.pageRank(edges.toDF("src", "dst"), iters = 5)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(got == local(edges, 5))
  }

  test("pageRank on a 3-cycle is uniform; a sink accumulates rank") {
    // cycle: every node keeps scale/3 (contribution chain is symmetric)
    val cyc = Graphs.pageRank(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
      iters = 5).select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(cyc.values.toSet.size == 1)
    // star into a sink: the sink outranks the leaves; leaves (no
    // inbound) hold exactly the base term
    val star = Graphs.pageRank(
      Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst"), iters = 5)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(star(9L) > star(1L))
    assert(star(1L) == star(2L) && star(2L) == star(3L))
    val base = 15L * Scale / (100L * 4L)
    assert(star(1L) == base) // dangling-sink graph: leaves get base only
  }

  test("pageRank is bit-identical across partitionings") {
    val edges = (1 to 200).map(i => ((i % 23).toLong, ((i * 7 + 3) % 29).toLong))
    def run(parts: Int) =
      Graphs.pageRank(edges.toDF("src", "dst").repartition(parts), iters = 4)
        .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  test("pageRank drops self-loops and requires deduplicated edges") {
    val withLoops = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(withLoops, iters = 3)
      .select("node", "rank_scaled").as[(Long, Long)].collect().toMap
    assert(got == local(Seq((1L, 2L), (2L, 1L)), 3))
  }

  test("rank column is the exact scaled quotient") {
    val out = Graphs.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      iters = 2).select("rank_scaled", "rank").as[(Long, Double)].collect()
    out.foreach { case (s, r) => assert(r == s.toDouble / Scale.toDouble) }
  }

  test("per-iteration plan: rank table broadcastable, no cartesian join") {
    val edges = (1 to 500).map(i => ((i % 29).toLong, ((i * 7 + 3) % 31).toLong))
    val plan = Graphs.pageRank(edges.toDF("src", "dst"), iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // localCheckpoint per round keeps the final plan one round deep:
    // scan of the checkpointed previous ranks, not 2 rounds of joins
    assert("Scan ExistingRDD".r.findAllIn(plan).nonEmpty, plan)
  }

  test("hits equals a local integer reference; deterministic") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 3L), (3L, 2L), (2L, 2L))
      .toDF("src", "dst") // self-loop (2,2) must drop
    val scale = 1L << 20

    // local reference with identical integer arithmetic
    val e = Seq((1L, 2L), (1L, 3L), (4L, 3L), (3L, 2L))
    val vs = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var h = vs.map(_ -> scale).toMap
    var a = vs.map(_ -> scale).toMap
    for (_ <- 0 until 3) {
      val ar = vs.map(v => v -> e.filter(_._2 == v).map(x => h(x._1)).sum).toMap
      val am = math.max(1L, ar.values.max)
      a = ar.map { case (v, s) => v -> s * scale / am }
      val hr = vs.map(v => v -> e.filter(_._1 == v).map(x => a(x._2)).sum).toMap
      val hm = math.max(1L, hr.values.max)
      h = hr.map { case (v, s) => v -> s * scale / hm }
    }

    val got = Graphs.hits(edges, iters = 3)
      .select("node", "hub_scaled", "auth_scaled")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === vs)
    for ((v, hs, as_) <- got) {
      assert(hs === h(v), s"hub($v)")
      assert(as_ === a(v), s"auth($v)")
    }
    // node 2 is the authority (most linked), node 1 the hub (links both)
    val byNode = got.map(r => r._1 -> r).toMap
    assert(byNode(2L)._3 === scale && byNode(1L)._2 === scale)
    // bit-identical across partitionings
    val again = Graphs.hits(edges.repartition(5), iters = 3)
      .select("node", "hub_scaled", "auth_scaled")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }
}
