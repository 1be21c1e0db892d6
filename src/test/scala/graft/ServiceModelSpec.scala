package graft

import scala.util.Random

/** Differential fuzz of the SERVICE federation wire path: for random
  * graph patterns P and random data D, `SELECT * { SERVICE <live(D)>
  * { P } }` must return the same multiset as evaluating `{ P }`
  * directly over D, and `L SERVICE { P }` the same as the plain join
  * `L { P }`. The direct path is already pinned against an independent
  * algebra model (QueryModelSpec), so the engine serves as its own
  * oracle here — what this adds is coverage of the hand-written AST →
  * SPARQL renderer (Render) on ARBITRARY shapes, the bound-join VALUES
  * injection, the live HTTP round-trip, and the executor-side
  * results-JSON decode.
  *
  * The vocabulary is blank-node-free on purpose: a remote blank node is
  * scoped to its response and must NOT join with local labels, so only
  * a bnode-free vocabulary keeps the two paths semantically identical
  * (the curated w3c/service bnode case pins the scoping rule itself).
  * Deepen with GRAFT_MODEL_SEEDS_EXTRA (comma-separated extra seeds).
  */
class ServiceModelSpec extends SparkSpec with W3cHarness {

  private val iris = Seq("a", "b", "c", "d").map(x => s"http://ex/$x")
  private val preds = Seq("p", "q", "r").map(x => s"http://ex/$x")
  private val lits = Seq("\"s1\"", "\"s2\"", "4", "7")
  private val vs = Seq("?v0", "?v1", "?v2")

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
  private def iriOf(rnd: Random, xs: Seq[String]) = s"<${pick(rnd, xs)}>"
  private def term(rnd: Random): String =
    if (rnd.nextBoolean()) iriOf(rnd, iris) else pick(rnd, lits)
  private def node(rnd: Random): String =
    if (rnd.nextInt(3) == 0) term(rnd) else pick(rnd, vs)

  private def genData(rnd: Random): String = {
    val n = 6 + rnd.nextInt(8)
    (0 until n).map(_ =>
      s"${iriOf(rnd, iris)} ${iriOf(rnd, preds)} ${term(rnd)} .")
      .mkString("\n")
  }

  private def tp(rnd: Random): String =
    s"${node(rnd)} ${iriOf(rnd, preds)} ${node(rnd)} ."

  private def pathTp(rnd: Random): String = {
    val path = rnd.nextInt(3) match {
      case 0 => s"<${preds(0)}>/<${preds(1)}>"
      case 1 => s"<${preds(0)}>|<${preds(2)}>"
      case _ => s"<${preds(1)}>+"
    }
    s"${node(rnd)} $path ${node(rnd)} ."
  }

  private def pat(rnd: Random, depth: Int): String =
    if (depth <= 0) tp(rnd)
    else rnd.nextInt(10) match {
      case 0 => s"{ ${pat(rnd, depth - 1)} } OPTIONAL { ${pat(rnd, depth - 1)} }"
      case 1 => s"{ ${pat(rnd, depth - 1)} } UNION { ${pat(rnd, depth - 1)} }"
      case 2 => s"${pat(rnd, depth - 1)} FILTER(BOUND(${pick(rnd, vs)}))"
      case 3 =>
        s"VALUES ${pick(rnd, vs)} { ${term(rnd)} ${term(rnd)} } ${pat(rnd, depth - 1)}"
      case 4 => pathTp(rnd)
      case 5 => s"{ SELECT DISTINCT ?v0 ?v1 WHERE { ${pat(rnd, depth - 1)} } }"
      case 6 => s"{ ${pat(rnd, depth - 1)} } MINUS { ${pat(rnd, depth - 1)} }"
      case 7 =>
        // fresh target var per depth level: always §18.2.1-legal
        s"${pat(rnd, depth - 1)} BIND(${1 + rnd.nextInt(9)} AS ?b$depth)"
      case _ => s"${tp(rnd)} ${pat(rnd, depth - 1)}"
    }

  private def assertSame(label: String, e: Engine,
      direct: String, federated: String): Unit = {
    val (wantVars, wantRows) = runSelect(e, direct)
    val (gotVars, gotRows) = runSelect(e, federated)
    assert(gotVars == wantVars, s"$label vars: $direct")
    assert(isomorphic(wantRows.map(normSol), gotRows.map(normSol),
        ordered = false),
      s"$label:\n$direct\nvs\n$federated\n" +
        s"direct${render(wantRows)}\nfederated${render(gotRows)}")
  }

  private val extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))

  for (seed <- Seq(11, 23, 37, 53 ) ++ extraSeeds) {
    test(s"SERVICE wire path matches direct evaluation (seed $seed)") {
      val rnd = new Random(seed)
      val data = genData(rnd)
      val engine = Engine.inline(data)
      val (server, url) = startEndpoint(data)
      try {
        for (round <- 0 until 6) {
          val p = pat(rnd, 2)
          assertSame(s"seed $seed round $round bare", engine,
            s"SELECT * WHERE { { $p } }",
            s"SELECT * WHERE { SERVICE <$url> { $p } }")
          val local = tp(rnd)
          assertSame(s"seed $seed round $round joined", engine,
            s"SELECT * WHERE { $local { $p } }",
            s"SELECT * WHERE { $local SERVICE <$url> { $p } }")
        }
      } finally server.stop(0)
    }
  }
}
