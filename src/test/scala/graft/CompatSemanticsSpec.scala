package graft

import org.apache.spark.sql.Row
import graft.rdf._
import graft.sparql.Ast._
import graft.sparql.Compiler
import scala.util.Random

/** Differential semantics test: a ~60-line reference evaluator
  * implementing SPARQL's solution-mapping algebra directly (compatible
  * join, LeftJoin, Union null-fill, MINUS domain rule — spec §18.5) is
  * run against the compiled DataFrame plans on randomized small graphs
  * and patterns. Multiset (bag) comparison — duplicates matter. */
class CompatSemanticsSpec extends SparkSpec {

  type Sol = Map[String, RdfTerm]

  // ---- reference evaluator (executable spec §18.5) ----

  private def compatible(a: Sol, b: Sol): Boolean =
    (a.keySet & b.keySet).forall(v => a(v) == b(v))

  private def merge(a: Sol, b: Sol): Sol = b ++ a

  private def matchNode(n: Node, t: RdfTerm, sol: Sol): Option[Sol] = n match {
    case TermNode(c) => if (c == t) Some(sol) else None
    case VarNode(v) => sol.get(v) match {
      case Some(bound) => if (bound == t) Some(sol) else None
      case None => Some(sol + (v -> t))
    }
  }

  private def evalRef(p: GraphPattern,
      g: Seq[(RdfTerm, RdfTerm, RdfTerm)]): Seq[Sol] = p match {
    case Bgp(ts) =>
      ts.foldLeft(Seq(Map.empty: Sol)) { (sols, tp) =>
        val pn = tp.p match { case VerbNode(n) => n case _ => sys.error("no paths") }
        for {
          sol <- sols
          (s, pr, o) <- g
          s1 <- matchNode(tp.s, s, sol).toSeq
          s2 <- matchNode(pn, pr, s1).toSeq
          s3 <- matchNode(tp.o, o, s2).toSeq
        } yield s3
      }
    case Join(l, r) =>
      for (a <- evalRef(l, g); b <- evalRef(r, g) if compatible(a, b))
        yield merge(a, b)
    case Union(l, r) => evalRef(l, g) ++ evalRef(r, g)
    case LeftJoin(l, r, filters) =>
      val rs = evalRef(r, g)
      evalRef(l, g).flatMap { a =>
        val matched = rs.filter(b => compatible(a, b) &&
          filters.forall(f => evalFilter(f, merge(a, b))))
        if (matched.nonEmpty) matched.map(b => merge(a, b)) else Seq(a)
      }
    case Minus(l, r) =>
      val rs = evalRef(r, g)
      evalRef(l, g).filterNot(a => rs.exists(b =>
        compatible(a, b) && (a.keySet & b.keySet).nonEmpty))
    case Filter(q, exprs) =>
      evalRef(q, g).filter(sol => exprs.forall(evalFilter(_, sol)))
    case other => sys.error(s"not in test subset: $other")
  }

  private def evalFilter(e: Expr, sol: Sol): Boolean = e match {
    case ExCmp("=", ExVar(a), ExVar(b)) =>
      (sol.get(a), sol.get(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ => false // error → drop
      }
    case ExCmp("=", ExVar(a), ExTerm(t)) => sol.get(a).contains(t)
    case ExCmp("!=", ExVar(a), ExTerm(t)) =>
      sol.get(a).exists(_ != t)
    case ExCall("BOUND", Seq(ExVar(v))) => sol.contains(v)
    case ExNot(x) => evalFilterDefined(x, sol).contains(false)
    case other => sys.error(s"not in test subset: $other")
  }

  /** 3-valued inner eval for NOT (error ≠ false). */
  private def evalFilterDefined(e: Expr, sol: Sol): Option[Boolean] = e match {
    case ExCmp("=", ExVar(a), ExTerm(t)) =>
      sol.get(a).map(_ == t)
    case ExCall("BOUND", Seq(ExVar(v))) => Some(sol.contains(v))
    case other => Some(evalFilter(other, sol))
  }

  // ---- random instances ----

  private val terms: Vector[RdfTerm] =
    Vector(Iri("urn:t:a"), Iri("urn:t:b"), Iri("urn:t:c"), Iri("urn:t:d"))
  private val preds: Vector[RdfTerm] = Vector(Iri("urn:p:p"), Iri("urn:p:q"))
  private val vars = Vector("a", "b", "c")

  private def randNode(rnd: Random): Node =
    if (rnd.nextInt(3) == 0) TermNode(terms(rnd.nextInt(terms.size)))
    else VarNode(vars(rnd.nextInt(vars.size)))

  private def randTriplePattern(rnd: Random): TriplePattern =
    TriplePattern(randNode(rnd),
      VerbNode(TermNode(preds(rnd.nextInt(preds.size)))), randNode(rnd))

  private def randBgp(rnd: Random): GraphPattern =
    Bgp(Seq.fill(1 + rnd.nextInt(2))(randTriplePattern(rnd)))

  private def randPattern(rnd: Random, depth: Int): GraphPattern =
    if (depth <= 0) randBgp(rnd)
    else rnd.nextInt(6) match {
      case 0 => Join(randPattern(rnd, depth - 1), randPattern(rnd, depth - 1))
      case 1 => Union(randPattern(rnd, depth - 1), randPattern(rnd, depth - 1))
      case 2 => LeftJoin(randPattern(rnd, depth - 1),
        randPattern(rnd, depth - 1), Nil)
      case 3 => Minus(randPattern(rnd, depth - 1), randPattern(rnd, depth - 1))
      case 4 => Filter(randPattern(rnd, depth - 1),
        Seq(ExCmp("=", ExVar(vars(rnd.nextInt(3))),
          ExTerm(terms(rnd.nextInt(terms.size))))))
      case _ => randBgp(rnd)
    }

  private def randGraph(rnd: Random): Seq[(RdfTerm, RdfTerm, RdfTerm)] =
    (0 until (3 + rnd.nextInt(5))).map { _ =>
      (terms(rnd.nextInt(terms.size)), preds(rnd.nextInt(preds.size)),
        terms(rnd.nextInt(terms.size)))
    }.distinct

  // ---- comparison ----

  private def rowToSol(r: Row, cols: Seq[String]): Sol =
    cols.zipWithIndex.flatMap { case (c, i) =>
      if (c.startsWith("__") || r.isNullAt(i)) None
      else {
        val st = r.getStruct(i)
        val term: RdfTerm = st.getByte(0) match {
          case Terms.KIND_IRI => Iri(st.getString(1))
          case Terms.KIND_BLANK => Blank(st.getString(1))
          case _ => Lit(st.getString(1), st.getString(2), st.getString(3))
        }
        Some(c -> term)
      }
    }.toMap

  private def canon(sols: Seq[Sol]): Seq[String] =
    sols.map(s => s.toSeq.sortBy(_._1).map { case (v, t) => s"$v=${t.n3()}" }
      .mkString("|")).sorted

  test("compiled plans match the reference evaluator on random patterns") {
    val rnd = new Random(20260812L)
    for (case_ <- 1 to 40) {
      val g = randGraph(rnd)
      val p = randPattern(rnd, 1 + rnd.nextInt(2))
      val expected = canon(evalRef(p, g))
      val graph = RdfGraph.fromTriples(spark, g)
      val df = new Compiler(graph, spark).compile(p)
      val cols = df.columns.toSeq
      val got = canon(df.collect().toSeq.map(rowToSol(_, cols)))
      assert(got == expected,
        s"case $case_ mismatch\npattern: $p\ngraph: $g\n" +
          s"got:      $got\nexpected: $expected")
    }
  }
}
