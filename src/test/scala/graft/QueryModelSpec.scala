package graft

import graft.rdf.XSD
import scala.util.Random

/** Model-based check of the SPARQL query algebra: random pattern trees
  * (BGP / join / OPTIONAL / UNION / MINUS / FILTER / DISTINCT over a
  * fixed 14-triple dataset) are rendered to SPARQL text for the engine
  * AND evaluated by an independent ~80-line reference implementation
  * of the SPARQL 1.1 §18.5 algebra (compatible-mapping join, LeftJoin,
  * Minus's disjoint-domain rule, filter error-as-false semantics, bag
  * counts). Result MULTISETS must match for every query — the
  * query-side sibling of UpdateModelSpec, catching the operator-
  * interaction bugs example-based manifests can't enumerate. */
class QueryModelSpec extends SparkSpec {

  // ---------------------------------------------------------- terms

  private sealed trait Term { def key: String }
  private case class I(v: String) extends Term { def key = s"<$v>" }
  private case class S(v: String) extends Term { def key = s""""$v"""" }
  private case class N(v: Long) extends Term { def key = s"#$v" }

  private val EX = "http://example.com/"
  private def e(l: String) = I(EX + l)

  /** Fixed dataset: a 3-cycle of p-edges plus a spur, q string labels
    * with a duplicate value, r integer ranks with a duplicate value —
    * enough shape for joins, optional misses, and filter ties. */
  private val db: Seq[(Term, Term, Term)] = Seq(
    (e("a1"), e("p"), e("a2")), (e("a2"), e("p"), e("a3")),
    (e("a3"), e("p"), e("a1")), (e("b1"), e("p"), e("a1")),
    (e("a1"), e("p"), e("a3")),
    (e("a1"), e("q"), S("x")), (e("a2"), e("q"), S("y")),
    (e("a3"), e("q"), S("x")),
    (e("a1"), e("r"), N(1)), (e("a2"), e("r"), N(2)),
    (e("a3"), e("r"), N(3)), (e("b1"), e("r"), N(2)),
    (e("b1"), e("q"), S("z")), (e("a2"), e("p"), e("b1")))

  private def turtle: String = {
    val sb = new StringBuilder
    db.foreach { case (s, p, o) =>
      val os = o match {
        case I(v) => s"<$v>"
        case S(v) => s""""$v""""
        case N(v) => v.toString
      }
      sb.append(s"<${s.asInstanceOf[I].v}> <${p.asInstanceOf[I].v}> $os .\n")
    }
    sb.toString
  }

  // ------------------------------------------------------ query AST

  private sealed trait Node
  private case class V(name: String) extends Node
  private case class C(t: Term) extends Node
  private case class TP(s: Node, p: Node, o: Node)

  private sealed trait Cond
  private case class Less(a: Node, b: Node) extends Cond
  private case class TermEq(a: V, b: Node) extends Cond
  private case class IsBound(v: V, positive: Boolean) extends Cond

  private sealed trait Pat
  private case class Bgp(tps: Seq[TP]) extends Pat
  private case class Join(l: Pat, r: Pat) extends Pat
  private case class Opt(l: Pat, r: Pat) extends Pat
  private case class Union(l: Pat, r: Pat) extends Pat
  private case class Minus(l: Pat, r: Pat) extends Pat
  private case class Filter(p: Pat, c: Cond) extends Pat
  /** VALUES as an inline data leaf; None = UNDEF. */
  private case class Values(vs: Seq[String], rows: Seq[Seq[Option[Term]]])
      extends Pat
  /** BIND(?a + k AS ?v) at group end; error → v stays unbound. */
  private case class Bind(p: Pat, v: String, a: Node, k: Long) extends Pat

  private def varsOf(p: Pat): Set[String] = p match {
    case Bgp(tps) => tps.flatMap(tp => Seq(tp.s, tp.p, tp.o)).collect {
      case V(x) => x }.toSet
    case Join(l, r) => varsOf(l) ++ varsOf(r)
    case Opt(l, r) => varsOf(l) ++ varsOf(r)
    case Union(l, r) => varsOf(l) ++ varsOf(r)
    case Minus(l, _) => varsOf(l) // right side never binds outward
    case Filter(q, _) => varsOf(q)
    case Values(vs, _) => vs.toSet
    case Bind(q, v, _, _) => varsOf(q) + v
  }

  // ------------------------------------------------- reference eval

  private type Mu = Map[String, Term]

  private def matchTp(tp: TP, mu: Mu): Seq[Mu] = {
    def bind(n: Node, t: Term, m: Mu): Option[Mu] = n match {
      case C(c) => if (c == t) Some(m) else None
      case V(x) => m.get(x) match {
        case Some(b) => if (b == t) Some(m) else None
        case None => Some(m + (x -> t))
      }
    }
    db.flatMap { case (s, p, o) =>
      for {
        m1 <- bind(tp.s, s, mu)
        m2 <- bind(tp.p, p, m1)
        m3 <- bind(tp.o, o, m2)
      } yield m3
    }
  }

  private def compatible(a: Mu, b: Mu): Boolean =
    a.keySet.intersect(b.keySet).forall(k => a(k) == b(k))

  /** SPARQL 1.1 §17 expression evaluation: Some(bool) or None = error. */
  private def evalCond(c: Cond, mu: Mu): Option[Boolean] = {
    def term(n: Node): Option[Term] = n match {
      case C(t) => Some(t)
      case V(x) => mu.get(x) // None = unbound = error in an expression
    }
    c match {
      case IsBound(v, pos) => Some(mu.contains(v.name) == pos)
      case Less(a, b) => (term(a), term(b)) match {
        case (Some(N(x)), Some(N(y))) => Some(x < y)
        case (Some(S(x)), Some(S(y))) => Some(x < y) // fn:compare
        case _ => None // unbound, IRI, or mixed-type '<' is a type error
      }
      case TermEq(a, b) => (term(a), term(b)) match {
        case (Some(x), Some(y)) if x == y => Some(true)
        case (Some(N(_)), Some(N(_))) => Some(false) // value-distinct
        case (Some(S(_)), Some(S(_))) => Some(false)
        case (Some(N(_)), Some(S(_))) => None // RDFterm-equal type error
        case (Some(S(_)), Some(N(_))) => None
        case (Some(_), Some(_)) => Some(false) // IRI vs anything unequal
        case _ => None
      }
    }
  }

  private def eval(p: Pat): Seq[Mu] = p match {
    case Bgp(tps) =>
      tps.foldLeft(Seq(Map.empty: Mu))((mus, tp) => mus.flatMap(matchTp(tp, _)))
    case Join(l, r) =>
      val (ls, rs) = (eval(l), eval(r))
      for (a <- ls; b <- rs if compatible(a, b)) yield a ++ b
    case Opt(l, r) =>
      val (ls, rs) = (eval(l), eval(r))
      ls.flatMap { a =>
        val ext = rs.filter(compatible(a, _)).map(a ++ _)
        if (ext.nonEmpty) ext else Seq(a)
      }
    case Union(l, r) => eval(l) ++ eval(r)
    case Minus(l, r) =>
      val rs = eval(r)
      eval(l).filter(a => !rs.exists(b =>
        a.keySet.intersect(b.keySet).nonEmpty && compatible(a, b)))
    case Filter(q, c) =>
      eval(q).filter(mu => evalCond(c, mu).contains(true))
    case Values(vs, rows) =>
      rows.map(r => vs.zip(r).collect { case (v, Some(t)) => v -> t }.toMap)
    case Bind(q, v, a, k) =>
      eval(q).map { mu =>
        val arg = a match {
          case C(t) => Some(t)
          case V(x) => mu.get(x)
        }
        arg match {
          case Some(N(n)) => mu + (v -> N(n + k))
          case _ => mu // type error: the variable stays unbound
        }
      }
  }

  // ------------------------------------------------------ rendering

  private def nodeSparql(n: Node): String = n match {
    case V(x) => s"?$x"
    case C(I(v)) => s"<$v>"
    case C(S(v)) => s""""$v""""
    case C(N(v)) => v.toString
  }
  private def condSparql(c: Cond): String = c match {
    case Less(a, b) => s"${nodeSparql(a)} < ${nodeSparql(b)}"
    case TermEq(a, b) => s"${nodeSparql(a)} = ${nodeSparql(b)}"
    case IsBound(v, true) => s"BOUND(${nodeSparql(v)})"
    case IsBound(v, false) => s"!BOUND(${nodeSparql(v)})"
  }
  private def patSparql(p: Pat): String = p match {
    case Bgp(tps) => tps.map(tp =>
      s"${nodeSparql(tp.s)} ${nodeSparql(tp.p)} ${nodeSparql(tp.o)} .")
      .mkString(" ")
    case Join(l, r) => s"{ ${patSparql(l)} } { ${patSparql(r)} }"
    case Opt(l, r) => s"{ ${patSparql(l)} } OPTIONAL { ${patSparql(r)} }"
    case Union(l, r) => s"{ ${patSparql(l)} } UNION { ${patSparql(r)} }"
    case Minus(l, r) => s"{ ${patSparql(l)} } MINUS { ${patSparql(r)} }"
    case Filter(q, c) => s"{ ${patSparql(q)} FILTER (${condSparql(c)}) }"
    case Values(vs, rows) =>
      val head = vs.map("?" + _).mkString(" ")
      val body = rows.map(_.map {
        case Some(t) => nodeSparql(C(t))
        case None => "UNDEF"
      }.mkString("( ", " ", " )")).mkString(" ")
      s"VALUES ( $head ) { $body }"
    case Bind(q, v, a, k) =>
      s"{ ${patSparql(q)} BIND (${nodeSparql(a)} + $k AS ?$v) }"
  }

  // ------------------------------------------------------ generator

  private val vars = Seq("v0", "v1", "v2", "v3")
  private val preds = Seq("p", "q", "r")
  private val consts: Seq[Term] =
    Seq(e("a1"), e("a2"), e("b1"), S("x"), S("z"), N(2), N(3))

  private def genNode(rnd: Random, allowConst: Boolean): Node =
    if (allowConst && rnd.nextInt(6) == 0) C(consts(rnd.nextInt(consts.length)))
    else V(vars(rnd.nextInt(vars.length)))

  private def genTp(rnd: Random): TP = TP(
    genNode(rnd, allowConst = true),
    if (rnd.nextInt(8) == 0) V(vars(rnd.nextInt(vars.length)))
    else C(e(preds(rnd.nextInt(preds.length)))),
    genNode(rnd, allowConst = true))

  private def genCond(rnd: Random): Cond = rnd.nextInt(4) match {
    case 0 => Less(V(vars(rnd.nextInt(vars.length))),
      genNode(rnd, allowConst = true))
    case 1 => TermEq(V(vars(rnd.nextInt(vars.length))),
      genNode(rnd, allowConst = true))
    case 2 => IsBound(V(vars(rnd.nextInt(vars.length))), positive = true)
    case 3 => IsBound(V(vars(rnd.nextInt(vars.length))), positive = false)
  }

  private def genValues(rnd: Random): Values = {
    val vs = rnd.shuffle(vars).take(1 + rnd.nextInt(2))
    val rows = Seq.fill(2 + rnd.nextInt(2))(vs.map(_ =>
      if (rnd.nextInt(5) == 0) None
      else Some(consts(rnd.nextInt(consts.length)))))
    Values(vs, rows)
  }

  private def genLeaf(rnd: Random): Pat =
    if (rnd.nextInt(5) == 0) genValues(rnd)
    else Bgp(Seq.fill(1 + rnd.nextInt(2))(genTp(rnd)))

  private def genPat(rnd: Random, depth: Int): Pat =
    if (depth == 0) genLeaf(rnd)
    else rnd.nextInt(7) match {
      case 0 => genLeaf(rnd)
      case 1 => Join(genPat(rnd, depth - 1), genPat(rnd, depth - 1))
      case 2 => Opt(genPat(rnd, depth - 1), genPat(rnd, depth - 1))
      case 3 => Union(genPat(rnd, depth - 1), genPat(rnd, depth - 1))
      case 4 => Minus(genPat(rnd, depth - 1), genPat(rnd, depth - 1))
      case 5 => Filter(genPat(rnd, depth - 1), genCond(rnd))
      case 6 =>
        val p = genPat(rnd, depth - 1)
        val free = vars.filterNot(varsOf(p))
        if (free.isEmpty) p
        else Bind(p, free(rnd.nextInt(free.length)),
          genNode(rnd, allowConst = false), 1 + rnd.nextInt(3))
    }

  // ------------------------------------------------------ the check

  private def projectModel(mus: Seq[Mu], distinct: Boolean): Seq[Seq[String]] = {
    val rows = mus.map(mu => vars.map(v => mu.get(v).map(_.key).getOrElse("∅")))
    if (distinct) rows.distinct else rows
  }

  private def engineRows(eng: Engine, sparql: String): Seq[Seq[String]] =
    eng.selectRaw(sparql).collect().toSeq.map { r =>
      vars.map { v =>
        val i = r.fieldIndex(v)
        if (r.isNullAt(i)) "∅"
        else {
          val t = r.getStruct(i)
          (t.getByte(0).toInt, t.getString(1), t.getString(2)) match {
            case (0, value, _) => s"<$value>"
            case (2, value, XSD.integer) => s"#${value.toLong}"
            case (2, value, _) => s""""$value""""
            case (k, value, _) => s"?$k:$value"
          }
        }
      }
    }

  for (seed <- Seq(7, 19, 31)) {
    test(s"random algebra trees match the reference evaluation (seed $seed)") {
      val rnd = new Random(seed)
      val eng = Engine.inline(turtle)
      var nonEmpty = 0
      for (qn <- 1 to 50) {
        val pat = genPat(rnd, 1 + rnd.nextInt(2))
        val distinct = rnd.nextInt(5) == 0
        val sel = if (distinct) "SELECT DISTINCT" else "SELECT"
        val sparql =
          s"$sel ${vars.map("?" + _).mkString(" ")} WHERE { ${patSparql(pat)} }"
        val want = projectModel(eval(pat), distinct)
          .map(_.mkString("|")).sorted
        val got = engineRows(eng, sparql).map(_.mkString("|")).sorted
        assert(got == want,
          s"query $qn diverged:\n$sparql\nengine=${got.take(8)}… " +
            s"(${got.size} rows)\nmodel =${want.take(8)}… (${want.size} rows)")
        if (want.nonEmpty) nonEmpty += 1
      }
      assert(nonEmpty > 10, s"only $nonEmpty non-empty results — generator bug?")
    }
  }
}
