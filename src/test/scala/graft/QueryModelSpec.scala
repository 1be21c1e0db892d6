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
  /** FILTER [NOT] EXISTS { P } — §18.6 substitution semantics: the
    * current row's bindings substitute into P, which then evaluates
    * under the CURRENT active graph. */
  private case class CondExists(p: Pat, positive: Boolean) extends Cond

  private sealed trait Pat
  private case class Bgp(tps: Seq[TP]) extends Pat
  private case class Join(l: Pat, r: Pat) extends Pat
  private case class Opt(l: Pat, r: Pat) extends Pat
  /** `{ L } OPTIONAL { R FILTER(c) }` with the filter at the OPTIONAL
    * group's top level — §18.2.2.5 translates it to LeftJoin(L, R, c):
    * c evaluates over the MERGED mapping (it sees L's bindings), unlike
    * a filter in a nested group. */
  private case class OptF(l: Pat, r: Pat, c: Cond) extends Pat
  private case class Union(l: Pat, r: Pat) extends Pat
  private case class Minus(l: Pat, r: Pat) extends Pat
  private case class Filter(p: Pat, c: Cond) extends Pat
  /** VALUES as an inline data leaf; None = UNDEF. */
  private case class Values(vs: Seq[String], rows: Seq[Seq[Option[Term]]])
      extends Pat
  /** BIND(?a + k AS ?v) at group end; error → v stays unbound. */
  private case class Bind(p: Pat, v: String, a: Node, k: Long) extends Pat
  /** GRAPH ?g { P } / GRAPH <iri> { P } (§13.3): P evaluates against
    * each named graph, the name binds/filters through `g`. */
  private case class GraphPat(g: Node, p: Pat) extends Pat
  /** { SELECT [DISTINCT] ?a ?b WHERE { P } } — projection drops the
    * other vars (bottom-up evaluation, multiplicity preserved unless
    * DISTINCT). */
  private case class SubSel(vs: Seq[String], p: Pat, distinct: Boolean)
      extends Pat

  /** Property-path expressions (§18.4): seq/alt/inv keep bag
    * multiplicities; the closures (?, *, +) are SET-semantics ALP with
    * zero-length pairs ranging over the ACTIVE graph's nodes. */
  private sealed trait PathE
  private case class PLink(p: Term) extends PathE
  private case class PInv(p: PathE) extends PathE
  private case class PSeq(a: PathE, b: PathE) extends PathE
  private case class PAlt(a: PathE, b: PathE) extends PathE
  private case class PNeg(ps: Set[Term]) extends PathE
  private case class PMod(p: PathE, mod: Char) extends PathE // ? * +
  /** One path triple pattern as a leaf. */
  private case class PathPat(s: Node, path: PathE, o: Node) extends Pat

  /** BIND target vars anywhere in the tree: a GRAPH variable must not
    * be one (under scan-binding visibility the target would already be
    * in scope — Jena rejects the shape at parse; the generator simply
    * never emits it). */
  private def bindTargets(p: Pat): Set[String] = p match {
    case Bind(q, v, _, _) => bindTargets(q) + v
    case Join(l, r) => bindTargets(l) ++ bindTargets(r)
    case Opt(l, r) => bindTargets(l) ++ bindTargets(r)
    case OptF(l, r, _) => bindTargets(l) ++ bindTargets(r)
    case Union(l, r) => bindTargets(l) ++ bindTargets(r)
    case Minus(l, r) => bindTargets(l) ++ bindTargets(r)
    case Filter(q, _) => bindTargets(q)
    case GraphPat(_, q) => bindTargets(q)
    case SubSel(_, q, _) => bindTargets(q)
    case _ => Set.empty
  }

  private def varsOf(p: Pat): Set[String] = p match {
    case Bgp(tps) => tps.flatMap(tp => Seq(tp.s, tp.p, tp.o)).collect {
      case V(x) => x }.toSet
    case Join(l, r) => varsOf(l) ++ varsOf(r)
    case Opt(l, r) => varsOf(l) ++ varsOf(r)
    case OptF(l, r, _) => varsOf(l) ++ varsOf(r)
    case Union(l, r) => varsOf(l) ++ varsOf(r)
    case Minus(l, _) => varsOf(l) // right side never binds outward
    case Filter(q, _) => varsOf(q)
    case Values(vs, _) => vs.toSet
    case Bind(q, v, _, _) => varsOf(q) + v
    case GraphPat(g, q) => varsOf(q) ++ (g match {
      case V(x) => Set(x); case _ => Set.empty[String] })
    // §18.2.1: every var in the SELECT clause is in-scope for the
    // enclosing group, even one the subquery never binds
    case SubSel(vs, _, _) => vs.toSet
    case PathPat(s, _, o) => Seq(s, o).collect { case V(x) => x }.toSet
  }

  // ------------------------------------------------- reference eval

  private type Mu = Map[String, Term]
  private type Quad = (Term, Term, Term, Option[Term])

  private def matchTp(tp: TP, mu: Mu,
      triples: Seq[(Term, Term, Term)]): Seq[Mu] = {
    def bind(n: Node, t: Term, m: Mu): Option[Mu] = n match {
      case C(c) => if (c == t) Some(m) else None
      case V(x) => m.get(x) match {
        case Some(b) => if (b == t) Some(m) else None
        case None => Some(m + (x -> t))
      }
    }
    triples.flatMap { case (s, p, o) =>
      for {
        m1 <- bind(tp.s, s, mu)
        m2 <- bind(tp.p, p, m1)
        m3 <- bind(tp.o, o, m2)
      } yield m3
    }
  }

  private def compatible(a: Mu, b: Mu): Boolean =
    a.keySet.intersect(b.keySet).forall(k => a(k) == b(k))

  /** Substitute bound variables by constants (§18.6 EXISTS). */
  private def substitute(p: Pat, mu: Mu): Pat = {
    def sn(n: Node): Node = n match {
      case V(x) if mu.contains(x) => C(mu(x))
      case other => other
    }
    p match {
      case Bgp(tps) => Bgp(tps.map(tp => TP(sn(tp.s), sn(tp.p), sn(tp.o))))
      case other =>
        // generator keeps EXISTS patterns to BGPs; anything else would
        // need the (contested) general substitution rules
        sys.error(s"unexpected EXISTS pattern shape: $other")
    }
  }

  /** §18.5 evaluation over a quad dataset with an active graph (None =
    * default graph). GRAPH re-scopes the active graph per §13.3. */
  private def eval(p: Pat, ag: Option[Term], quads: Seq[Quad]): Seq[Mu] = {
    /** §17 expression evaluation: Some(bool) or None = error. */
    def evalCond(c: Cond, mu: Mu, ag: Option[Term]): Option[Boolean] = {
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
        case CondExists(q, pos) =>
          Some(ev(substitute(q, mu), ag, None).nonEmpty == pos)
      }
    }
    def ev(p: Pat, ag: Option[Term],
        gb: Option[(String, Term)]): Seq[Mu] = p match {
      case Bgp(tps) =>
        val triples = quads.collect { case (s, pr, o, g) if g == ag => (s, pr, o) }
        // scan-binding: inside GRAPH ?x every SCAN leaf binds ?x to the
        // active graph's name (the gb seed) — the Jena/Virtuoso
        // consensus the engine implements; VALUES/BIND leaves don't
        tps.foldLeft(Seq(gb.toMap: Mu))((mus, tp) =>
          mus.flatMap(matchTp(tp, _, triples)))
      case Join(l, r) =>
        val (ls, rs) = (ev(l, ag, gb), ev(r, ag, gb))
        for (a <- ls; b <- rs if compatible(a, b)) yield a ++ b
      case Opt(l, r) =>
        val (ls, rs) = (ev(l, ag, gb), ev(r, ag, gb))
        ls.flatMap { a =>
          val ext = rs.filter(compatible(a, _)).map(a ++ _)
          if (ext.nonEmpty) ext else Seq(a)
        }
      case OptF(l, r, c) =>
        // LeftJoin(L, R, c): extensions must satisfy c over the merge;
        // a row keeps its bare form only when NO extension does
        val (ls, rs) = (ev(l, ag, gb), ev(r, ag, gb))
        ls.flatMap { a =>
          val ext = rs.filter(compatible(a, _)).map(a ++ _)
            .filter(m => evalCond(c, m, ag).contains(true))
          if (ext.nonEmpty) ext else Seq(a)
        }
      case Union(l, r) => ev(l, ag, gb) ++ ev(r, ag, gb)
      case Minus(l, r) =>
        val rs = ev(r, ag, gb)
        ev(l, ag, gb).filter(a => !rs.exists(b =>
          a.keySet.intersect(b.keySet).nonEmpty && compatible(a, b)))
      case Filter(q, c) =>
        ev(q, ag, gb).filter(mu => evalCond(c, mu, ag).contains(true))
      case Values(vs, rows) =>
        rows.map(r => vs.zip(r).collect { case (v, Some(t)) => v -> t }.toMap)
      case Bind(q, v, a, k) =>
        ev(q, ag, gb).map { mu =>
          val arg = a match {
            case C(t) => Some(t)
            case V(x) => mu.get(x)
          }
          arg match {
            case Some(N(n)) => mu + (v -> N(n + k))
            case _ => mu // type error: the variable stays unbound
          }
        }
      case GraphPat(gn, q) =>
        val named = quads.flatMap(_._4).distinct
        named.flatMap { n =>
          val inner = gn match {
            case V(x) => ev(q, Some(n), Some(x -> n))
            case _ => ev(q, Some(n), None)
          }
          gn match {
            case C(t) => if (t == n) inner else Seq.empty
            case V(x) => inner.flatMap(mu => mu.get(x) match {
              case Some(b) => if (b == n) Seq(mu) else Seq.empty
              case None => Seq(mu + (x -> n))
            })
          }
        }
      case SubSel(vs, q, d) =>
        val rows = ev(q, ag, gb).map(_.view.filterKeys(vs.toSet).toMap)
        if (d) rows.distinct else rows
      case PathPat(s, path, o) =>
        val triples = quads.collect { case (x, pr, y, g) if g == ag => (x, pr, y) }
        def bind(n: Node, t: Term, m: Mu): Option[Mu] = n match {
          case C(c) => if (c == t) Some(m) else None
          case V(x) => m.get(x) match {
            case Some(b) => if (b == t) Some(m) else None
            case None => Some(m + (x -> t))
          }
        }
        def ctx(n: Node): Option[Term] = n match {
          case C(t) => Some(t); case _ => None
        }
        evalPath(path, triples, ctx(s), ctx(o)).flatMap { case (a, b) =>
          bind(s, a, gb.toMap).flatMap(bind(o, b, _))
        }
    }
    ev(p, ag, None)
  }

  /** §18.4 path evaluation over one graph's triples: seq/alt/inv are
    * bag-composed from the triple set; ?, *, + are DISTINCT pair sets
    * (ALP). Zero-length pairs are ENDPOINT-SENSITIVE per the REC's
    * eval cases: a syntactically CONSTANT adjacent endpoint yields its
    * own (t,t) pair unconditionally (ALP starts at the term — so
    * `<x> p* <x>` holds even when x is not in the graph), while the
    * both-variable case ranges over nodes(G) (every term in subject or
    * object position, literals included). The endpoint context threads
    * through seq (left keeps the subject, right the object), alt
    * (both), and inverse (swapped). */
  private def evalPath(p: PathE, triples: Seq[(Term, Term, Term)],
      sCtx: Option[Term], oCtx: Option[Term]): Seq[(Term, Term)] = p match {
    case PLink(pr) => triples.collect { case (s, x, o) if x == pr => (s, o) }
    case PInv(q) => evalPath(q, triples, oCtx, sCtx).map(_.swap)
    case PSeq(a, b) =>
      val ea = evalPath(a, triples, sCtx, None)
      val eb = evalPath(b, triples, None, oCtx)
      for ((x, y1) <- ea; (y2, z) <- eb if y1 == y2) yield (x, z)
    case PAlt(a, b) =>
      evalPath(a, triples, sCtx, oCtx) ++ evalPath(b, triples, sCtx, oCtx)
    case PNeg(ps) =>
      triples.collect { case (s, x, o) if !ps.contains(x) => (s, o) }
    case PMod(q, mod) =>
      val edges = evalPath(q, triples, None, None).distinct
      val nodes = triples.flatMap(t => Seq(t._1, t._3)).distinct
      def zeroPairs: Seq[(Term, Term)] = (sCtx, oCtx) match {
        case (Some(a), _) => Seq((a, a)) // endpoint binding filters vs o
        case (None, Some(b)) => Seq((b, b))
        case _ => nodes.map(n => (n, n))
      }
      def reach(from: Term): Seq[Term] = {
        var seen = Set(from)
        var frontier = Seq(from)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(f =>
            edges.collect { case (a, b) if a == f && !seen.contains(b) => b })
            .distinct
          seen ++= next
          frontier = next
        }
        seen.toSeq
      }
      mod match {
        case '?' => (zeroPairs ++ edges).distinct
        case '*' =>
          (zeroPairs ++ nodes.flatMap(n => reach(n).map((n, _)))).distinct
        case '+' => nodes.flatMap(n =>
          edges.collect { case (a, b) if a == n => b }.distinct
            .flatMap(m => reach(m)).distinct.map((n, _))).distinct
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
    case CondExists(p, true) => s"EXISTS { ${patSparql(p)} }"
    case CondExists(p, false) => s"NOT EXISTS { ${patSparql(p)} }"
  }
  private def patSparql(p: Pat): String = p match {
    case Bgp(tps) => tps.map(tp =>
      s"${nodeSparql(tp.s)} ${nodeSparql(tp.p)} ${nodeSparql(tp.o)} .")
      .mkString(" ")
    case Join(l, r) => s"{ ${patSparql(l)} } { ${patSparql(r)} }"
    case Opt(l, r) => s"{ ${patSparql(l)} } OPTIONAL { ${patSparql(r)} }"
    case OptF(l, r, c) =>
      s"{ ${patSparql(l)} } OPTIONAL { ${patSparql(r)} FILTER (${condSparql(c)}) }"
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
    case GraphPat(g, q) => s"GRAPH ${nodeSparql(g)} { ${patSparql(q)} }"
    case SubSel(vs, q, d) =>
      val dk = if (d) "DISTINCT " else ""
      s"{ SELECT $dk${vs.map("?" + _).mkString(" ")} WHERE { ${patSparql(q)} } }"
    case PathPat(s, path, o) =>
      s"${nodeSparql(s)} ${pathSparql(path)} ${nodeSparql(o)} ."
  }

  private def pathSparql(p: PathE): String = p match {
    case PLink(I(v)) => s"<$v>"
    case PLink(t) => sys.error(s"non-IRI path link: $t")
    case PInv(q) => s"^(${pathSparql(q)})"
    case PSeq(a, b) => s"(${pathSparql(a)}/${pathSparql(b)})"
    case PAlt(a, b) => s"(${pathSparql(a)}|${pathSparql(b)})"
    case PNeg(ps) => ps.toSeq.collect { case I(v) => s"<$v>" }
      .sorted.mkString("!(", "|", ")")
    case PMod(q, m) => s"(${pathSparql(q)})$m"
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

  private def genCond(rnd: Random): Cond = rnd.nextInt(6) match {
    case 0 => Less(V(vars(rnd.nextInt(vars.length))),
      genNode(rnd, allowConst = true))
    case 1 => TermEq(V(vars(rnd.nextInt(vars.length))),
      genNode(rnd, allowConst = true))
    case 2 => IsBound(V(vars(rnd.nextInt(vars.length))), positive = true)
    case 3 => IsBound(V(vars(rnd.nextInt(vars.length))), positive = false)
    case k =>
      CondExists(Bgp(Seq.fill(1 + rnd.nextInt(2))(genTp(rnd))), k == 4)
  }

  private def genValues(rnd: Random): Values = {
    val vs = rnd.shuffle(vars).take(1 + rnd.nextInt(2))
    val rows = Seq.fill(2 + rnd.nextInt(2))(vs.map(_ =>
      if (rnd.nextInt(5) == 0) None
      else Some(consts(rnd.nextInt(consts.length)))))
    Values(vs, rows)
  }

  private def genSimplePath(rnd: Random): PathE = rnd.nextInt(4) match {
    case 0 | 1 => PLink(e(preds(rnd.nextInt(preds.length))))
    case 2 => PInv(PLink(e(preds(rnd.nextInt(preds.length)))))
    case 3 => PAlt(PLink(e(preds(rnd.nextInt(preds.length)))),
      PLink(e(preds(rnd.nextInt(preds.length)))))
  }

  private def genPath(rnd: Random, depth: Int): PathE =
    if (depth == 0) rnd.nextInt(6) match {
      case 0 | 1 | 2 => PLink(e(preds(rnd.nextInt(preds.length))))
      case 3 => PInv(PLink(e(preds(rnd.nextInt(preds.length)))))
      case 4 => PNeg(Set.fill(1 + rnd.nextInt(2))(
        e(preds(rnd.nextInt(preds.length)))))
      case 5 => PMod(genSimplePath(rnd), "?*+".charAt(rnd.nextInt(3)))
    } else rnd.nextInt(4) match {
      case 0 => PSeq(genPath(rnd, depth - 1), genPath(rnd, depth - 1))
      case 1 => PAlt(genPath(rnd, depth - 1), genPath(rnd, depth - 1))
      case 2 => PMod(genSimplePath(rnd), "?*+".charAt(rnd.nextInt(3)))
      case 3 => genPath(rnd, 0)
    }

  private def genLeaf(rnd: Random): Pat = rnd.nextInt(10) match {
    case 0 | 1 => genValues(rnd)
    case 2 | 3 => PathPat(genNode(rnd, allowConst = true),
      genPath(rnd, 1 + rnd.nextInt(1)), genNode(rnd, allowConst = true))
    case _ => Bgp(Seq.fill(1 + rnd.nextInt(2))(genTp(rnd)))
  }

  private def genPat(rnd: Random, depth: Int, graphs: Boolean = false): Pat =
    if (depth == 0) genLeaf(rnd)
    else rnd.nextInt(if (graphs) 9 else 8) match {
      case 0 => genLeaf(rnd)
      case 1 => Join(genPat(rnd, depth - 1, graphs), genPat(rnd, depth - 1, graphs))
      case 2 => Opt(genPat(rnd, depth - 1, graphs), genPat(rnd, depth - 1, graphs))
      case 3 => Union(genPat(rnd, depth - 1, graphs), genPat(rnd, depth - 1, graphs))
      case 4 => Minus(genPat(rnd, depth - 1, graphs), genPat(rnd, depth - 1, graphs))
      case 5 => Filter(genPat(rnd, depth - 1, graphs), genCond(rnd))
      case 6 =>
        val p = genPat(rnd, depth - 1, graphs)
        val free = vars.filterNot(varsOf(p))
        if (free.isEmpty) p
        else Bind(p, free(rnd.nextInt(free.length)),
          genNode(rnd, allowConst = false), 1 + rnd.nextInt(3))
      case 7 =>
        if (rnd.nextBoolean())
          SubSel(rnd.shuffle(vars).take(1 + rnd.nextInt(2)),
            genPat(rnd, depth - 1, graphs), rnd.nextInt(4) == 0)
        else OptF(genPat(rnd, depth - 1, graphs),
          genPat(rnd, depth - 1, graphs), genCond(rnd))
      case 8 =>
        // GRAPH name: a shared var 2/3 (joins against node positions),
        // a constant 1/3 — incl. g3, which is NOT in the dataset. A
        // var that is a BIND target inside is never legal as the name.
        val p = genPat(rnd, depth - 1, graphs)
        val okVars = vars.filterNot(bindTargets(p))
        val gn = if (rnd.nextInt(3) == 0 || okVars.isEmpty)
          C(e("g" + (1 + rnd.nextInt(3))))
        else V(okVars(rnd.nextInt(okVars.length)))
        GraphPat(gn, p)
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

  private def runRandomQueries(seed: Int, eng: Engine, quads: Seq[Quad],
      graphs: Boolean): Unit = {
    val rnd = new Random(seed)
    var nonEmpty = 0
    for (qn <- 1 to 50) {
      val pat = genPat(rnd, 1 + rnd.nextInt(2), graphs)
      val distinct = rnd.nextInt(5) == 0
      val sel = if (distinct) "SELECT DISTINCT" else "SELECT"
      val sparql =
        s"$sel ${vars.map("?" + _).mkString(" ")} WHERE { ${patSparql(pat)} }"
      val want = projectModel(eval(pat, None, quads), distinct)
        .map(_.mkString("|")).sorted
      val got = engineRows(eng, sparql).map(_.mkString("|")).sorted
      assert(got == want,
        s"query $qn diverged:\n$sparql\nengine=${got.take(8)}… " +
          s"(${got.size} rows)\nmodel =${want.take(8)}… (${want.size} rows)")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 10, s"only $nonEmpty non-empty results — generator bug?")
  }


  /** Extra fuzz seeds from the environment (comma-separated ints) —
    * lets a deep one-off run widen every arm without editing the
    * pinned seed lists. */
  private val extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))

  for (seed <- Seq(7, 19, 31, 43, 59) ++ extraSeeds) {
    test(s"random algebra trees match the reference evaluation (seed $seed)") {
      runRandomQueries(seed, Engine.inline(turtle),
        db.map { case (s, p, o) => (s, p, o, None) }, graphs = false)
    }
  }

  // ------------------------------------------- named-graph (quad) side

  /** Quad dataset: default graph keeps the p-cycle; g1 holds q labels,
    * g2 holds r ranks plus one p edge; g1's own NAME appears as a
    * subject in the default graph so GRAPH ?v joins against node
    * positions; g3 is referenced by queries but absent. */
  private val quadDb: Seq[Quad] = {
    val g1 = Some(e("g1")): Option[Term]
    val g2 = Some(e("g2")): Option[Term]
    Seq[Quad](
      (e("a1"), e("p"), e("a2"), None), (e("a2"), e("p"), e("a3"), None),
      (e("a3"), e("p"), e("a1"), None), (e("b1"), e("p"), e("a1"), None),
      (e("g1"), e("r"), N(7), None),
      (e("a1"), e("q"), S("x"), g1), (e("a2"), e("q"), S("y"), g1),
      (e("a3"), e("q"), S("x"), g1), (e("b1"), e("q"), S("z"), g1),
      (e("a1"), e("r"), N(1), g2), (e("a2"), e("r"), N(2), g2),
      (e("a3"), e("r"), N(3), g2), (e("b1"), e("r"), N(2), g2),
      (e("a2"), e("p"), e("b1"), g2), (e("a1"), e("q"), S("x"), g2))
  }

  private def quadEngine: Engine = {
    def rt(t: Term): rdf.RdfTerm = t match {
      case I(v) => rdf.Iri(v)
      case S(v) => rdf.Lit.plain(v)
      case N(v) => rdf.Lit.typed(v.toString, XSD.integer)
    }
    Engine.fromGraph(rdf.RdfGraph.fromQuads(spark,
      quadDb.map { case (s, p, o, g) =>
        (rt(s), rt(p), rt(o), g.map(rt)) }, Map("ex" -> EX)))
  }

  for (seed <- Seq(13, 29, 53) ++ extraSeeds.map(_ + 1000)) {
    test(s"random GRAPH algebra trees match the reference evaluation (seed $seed)") {
      runRandomQueries(seed, quadEngine, quadDb, graphs = true)
    }
  }

  // --------------------------------------------------- aggregates arm

  /** §18.5.1 aggregation: group eval(P) by the key var's value (the
    * unbound key is its own group), aggregate with ListEval semantics —
    * rows where the target var is unbound drop out of the multiset
    * (error evaluations), a non-numeric BOUND value makes SUM error →
    * the result var stays unbound, Sum({}) = 0, Min/Max({}) = error. */
  private sealed trait AggKind
  private case object ACountStar extends AggKind
  private case class ACount(v: String, distinct: Boolean) extends AggKind
  private case class ASum(v: String) extends AggKind
  private case class AMin(v: String) extends AggKind
  private case class AMax(v: String) extends AggKind

  private def aggModel(kind: AggKind, rows: Seq[Mu]): Option[Term] =
    kind match {
      case ACountStar => Some(N(rows.size))
      case ACount(v, d) =>
        val vals = rows.flatMap(_.get(v))
        Some(N((if (d) vals.distinct else vals).size))
      case ASum(v) =>
        val vals = rows.flatMap(_.get(v))
        if (vals.forall(_.isInstanceOf[N]))
          Some(N(vals.collect { case N(n) => n }.sum))
        else None // op:numeric-add type error → unbound
      case AMin(v) => minMax(rows.flatMap(_.get(v)), max = false)
      case AMax(v) => minMax(rows.flatMap(_.get(v)), max = true)
    }

  /** Min/Max over the bound values: empty → error; a mix that `<`
    * cannot compare (IRI anywhere, or int vs string) → error. */
  private def minMax(vals: Seq[Term], max: Boolean): Option[Term] =
    if (vals.isEmpty) None
    else if (vals.forall(_.isInstanceOf[N])) {
      val ns = vals.collect { case N(n) => n }
      Some(N(if (max) ns.max else ns.min))
    } else if (vals.forall(_.isInstanceOf[S])) {
      val ss = vals.collect { case S(s) => s }
      Some(S(if (max) ss.max else ss.min))
    } else None

  private def aggSparql(kind: AggKind, alias: String): String = kind match {
    case ACountStar => s"(COUNT(*) AS ?$alias)"
    case ACount(v, d) =>
      s"(COUNT(${if (d) "DISTINCT " else ""}?$v) AS ?$alias)"
    case ASum(v) => s"(SUM(?$v) AS ?$alias)"
    case AMin(v) => s"(MIN(?$v) AS ?$alias)"
    case AMax(v) => s"(MAX(?$v) AS ?$alias)"
  }

  private def genAgg(rnd: Random): AggKind = rnd.nextInt(6) match {
    case 0 => ACountStar
    case 1 => ACount(vars(rnd.nextInt(vars.length)), distinct = false)
    case 2 => ACount(vars(rnd.nextInt(vars.length)), distinct = true)
    case 3 => ASum(vars(rnd.nextInt(vars.length)))
    case 4 => AMin(vars(rnd.nextInt(vars.length)))
    case 5 => AMax(vars(rnd.nextInt(vars.length)))
  }

  // ---------------------------------------------------- CONSTRUCT arm

  for (seed <- Seq(23, 37) ++ extraSeeds.map(_ + 2000)) {
    // the non-empty sanity floor guards against a degenerate generator;
    // it is calibrated on the PINNED seeds (env-extra fuzz seeds only
    // check engine==model — a seed whose random templates mostly
    // instantiate to invalid/discarded triples is fine)
    val nonEmptyFloor = if (Seq(23, 37).contains(seed)) 5 else 0
    test(s"random CONSTRUCT templates match the reference evaluation (seed $seed)") {
      val rnd = new Random(seed)
      val eng = Engine.inline(turtle)
      val quads = db.map { case (s, p, o) => (s, p, o, None) }
      var nonEmpty = 0
      // qn 0 is a DETERMINISTIC echo query (always productive on this
      // dataset, consumes no randomness so the pinned seeds' streams are
      // unchanged): a seed whose 30 random shapes all evaluate empty —
      // seed 2404 did exactly that — must still exercise one productive
      // template end-to-end before the coverage assert below
      for (qn <- 0 to 30) {
        val pat =
          if (qn == 0) Bgp(Seq(TP(V("v0"), C(e("p")), V("v1"))))
          else genPat(rnd, 1 + rnd.nextInt(2))
        // template triples: vars from the pool plus constants. The
        // GRAMMAR forbids literal constants in subject/predicate
        // slots, but VARS there can bind to literals — instantiation
        // must SKIP those triples silently (§16.2)
        def iriConst() = C(e(Seq("a1", "a2", "b1", "fresh")(rnd.nextInt(4))))
        val tmpl = if (qn == 0) Seq(TP(V("v0"), C(e("p")), V("v1")))
        else Seq.fill(1 + rnd.nextInt(2))(TP(
          if (rnd.nextInt(4) == 0) iriConst()
          else V(vars(rnd.nextInt(vars.length))),
          if (rnd.nextInt(4) == 0) V(vars(rnd.nextInt(vars.length)))
          else C(e(preds(rnd.nextInt(preds.length)))),
          genNode(rnd, allowConst = true)))
        val sparql = s"CONSTRUCT { ${tmpl.map(tp =>
          s"${nodeSparql(tp.s)} ${nodeSparql(tp.p)} ${nodeSparql(tp.o)} .")
          .mkString(" ")} } WHERE { ${patSparql(pat)} }"
        def inst(n: Node, mu: Mu): Option[Term] = n match {
          case C(t) => Some(t)
          case V(x) => mu.get(x) // unbound → triple skipped
        }
        val want = eval(pat, None, quads).flatMap { mu =>
          tmpl.flatMap { tp =>
            for {
              s <- inst(tp.s, mu) if !s.isInstanceOf[S] && !s.isInstanceOf[N]
              p <- inst(tp.p, mu) if p.isInstanceOf[I]
              o <- inst(tp.o, mu)
            } yield (s.key, p.key, o.key)
          }
        }.toSet
        val got = eng.construct(sparql).triples.collect().toSet.map {
          r: org.apache.spark.sql.Row =>
            def k(i: Int): String = {
              val t = r.getStruct(i)
              (t.getByte(0).toInt, t.getString(1), t.getString(2)) match {
                case (0, value, _) => s"<$value>"
                case (2, value, XSD.integer) => s"#${value.toLong}"
                case (2, value, _) => s""""$value""""
                case (kk, value, _) => s"?$kk:$value"
              }
            }
            (k(0), k(1), k(2))
        }
        assert(got == want,
          s"construct $qn diverged:\n$sparql\nengine=${got.take(5)} " +
            s"(${got.size})\nmodel =${want.take(5)} (${want.size})")
        if (want.nonEmpty) nonEmpty += 1
      }
      assert(nonEmpty > nonEmptyFloor,
        s"only $nonEmpty non-empty results — generator bug?")
    }
  }

  for (seed <- Seq(17, 41, 67) ++ extraSeeds.map(_ + 3000)) {
    test(s"random aggregate queries match the reference evaluation (seed $seed)") {
      val rnd = new Random(seed)
      val eng = Engine.inline(turtle)
      val quads = db.map { case (s, p, o) => (s, p, o, None) }
      var nonEmpty = 0
      for (qn <- 1 to 40) {
        val pat = genPat(rnd, 1 + rnd.nextInt(2))
        val key = vars(rnd.nextInt(vars.length))
        val aggs = Seq.fill(1 + rnd.nextInt(2))(genAgg(rnd))
          .zipWithIndex.map { case (a, i) => (a, s"a$i") }
        val havingMin = if (rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(2))
          else None
        val sparql = s"SELECT ?$key ${aggs.map { case (a, al) =>
          aggSparql(a, al) }.mkString(" ")} " +
          s"WHERE { ${patSparql(pat)} } GROUP BY ?$key" +
          havingMin.map(m => s" HAVING (COUNT(*) >= $m)").getOrElse("")
        val groups = eval(pat, None, quads).groupBy(_.get(key))
          .filter { case (_, rows) => havingMin.forall(rows.size >= _) }
        val want = groups.toSeq.map { case (k, rows) =>
          (k.map(_.key).getOrElse("∅") +:
            aggs.map { case (a, _) =>
              aggModel(a, rows).map(_.key).getOrElse("∅") }).mkString("|")
        }.sorted
        val got = eng.selectRaw(sparql).collect().toSeq.map { r =>
          (key +: aggs.map(_._2)).map { c =>
            val i = r.fieldIndex(c)
            if (r.isNullAt(i)) "∅"
            else {
              val t = r.getStruct(i)
              (t.getByte(0).toInt, t.getString(1), t.getString(2)) match {
                case (0, value, _) => s"<$value>"
                case (2, value, XSD.integer) => s"#${value.toLong}"
                case (2, value, _) => s""""$value""""
                case (k2, value, _) => s"?$k2:$value"
              }
            }
          }.mkString("|")
        }.sorted
        assert(got == want,
          s"aggregate query $qn diverged:\n$sparql\nengine=${got.take(6)}… " +
            s"(${got.size} rows)\nmodel =${want.take(6)}… (${want.size} rows)")
        if (want.nonEmpty) nonEmpty += 1
      }
      assert(nonEmpty > 10, s"only $nonEmpty non-empty results — generator bug?")
    }
  }
}
