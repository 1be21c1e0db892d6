package graft.sparql

import graft.rdf.{Iri, QuotedTriple, RdfTerm}
import Ast._

/** Parameter substitution at AST level: variables named `?_x` (the
  * reference's `_var_regex` convention, gastrodon/__init__.py:45,348-356)
  * are replaced by the constant term bound to "x" BEFORE compilation, so
  * the plan sees literals (→ Catalyst constant folding + pushdown). The
  * reference does this by textual n3-substitution; AST substitution has the
  * same semantics without injection risk. */
object Substitute {

  def apply(q: SelectQuery, b: Map[String, RdfTerm]): SelectQuery =
    if (b.isEmpty) q else selectQ(q, b.map { case (k, v) => ("_" + k, v) })

  def apply(q: ConstructQuery, b: Map[String, RdfTerm]): ConstructQuery =
    if (b.isEmpty) q else {
      val m = b.map { case (k, v) => ("_" + k, v) }
      ConstructQuery(q.template.map(triple(_, m)), pattern(q.where, m), q.mods)
    }

  def apply(op: UpdateOp, b: Map[String, RdfTerm]): UpdateOp =
    if (b.isEmpty) op else {
      val m = b.map { case (k, v) => ("_" + k, v) }
      op match {
        case InsertData(ts) => InsertData(ts.map(quad(_, m)))
        case DeleteData(ts) => DeleteData(ts.map(quad(_, m)))
        case DeleteWhere(ts) => DeleteWhere(ts.map(quad(_, m)))
        case Modify(d, i, w, g, u) =>
          Modify(d.map(quad(_, m)), i.map(quad(_, m)), pattern(w, m), g, u)
        case other => other // CLEAR/DROP/CREATE/ADD/MOVE/COPY/LOAD carry no vars
      }
    }

  private def quad(q: Quad, m: Map[String, RdfTerm]): Quad =
    Quad(triple(q.t, m), q.g.map(node(_, m)))

  private def selectQ(q: SelectQuery, m: Map[String, RdfTerm]): SelectQuery =
    q.copy(
      projection = q.projection match {
        case SelectAll => SelectAll
        case SelectVars(items) =>
          SelectVars(items.map(i => ProjItem(expr(i.expr, m), i.alias)))
      },
      where = pattern(q.where, m),
      mods = q.mods.copy(
        groupBy = q.mods.groupBy.map {
          case GroupExpr(e, a) => GroupExpr(expr(e, m), a)
          case g => g
        },
        having = q.mods.having.map(expr(_, m)),
        orderBy = q.mods.orderBy.map { case (e, asc) => (expr(e, m), asc) }))

  private def node(n: Node, m: Map[String, RdfTerm]): Node = n match {
    case VarNode(v) if m.contains(v) => TermNode(m(v))
    case QuotedNode(s, p, o) =>
      // substituting may make the quoted pattern fully concrete — then
      // it collapses to a quoted-triple TERM, like the parser does
      (node(s, m), node(p, m), node(o, m)) match {
        case (TermNode(st), TermNode(pt: Iri), TermNode(ot)) =>
          TermNode(QuotedTriple(st, pt, ot))
        case (s2, p2, o2) => QuotedNode(s2, p2, o2)
      }
    case other => other
  }

  private def triple(t: TriplePattern, m: Map[String, RdfTerm]): TriplePattern =
    TriplePattern(node(t.s, m), t.p match {
      case VerbNode(n) => VerbNode(node(n, m))
      case p => p
    }, node(t.o, m))

  def pattern(p: GraphPattern, m: Map[String, RdfTerm]): GraphPattern = p match {
    case Unit0 => Unit0
    case Bgp(ts) => Bgp(ts.map(triple(_, m)))
    case Join(l, r) => Join(pattern(l, m), pattern(r, m))
    case LeftJoin(l, r, f) =>
      LeftJoin(pattern(l, m), pattern(r, m), f.map(expr(_, m)))
    case Minus(l, r) => Minus(pattern(l, m), pattern(r, m))
    case Union(l, r) => Union(pattern(l, m), pattern(r, m))
    case Filter(q, f) => Filter(pattern(q, m), f.map(expr(_, m)))
    case Extend(q, v, e) => Extend(pattern(q, m), v, expr(e, m))
    case t: TableData => t
    case SubSelect(q) => SubSelect(selectQ(q, m))
    case GraphPat(g, q) => GraphPat(node(g, m), pattern(q, m))
    case Service(ep, q, s) => Service(node(ep, m), pattern(q, m), s)
  }

  def expr(e: Expr, m: Map[String, RdfTerm]): Expr = e match {
    case ExVar(v) if m.contains(v) => ExTerm(m(v))
    case ExOr(l, r) => ExOr(expr(l, m), expr(r, m))
    case ExAnd(l, r) => ExAnd(expr(l, m), expr(r, m))
    case ExNot(x) => ExNot(expr(x, m))
    case ExCmp(op, l, r) => ExCmp(op, expr(l, m), expr(r, m))
    case ExArith(op, l, r) => ExArith(op, expr(l, m), expr(r, m))
    case ExNegNum(x) => ExNegNum(expr(x, m))
    case ExIn(x, list, n) => ExIn(expr(x, m), list.map(expr(_, m)), n)
    case ExCall(n, args) => ExCall(n, args.map(expr(_, m)))
    case ExExists(p, n) => ExExists(pattern(p, m), n)
    case ExAgg(fn, d, arg, sep) => ExAgg(fn, d, arg.map(expr(_, m)), sep)
    case other => other
  }
}
