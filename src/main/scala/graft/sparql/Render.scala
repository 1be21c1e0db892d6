package graft.sparql

import graft.rdf.RdfTerm
import Ast._

/** AST → SPARQL text renderer — the serialization side of SERVICE
  * federation: the sub-pattern inside `SERVICE <endpoint> { … }` ships
  * to the remote endpoint as query text, so the compiler needs to turn
  * the parsed algebra back into concrete syntax. Rendering is fully
  * qualified (every IRI in `<>` form, no prefixes) so the remote needs
  * no prologue, and parenthesizes defensively — the output is meant to
  * be unambiguous, not pretty.
  *
  * Internal anonymous-blank variables (named `_:bN` by the parser)
  * render back as blank node labels: they are existential within the
  * pattern and are never projected across the wire. */
object Render {

  def pattern(p: GraphPattern): String = s"{ ${body(p)} }"

  /** A pattern whose flat rendering would expose GROUP-LEVEL FILTERs
    * to the parent group must be braced when embedded beside other
    * operands: per §18.2.2.2 a group's filters apply to the WHOLE
    * group regardless of textual position, so flattening `Filter(l, c)
    * OPTIONAL { r }` into one group widens c's scope to include r's
    * bindings on reparse (found by ServiceModelSpec's differential
    * fuzz: a left-side `BOUND(?x)` leaked across its OPTIONAL). Only
    * Filter, Join, and Extend render flat; everything else emits a
    * self-contained form. Bracing is otherwise semantics-neutral here:
    * an AST operand was a distinct group (or a BGP, which shares no
    * blank-node labels across operands in any legal source). */
  private def carriesFilters(p: GraphPattern): Boolean = p match {
    case Filter(_, _) => true
    case Join(l, r) => carriesFilters(l) || carriesFilters(r)
    case Extend(q, _, _) => carriesFilters(q)
    case _ => false
  }

  private def operand(p: GraphPattern): String = {
    val b = body(p)
    if (carriesFilters(p) && b.nonEmpty) s"{ $b }" else b
  }

  private def body(p: GraphPattern): String = p match {
    case Unit0 => ""
    case Bgp(ts) => ts.map(triple).mkString(" . ")
    // '.' between the operands: without it, Join(Bgp, Bgp) — which the
    // parser's single-group unwrap produces for { { t1 } t2 } — would
    // render adjacent triples with no separator, a syntax error on the
    // wire. The grammar allows '.' after any group-level element, so
    // the separator is safe whatever the operands are.
    case Join(l, r) =>
      val (a, b) = (operand(l), operand(r))
      if (a.isEmpty) b else if (b.isEmpty) a else s"$a . $b"
    case LeftJoin(l, r, filters) =>
      val fs = filters.map(f => s" FILTER(${expr(f)})").mkString
      s"${operand(l)} OPTIONAL { ${body(r)}$fs }"
    case Minus(l, r) => s"${operand(l)} MINUS { ${body(r)} }"
    case Union(l, r) => s"{ ${body(l)} } UNION { ${body(r)} }"
    case Filter(q, exprs) =>
      body(q) + exprs.map(e => s" FILTER(${expr(e)})").mkString
    case Extend(q, v, e) => s"${body(q)} BIND(${expr(e)} AS ?$v)"
    case TableData(vars, rows) =>
      val header = vars.map("?" + _).mkString(" ")
      val rws = rows.map(r =>
        "(" + r.map {
          case Some(t) => term(t)
          case None => "UNDEF"
        }.mkString(" ") + ")").mkString(" ")
      s"VALUES ($header) { $rws }"
    case SubSelect(q) => s"{ ${select(q)} }"
    case GraphPat(g, q) => s"GRAPH ${node(g)} { ${body(q)} }"
    case Service(ep, q, silent) =>
      val s = if (silent) "SILENT " else ""
      s"SERVICE $s${node(ep)} { ${body(q)} }"
  }

  def select(q: SelectQuery): String = {
    val mode = if (q.distinct) "DISTINCT " else if (q.reduced) "REDUCED " else ""
    val proj = q.projection match {
      case SelectAll => "*"
      case SelectVars(items) => items.map {
        case ProjItem(ExVar(v), None) => s"?$v"
        case ProjItem(e, Some(a)) => s"(${expr(e)} AS ?$a)"
        case ProjItem(e, None) => s"(${expr(e)})"
      }.mkString(" ")
    }
    val groupBy =
      if (q.mods.groupBy.isEmpty) ""
      else " GROUP BY " + q.mods.groupBy.map {
        case GroupVar(v) => s"?$v"
        case GroupExpr(e, Some(a)) => s"(${expr(e)} AS ?$a)"
        case GroupExpr(e, None) => s"(${expr(e)})"
      }.mkString(" ")
    val having =
      if (q.mods.having.isEmpty) ""
      else " HAVING " + q.mods.having.map(e => s"(${expr(e)})").mkString(" ")
    val orderBy =
      if (q.mods.orderBy.isEmpty) ""
      else " ORDER BY " + q.mods.orderBy.map {
        case (e, true) => s"ASC(${expr(e)})"
        case (e, false) => s"DESC(${expr(e)})"
      }.mkString(" ")
    val limit = q.mods.limit.map(" LIMIT " + _).getOrElse("")
    val offset = q.mods.offset.map(" OFFSET " + _).getOrElse("")
    val values = q.values.map(td => " " + body(td)).getOrElse("")
    s"SELECT $mode$proj WHERE { ${body(q.where)} }" +
      groupBy + having + orderBy + limit + offset + values
  }

  private def triple(t: TriplePattern): String = {
    val verb = t.p match {
      case VerbNode(n) => node(n)
      case VerbPath(p) => path(p)
    }
    s"${node(t.s)} $verb ${node(t.o)}"
  }

  def node(n: Node): String = n match {
    // minted anonymous blanks carry '!' (collision-proof in-engine,
    // illegal on the wire) — re-legalize for the remote
    case VarNode(v) if v.startsWith("_:!") => "_:ga" + v.substring(3)
    case VarNode(v) if v.startsWith("_:") => v // user blank: keep label
    case VarNode(v) => s"?$v"
    case TermNode(t) => term(t)
    case QuotedNode(s, p, o) => s"<< ${node(s)} ${node(p)} ${node(o)} >>"
  }

  def term(t: RdfTerm): String = t.n3()

  def path(p: Path): String = p match {
    case PLink(iri) => s"<$iri>"
    case PInv(q) => s"^(${path(q)})"
    case PSeq(a, b) => s"(${path(a)}/${path(b)})"
    case PAlt(a, b) => s"(${path(a)}|${path(b)})"
    case PZeroOrMore(q) => s"(${path(q)})*"
    case POneOrMore(q) => s"(${path(q)})+"
    case PZeroOrOne(q) => s"(${path(q)})?"
    case PNeg(fwd, inv) =>
      val items = fwd.map(i => s"<$i>") ++ inv.map(i => s"^<$i>")
      s"!(${items.mkString("|")})"
  }

  def expr(e: Expr): String = e match {
    case ExVar(v) => s"?$v"
    case ExTerm(t) => term(t)
    case ExOr(l, r) => s"(${expr(l)} || ${expr(r)})"
    case ExAnd(l, r) => s"(${expr(l)} && ${expr(r)})"
    case ExNot(x) => s"(!${expr(x)})"
    case ExCmp(op, l, r) => s"(${expr(l)} $op ${expr(r)})"
    case ExArith(op, l, r) => s"(${expr(l)} $op ${expr(r)})"
    case ExNegNum(x) => s"(-${expr(x)})"
    case ExIn(x, list, neg) =>
      val kw = if (neg) "NOT IN" else "IN"
      s"(${expr(x)} $kw (${list.map(expr).mkString(", ")}))"
    case ExCall(name, args) =>
      val fn = if (name.contains(":") || name.contains("/")) s"<$name>" else name
      s"$fn(${args.map(expr).mkString(", ")})"
    case ExExists(p, neg) =>
      val kw = if (neg) "NOT EXISTS" else "EXISTS"
      s"$kw { ${body(p)} }"
    case ExAgg(fn, distinct, arg, sep) =>
      val d = if (distinct) "DISTINCT " else ""
      val a = arg.map(expr).getOrElse("*")
      val s = sep.map(x => s"; SEPARATOR=${Lit0(x)}").getOrElse("")
      s"$fn($d$a$s)"
  }

  private def Lit0(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
