package graft.sparql

import graft.rdf.RdfTerm

/** SPARQL 1.1 abstract syntax.
  *
  * The surface covered is everything the reference corpus exercises
  * (SURVEY.md §2B: BGP/FILTER/BIND/VALUES/OPTIONAL/MINUS/UNION/subquery,
  * property paths, GROUP BY + aggregates, ORDER/LIMIT/OFFSET, UPDATE
  * INSERT/DELETE WHERE) plus the standard builtins.
  */
object Ast {

  // ---- pattern positions ---------------------------------------------------

  sealed trait Node
  final case class VarNode(name: String) extends Node
  final case class TermNode(term: RdfTerm) extends Node
  /** RDF-star quoted-triple PATTERN `<< s p o >>` with at least one
    * variable component (fully concrete quoted triples parse straight
    * to `TermNode(QuotedTriple)`). Matches quoted-triple TERMS in the
    * data, binding the variables from their components. */
  final case class QuotedNode(s: Node, p: Node, o: Node) extends Node

  /** Triple pattern; predicate may be a var, a term, or a property path. */
  final case class TriplePattern(s: Node, p: Verb, o: Node)

  sealed trait Verb
  final case class VerbNode(n: Node) extends Verb
  final case class VerbPath(p: Path) extends Verb

  // ---- property paths ------------------------------------------------------

  sealed trait Path
  final case class PLink(iri: String) extends Path
  final case class PInv(p: Path) extends Path
  final case class PSeq(a: Path, b: Path) extends Path
  final case class PAlt(a: Path, b: Path) extends Path
  final case class PZeroOrMore(p: Path) extends Path
  final case class POneOrMore(p: Path) extends Path
  final case class PZeroOrOne(p: Path) extends Path
  /** !(iri|...|^iri|...) — forward and inverse excluded predicate sets. */
  final case class PNeg(fwd: Seq[String], inv: Seq[String]) extends Path

  // ---- expressions ---------------------------------------------------------

  sealed trait Expr
  final case class ExVar(name: String) extends Expr
  final case class ExTerm(term: RdfTerm) extends Expr
  final case class ExOr(l: Expr, r: Expr) extends Expr
  final case class ExAnd(l: Expr, r: Expr) extends Expr
  final case class ExNot(e: Expr) extends Expr
  /** op ∈ =, !=, <, >, <=, >= */
  final case class ExCmp(op: String, l: Expr, r: Expr) extends Expr
  /** op ∈ +, -, *, / */
  final case class ExArith(op: String, l: Expr, r: Expr) extends Expr
  final case class ExNegNum(e: Expr) extends Expr
  final case class ExIn(e: Expr, list: Seq[Expr], negated: Boolean) extends Expr
  /** Builtin call or xsd cast; name is upper-cased for builtins, full IRI
    * for casts/custom functions. */
  final case class ExCall(name: String, args: Seq[Expr]) extends Expr
  final case class ExExists(pattern: GraphPattern, negated: Boolean) extends Expr
  final case class ExAgg(fn: String, distinct: Boolean, arg: Option[Expr],
      separator: Option[String]) extends Expr

  // ---- graph patterns (algebra-ish, folded during parse) --------------------

  sealed trait GraphPattern
  case object Unit0 extends GraphPattern
  final case class Bgp(triples: Seq[TriplePattern]) extends GraphPattern
  final case class Join(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class LeftJoin(l: GraphPattern, r: GraphPattern, filters: Seq[Expr])
      extends GraphPattern
  final case class Minus(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class Union(l: GraphPattern, r: GraphPattern) extends GraphPattern
  final case class Filter(p: GraphPattern, exprs: Seq[Expr]) extends GraphPattern
  final case class Extend(p: GraphPattern, v: String, expr: Expr) extends GraphPattern
  /** VALUES: vars + rows (None = UNDEF). */
  final case class TableData(vars: Seq[String], rows: Seq[Seq[Option[RdfTerm]]])
      extends GraphPattern
  final case class SubSelect(q: SelectQuery) extends GraphPattern
  /** GRAPH ?g { p } / GRAPH <iri> { p } — scope `p` to one named graph
    * (binding ?g per solution when the graph name is a variable). */
  final case class GraphPat(g: Node, p: GraphPattern) extends GraphPattern
  /** SERVICE [SILENT] <endpoint> { p } — federation: `p` executes on the
    * remote SPARQL endpoint, results compatible-join with the rest. */
  final case class Service(endpoint: Node, p: GraphPattern, silent: Boolean)
      extends GraphPattern

  // ---- queries ---------------------------------------------------------------

  sealed trait Projection
  case object SelectAll extends Projection
  final case class SelectVars(items: Seq[ProjItem]) extends Projection
  final case class ProjItem(expr: Expr, alias: Option[String]) {
    /** Output column name. */
    def name: String = alias.getOrElse(expr match {
      case ExVar(v) => v
      case _ => throw new IllegalArgumentException(
        "non-variable projection requires AS alias")
    })
  }

  sealed trait GroupCond
  final case class GroupVar(name: String) extends GroupCond
  final case class GroupExpr(expr: Expr, alias: Option[String]) extends GroupCond

  final case class Modifiers(
      groupBy: Seq[GroupCond] = Nil,
      having: Seq[Expr] = Nil,
      orderBy: Seq[(Expr, Boolean)] = Nil, // (expr, ascending)
      limit: Option[Long] = None,
      offset: Option[Long] = None)

  sealed trait Query
  final case class SelectQuery(
      distinct: Boolean,
      reduced: Boolean,
      projection: Projection,
      where: GraphPattern,
      mods: Modifiers,
      values: Option[TableData] = None,
      dataset: DatasetClause = DatasetClause.empty) extends Query
  final case class ConstructQuery(template: Seq[TriplePattern],
      where: GraphPattern, mods: Modifiers,
      dataset: DatasetClause = DatasetClause.empty) extends Query
  final case class AskQuery(where: GraphPattern,
      dataset: DatasetClause = DatasetClause.empty) extends Query
  /** DESCRIBE: targets are IRIs (TermNode) and/or variables (VarNode)
    * bound by the optional WHERE pattern. */
  final case class DescribeQuery(targets: Seq[Node],
      where: Option[GraphPattern]) extends Query

  /** FROM / FROM NAMED clauses: the query's RDF dataset description.
    * `defaults` merge into the pattern-matching default graph; `named`
    * restricts the graphs GRAPH patterns range over. An empty clause
    * means "use the store's own dataset". */
  final case class DatasetClause(defaults: Seq[String], named: Seq[String]) {
    def isEmpty: Boolean = defaults.isEmpty && named.isEmpty
  }
  object DatasetClause {
    val empty: DatasetClause = DatasetClause(Nil, Nil)
    def of(clauses: Seq[(Boolean, String)]): DatasetClause = DatasetClause(
      clauses.collect { case (false, i) => i },
      clauses.collect { case (true, i) => i })
  }

  final case class Prologue(base: Option[String], prefixes: Map[String, String])

  final case class ParsedQuery(prologue: Prologue, query: Query)

  // ---- updates ---------------------------------------------------------------

  /** One quad of an update template / data block: a triple pattern plus
    * the graph it targets. `g` None = the operation's default graph (the
    * store's default graph, or the Modify's WITH graph); Some(VarNode) is
    * legal in templates and DELETE WHERE (the graph name binds per
    * solution), Some(TermNode(Iri)) everywhere (Update §3.1:
    * QuadPattern / QuadData). */
  final case class Quad(t: TriplePattern, g: Option[Node])

  sealed trait UpdateOp
  final case class InsertData(quads: Seq[Quad]) extends UpdateOp
  final case class DeleteData(quads: Seq[Quad]) extends UpdateOp
  /** DELETE {t} INSERT {t} WHERE {p}; either template may be empty.
    * `withGraph` (WITH <g>) sets the default graph BOTH templates and —
    * when no USING/USING NAMED clause is present — the WHERE pattern
    * operate on (Update §3.1.3: USING overrides WITH for the WHERE
    * only). `using` is the WHERE's FROM/FROM NAMED-equivalent dataset. */
  final case class Modify(delete: Seq[Quad], insert: Seq[Quad],
      where: GraphPattern, withGraph: Option[String] = None,
      using: DatasetClause = DatasetClause.empty) extends UpdateOp
  final case class DeleteWhere(template: Seq[Quad]) extends UpdateOp

  /** Target of CLEAR / DROP (Update §3.2.2/§3.2.3). */
  sealed trait GraphRef
  case object DefaultRef extends GraphRef
  case object NamedRef extends GraphRef
  case object AllRef extends GraphRef
  final case class OneGraphRef(iri: String) extends GraphRef

  final case class Clear(target: GraphRef, silent: Boolean) extends UpdateOp
  /** DROP — this store does not record empty graphs (a graph exists iff
    * it holds at least one quad, the SPARQL-sanctioned posture), so DROP
    * is CLEAR with graph-existence enforcement. */
  final case class Drop(target: GraphRef, silent: Boolean) extends UpdateOp
  /** CREATE GRAPH <g> — a no-op on this store (empty graphs are not
    * recorded) except the §3.2.1 already-exists error without SILENT. */
  final case class Create(iri: String, silent: Boolean) extends UpdateOp
  /** ADD/MOVE/COPY (GRAPH <from>|DEFAULT) TO (GRAPH <to>|DEFAULT) —
    * None = DEFAULT (Update §3.2.5-§3.2.7). */
  final case class AddGraph(from: Option[String], to: Option[String],
      silent: Boolean) extends UpdateOp
  final case class MoveGraph(from: Option[String], to: Option[String],
      silent: Boolean) extends UpdateOp
  final case class CopyGraph(from: Option[String], to: Option[String],
      silent: Boolean) extends UpdateOp

  /** LOAD [SILENT] <url> [INTO GRAPH <g>] — the parsed document merges
    * into the target graph: the default graph when no INTO, the named
    * graph on a quad store (a triple-only store raises a loud error
    * rather than misfiling — promote with RdfGraph.asQuadStore). SILENT
    * turns retrieval/parse failures into a no-op (§3.1.4); it does NOT
    * silence the triple-store capability error, which is a store-shape
    * problem, not a document one. */
  final case class Load(url: String, intoGraph: Option[String],
      silent: Boolean = false) extends UpdateOp

  final case class ParsedUpdate(prologue: Prologue, ops: Seq[UpdateOp])

  // ---- helpers ---------------------------------------------------------------

  /** In-scope variables of a pattern (for join-key computation: MINUS
    * disjoint-domain rule, OPTIONAL shared vars, EXISTS correlation). */
  def inScopeVars(p: GraphPattern): Set[String] = p match {
    case Unit0 => Set.empty
    case Bgp(ts) => ts.flatMap(tripleVars).toSet
    case Join(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case LeftJoin(l, r, _) => inScopeVars(l) ++ inScopeVars(r)
    case Minus(l, _) => inScopeVars(l)
    case Union(l, r) => inScopeVars(l) ++ inScopeVars(r)
    case Filter(q, _) => inScopeVars(q)
    case Extend(q, v, _) => inScopeVars(q) + v
    case TableData(vars, _) => vars.toSet
    case SubSelect(q) => q.projection match {
      case SelectAll => inScopeVars(q.where)
      case SelectVars(items) => items.map(_.name).toSet
    }
    case GraphPat(g, q) => inScopeVars(q) ++ (g match {
      case VarNode(v) => Set(v)
      case _ => Set.empty[String]
    })
    case Service(ep, q, _) => inScopeVars(q) ++ (ep match {
      case VarNode(v) => Set(v)
      case _ => Set.empty[String]
    })
  }

  def tripleVars(t: TriplePattern): Seq[String] = {
    def nv(n: Node): Seq[String] = n match {
      case VarNode(v) => Seq(v)
      case QuotedNode(s, p, o) => nv(s) ++ nv(p) ++ nv(o)
      case _ => Nil
    }
    nv(t.s) ++ (t.p match {
      case VerbNode(n) => nv(n); case VerbPath(_) => Nil
    }) ++ nv(t.o)
  }

  def exprVars(e: Expr): Set[String] = e match {
    case ExVar(v) => Set(v)
    case ExTerm(_) => Set.empty
    case ExOr(l, r) => exprVars(l) ++ exprVars(r)
    case ExAnd(l, r) => exprVars(l) ++ exprVars(r)
    case ExNot(x) => exprVars(x)
    case ExCmp(_, l, r) => exprVars(l) ++ exprVars(r)
    case ExArith(_, l, r) => exprVars(l) ++ exprVars(r)
    case ExNegNum(x) => exprVars(x)
    case ExIn(x, list, _) => exprVars(x) ++ list.flatMap(exprVars)
    case ExCall(_, args) => args.flatMap(exprVars).toSet
    case ExExists(p, _) => inScopeVars(p)
    case ExAgg(_, _, arg, _) => arg.map(exprVars).getOrElse(Set.empty)
  }
}
