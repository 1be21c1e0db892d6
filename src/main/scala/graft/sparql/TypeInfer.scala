package graft.sparql

import graft.Display
import graft.rdf._
import Ast._

/** Static display-type inference: derive each projected column's display
  * decision (native cast vs string display, Display.displayDecision) from
  * the query AST plus the graph's schema metadata (RdfGraph.predObjTypes),
  * so `Engine.select` needs NO data pass to type its output.
  *
  * The reference types columns by trying int()/float() per value
  * (gastrodon/__init__.py:374-387); round 1 replaced that with one
  * collect_set aggregate pass — still a full extra scan of the result at
  * scale. This replaces the pass entirely for schema-typed sources.
  *
  * Soundness rule: a column's inferred decision is returned only when
  * EVERY possible term signature of that column maps to the SAME decision
  * (the singleton rule). The data-driven sniff in Display computes its
  * decision from the signatures actually present — a subset of the
  * possible ones — so a singleton possible-set guarantees the sniff would
  * have chosen the identical decision. Anything unknown or mixed falls
  * back to the sniffing pass (`None`).
  */
object TypeInfer {

  import Display.{Decision, DLong, DDouble, DBool, DTs, DDate, DStr, DStrQ,
    DUnknown}

  private val U: Set[Decision] = Set(DUnknown)

  /** Display decision of one literal datatype, mirroring the sniff's
    * branch structure (Display.displayDecision on a singleton set). */
  private def dtDecision(dt: String): Decision =
    if (XSD.integral(dt)) DLong
    else if (XSD.numeric(dt)) DDouble
    else if (dt == XSD.boolean) DBool
    else if (dt == XSD.dateTime) DTs
    else if (dt == XSD.date) DDate
    else DStr

  private def termDecision(t: RdfTerm): Decision = t match {
    case Iri(_) => DStr
    case Blank(_) => DStr
    case Lit(_, dt, _) => dtDecision(dt)
    // a quoted-triple constant (VALUES/BIND in a 1.2 query) needs the
    // RDF-star rendering branch; DStrQ ∪ DStr is non-singleton, so any
    // mixed column falls back to the exact data-driven sniff
    case QuotedTriple(_, _, _) => DStrQ
  }

  private def objType(o: PredObjType): Decision = o match {
    case IriObj => DStr
    case LitObj(dt) => dtDecision(dt)
  }

  /** Per-column display decisions for a SELECT, or None when any projected
    * column cannot be typed statically. Only meaningful for graphs with
    * predObjTypes metadata (whose subjects are guaranteed IRIs).
    *
    * Documented cosmetic divergence from the sniffing fallback: a column
    * whose rows are ALL null at runtime (an OPTIONAL that never matches, a
    * cast failing on every row) keeps its statically-derived dtype here,
    * while the sniff — seeing an empty signature set — would render it as
    * a string column. The two paths never both run for one query, every
    * value is null either way, and the static dtype is the more faithful
    * one, so this is accepted rather than papered over. */
  def selectDecisions(q: SelectQuery, g: RdfGraph): Option[Map[String, Decision]] = {
    if (g.predObjTypes.isEmpty) return None
    val meta = g.predObjTypes
    val out = selectSigs(q, meta)
    val decided = out.map { case (n, ds) =>
      n -> (if (ds.size == 1 && ds.head != DUnknown) Some(ds.head) else None)
    }
    if (decided.isEmpty || decided.values.exists(_.isEmpty)) None
    else Some(decided.map { case (n, d) => n -> d.get })
  }

  /** Can variable `v`, bound by `p` against a predObjTypes-carrying
    * graph, EVER bind a quoted-triple term? Used by the UPDATE path to
    * decide whether an INSERT template with `v` in a term slot can
    * extend the schema metadata instead of dropping it: only a
    * provably-never-quoted signature set (no DStrQ, no unknown)
    * preserves the metadata invariant. Conservative by construction —
    * an unknown signature (TRIPLE(...) binds, SERVICE vars, unlisted
    * predicates) counts as possibly-quoted. */
  private[graft] def neverQuotedVar(v: String, p: GraphPattern,
      meta: Map[String, Set[PredObjType]]): Boolean = {
    val sigs = patternSigs(p, meta).getOrElse(v, U)
    sigs.nonEmpty && !sigs.contains(DStrQ) && !sigs.contains(DUnknown)
  }

  // -------------------------------------------------------------- patterns

  private def merge(a: Map[String, Set[Decision]], b: Map[String, Set[Decision]])
      : Map[String, Set[Decision]] =
    (a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, Set.empty) ++ b.getOrElse(k, Set.empty))
    }.toMap

  /** Possible decision-signatures per variable of a pattern. Values bound
    * in only some branches (UNION/OPTIONAL) are fine: nulls carry no
    * signature, and the union of branch sets covers every non-null row. */
  private def patternSigs(p: GraphPattern,
      meta: Map[String, Set[PredObjType]]): Map[String, Set[Decision]] = p match {
    case Unit0 => Map.empty
    case Bgp(ts) => ts.map(tripleSigs(_, meta)).foldLeft(
      Map.empty[String, Set[Decision]])(merge)
    case Join(l, r) => merge(patternSigs(l, meta), patternSigs(r, meta))
    case LeftJoin(l, r, _) => merge(patternSigs(l, meta), patternSigs(r, meta))
    case Minus(l, _) => patternSigs(l, meta)
    case Union(l, r) => merge(patternSigs(l, meta), patternSigs(r, meta))
    case Filter(q, _) => patternSigs(q, meta)
    case Extend(q, v, e) =>
      val env = patternSigs(q, meta)
      merge(env, Map(v -> exprSigs(e, env)))
    case TableData(vars, rows) =>
      vars.zipWithIndex.map { case (v, i) =>
        v -> rows.flatMap(_(i)).map(termDecision).toSet
      }.toMap
    case SubSelect(q) => selectSigs(q, meta)
    case GraphPat(g, q) =>
      // graph names are IRIs → string display
      val gs = g match {
        case VarNode(v) => Map(v -> Set[Decision](DStr))
        case _ => Map.empty[String, Set[Decision]]
      }
      merge(gs, patternSigs(q, meta))
    case Service(_, q, _) =>
      // remote data is unconstrained by the LOCAL graph's schema — the
      // singleton-soundness rule cannot hold for any var the service
      // binds, so force the data-driven sniff for all of them
      inScopeVars(q).map(_ -> U).toMap
  }

  private def tripleSigs(tp: TriplePattern,
      meta: Map[String, Set[PredObjType]]): Map[String, Set[Decision]] = {
    // subjects/predicates are resources (IRI or blank) → string display
    val s = tp.s match { case VarNode(v) => Map(v -> Set[Decision](DStr)); case _ => Map.empty[String, Set[Decision]] }
    val (pm, oSig) = tp.p match {
      case VerbNode(VarNode(pv)) =>
        (Map(pv -> Set[Decision](DStr)), U) // var predicate → object unknown
      case VerbNode(TermNode(Iri(p))) =>
        (Map.empty[String, Set[Decision]], predObjSigs(p, meta))
      case VerbNode(TermNode(_)) => (Map.empty[String, Set[Decision]], U)
      case VerbPath(path) => (Map.empty[String, Set[Decision]], pathObjSigs(path, tp.s, meta))
    }
    val o = tp.o match { case VarNode(v) => Map(v -> oSig); case _ => Map.empty[String, Set[Decision]] }
    merge(merge(s, pm), o)
  }

  private def predObjSigs(p: String, meta: Map[String, Set[PredObjType]])
      : Set[Decision] =
    meta.get(p).map(_.map(objType)).getOrElse(U)

  /** Object-side signatures of a property path. Subject side of any path
    * is a resource (DStr). */
  private def pathObjSigs(path: Path, subj: Node,
      meta: Map[String, Set[PredObjType]]): Set[Decision] = path match {
    case PLink(p) => predObjSigs(p, meta)
    case PInv(_) => Set(DStr) // object side of an inverse = a subject
    case PSeq(_, b) => pathObjSigs(b, subj, meta)
    case PAlt(a, b) => pathObjSigs(a, subj, meta) ++ pathObjSigs(b, subj, meta)
    case POneOrMore(inner) => pathObjSigs(inner, subj, meta)
    case PZeroOrMore(inner) =>
      // zero length binds the object to the subject endpoint
      val zero: Set[Decision] = subj match {
        case TermNode(t) => Set(termDecision(t))
        case VarNode(_) => U // all graph nodes (may include literals)
      }
      pathObjSigs(inner, subj, meta) ++ zero
    case PZeroOrOne(inner) =>
      val zero: Set[Decision] = subj match {
        case TermNode(t) => Set(termDecision(t))
        case VarNode(_) => U
      }
      pathObjSigs(inner, subj, meta) ++ zero
    case PNeg(_, _) => U
  }

  // ----------------------------------------------------------- expressions

  private def exprSigs(e: Expr, env: Map[String, Set[Decision]]): Set[Decision] = e match {
    case ExVar(v) => env.getOrElse(v, U)
    case ExTerm(t) => Set(termDecision(t))
    case ExOr(_, _) | ExAnd(_, _) | ExNot(_) | ExCmp(_, _, _) |
         ExIn(_, _, _) => Set(DBool)
    case ExArith(op, l, r) => arithSigs(op, exprSigs(l, env), exprSigs(r, env))
    case ExNegNum(x) => arithSigs("-", Set(DLong), exprSigs(x, env))
    case ExCall(name, args) => callSigs(name, args, env)
    case ExAgg(fn, distinct, arg, _) => aggSigs(fn, distinct, arg, env)
    case ExExists(_, _) => Set(DBool)
  }

  /** Mirrors ExprCompiler.arith: `/` is always double; +,-,* stay integer
    * when both operands are integral, double otherwise; non-numeric
    * operands yield null (no signature). */
  private def arithSigs(op: String, a: Set[Decision], b: Set[Decision])
      : Set[Decision] = {
    if (a.contains(DUnknown) || b.contains(DUnknown)) return U
    val bothNum = a.exists(d => d == DLong || d == DDouble) &&
      b.exists(d => d == DLong || d == DDouble)
    if (!bothNum) return U // result would be all-null → sniff sees no sigs
    if (op == "/") return Set(DDouble)
    val canLong = a.contains(DLong) && b.contains(DLong)
    val canDouble = a.contains(DDouble) || b.contains(DDouble)
    (if (canLong) Set[Decision](DLong) else Set.empty[Decision]) ++
      (if (canDouble) Set[Decision](DDouble) else Set.empty[Decision])
  }

  private def numericOnly(s: Set[Decision]): Set[Decision] =
    s.filter(d => d == DLong || d == DDouble)

  private def callSigs(name: String, args: Seq[Expr],
      env: Map[String, Set[Decision]]): Set[Decision] = {
    def a0 = exprSigs(args.head, env)
    name match {
      case b if ExprCompiler.boolBuiltins(b) => Set(DBool)
      case "STR" | "CONCAT" | "ENCODE_FOR_URI" | "LANG" | "STRUUID" |
           "MD5" | "SHA1" | "SHA256" | "SHA384" | "SHA512" | "TZ" => Set(DStr)
      case "DATATYPE" | "IRI" | "URI" | "UUID" | "BNODE" => Set(DStr)
      case "STRLANG" => Set(DStr)
      case "STRLEN" | "YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" |
           "SECONDS" => Set(DLong)
      // these preserve the argument's datatype (mkLitKeepLang)
      case "UCASE" | "LCASE" | "SUBSTR" | "STRBEFORE" | "STRAFTER" |
           "REPLACE" => a0
      case "COALESCE" => args.map(exprSigs(_, env)).reduce(_ ++ _)
      case "IF" => exprSigs(args(1), env) ++ exprSigs(args(2), env)
      case "STRDT" => args(1) match {
        case ExTerm(Iri(v)) => Set(dtDecision(v))
        case _ => U
      }
      case "RAND" => Set(DDouble)
      case "NOW" => Set(DTs)
      case "ABS" | "CEIL" | "FLOOR" | "ROUND" =>
        if (a0.contains(DUnknown)) U else numericOnly(a0) match {
          case s if s.isEmpty => U; case s => s
        }
      case XSD.integer | XSD.int | XSD.long => Set(DLong)
      case XSD.double | XSD.float | XSD.decimal => Set(DDouble)
      case XSD.string => Set(DStr)
      case XSD.boolean => Set(DBool)
      case XSD.dateTime => Set(DTs)
      case _ => U
    }
  }

  /** Mirrors ExprCompiler.agg and the Compiler's star-aggregate fast path
    * (both produce the same datatypes by construction). */
  private def aggSigs(fn: String, distinct: Boolean, arg: Option[Expr],
      env: Map[String, Set[Decision]]): Set[Decision] = {
    lazy val a = arg.map(exprSigs(_, env)).getOrElse(U)
    fn match {
      case "COUNT" => Set(DLong)
      case "SUM" =>
        if (distinct) Set(DDouble)
        else if (a.contains(DUnknown)) U
        // all-integral groups sum to integer; any double in the group → double;
        // a group with no numeric values sums to integer 0
        else (if (a.contains(DLong) || a.exists(d => d != DLong && d != DDouble))
          Set[Decision](DLong) else Set.empty[Decision]) ++
          (if (a.contains(DDouble)) Set[Decision](DDouble) else Set.empty[Decision])
      case "AVG" => Set(DDouble)
      case "MIN" | "MAX" =>
        if (a.contains(DUnknown)) U
        else a.map {
          case DLong => DLong
          case DDouble => DDouble
          case _ => DStr // non-numeric terms min/max on the lexical form
        }
      case "SAMPLE" => a
      case "GROUP_CONCAT" => Set(DStr)
      case _ => U
    }
  }

  // -------------------------------------------------------------- queries

  /** Output-column signatures of a SELECT (the sub-select / top-level
    * shared shape). */
  private def selectSigs(q: SelectQuery,
      meta: Map[String, Set[PredObjType]]): Map[String, Set[Decision]] = {
    var env = patternSigs(q.where, meta)
    // group expressions with aliases are in scope for projection
    q.mods.groupBy.foreach {
      case GroupExpr(e, Some(alias)) => env = merge(env, Map(alias -> exprSigs(e, env)))
      case _ =>
    }
    val items: Seq[(String, Set[Decision])] = q.projection match {
      case SelectAll =>
        env.keySet.filterNot(v => v.startsWith("__") || v.startsWith("_:"))
          .toSeq.map(v => v -> env(v))
      case SelectVars(is) => is.map(i => i.name -> exprSigs(i.expr, env))
    }
    val base = items.toMap
    // trailing VALUES joins extra bindings onto projected vars
    q.values.map(td => merge(base, patternSigs(td, meta).view
      .filterKeys(base.contains).toMap)).getOrElse(base)
  }
}
