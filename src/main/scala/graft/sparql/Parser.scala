package graft.sparql

import scala.util.parsing.combinator.RegexParsers
import graft.rdf._
import Ast._

/** Recursive-descent SPARQL 1.1 parser (query + update).
  *
  * Built with scala-parser-combinators; covers the full surface the
  * reference corpus exercises (SURVEY.md §2B) plus the standard builtin
  * library. Prefixes known to the endpoint are passed in so bare QNames
  * resolve without text-level prefix injection (the reference instead
  * prepends PREFIX declarations to the query text —
  * gastrodon/__init__.py:317-346; resolving inside the parser is the
  * cleaner equivalent).
  *
  * Parse errors carry line/column so the endpoint can render the
  * reference's caret convention (gastrodon/__init__.py:584-588).
  */
class SparqlParseException(val msg: String, val line: Int, val column: Int,
    val longString: String) extends RuntimeException(msg)

class Parser(initialPrefixes: Map[String, String] = Map.empty,
    initialBase: Option[String] = None) extends RegexParsers {

  override val skipWhitespace = true
  /** whitespace + '#' line comments */
  override val whiteSpace = """(\s|#[^\n\r]*)+""".r

  protected var prefixes: Map[String, String] = initialPrefixes
  protected var base: Option[String] = initialBase
  protected def addPrefix(p: String, ns: String): Unit = prefixes += (p -> ns)
  protected def setBase(b: String): Unit = base = Some(b)
  def declaredPrefixes: Map[String, String] = prefixes
  protected def kwPub(s: String): Parser[String] = kw(s)
  private var bnodeCounter = 0
  /** Anonymous-blank variable: '!' cannot occur in a BLANK_NODE_LABEL,
    * so a minted name can never collide with a user label like `_:b1`
    * (which would silently co-bind the two). Render re-legalizes the
    * name when a pattern ships to a remote SERVICE. */
  private def freshBnodeVar(): VarNode = {
    bnodeCounter += 1
    VarNode(s"_:!$bnodeCounter")
  }

  // ---------------------------------------------------------------- tokens

  protected def kw(s: String): Parser[String] =
    ("""(?i)\b""" + s + """\b""").r ^^ (_.toUpperCase)

  // IRIREF chars plus UCHAR (\uXXXX / \UXXXXXXXX) — the only escapes
  // an IRI admits (Turtle §6.4; SPARQL reaches the same through the
  // §19.2 codepoint-escape pass). Malformed escapes fail the token.
  private val IRIREF =
    """<(?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>""".r
  // PN_LOCAL per the shared SPARQL/Turtle grammar: leading digits, ':'
  // inside, PLX (%-encoded pairs kept verbatim, PN_LOCAL_ESC
  // backslash-escapes), and no unescaped trailing '.' — so `ex:foo.`
  // ends the statement instead of swallowing the dot.
  private val PnPlx = """%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%]"""
  private val PNAME = (
    """([A-Za-z](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?)?:""" +
    s"""((?:[A-Za-z0-9_:]|$PnPlx)""" +
    s"""(?:(?:[A-Za-z0-9_.:\\-]|$PnPlx)*(?:[A-Za-z0-9_:\\-]|$PnPlx))?)?""").r
  private val VAR = """[?$][A-Za-z0-9_]+""".r
  // BLANK_NODE_LABEL: PN_CHARS_U (incl. '_') or digit first, dots only
  // INSIDE — `_:b.` is label `b` + statement dot, like PN_LOCAL above
  private val BNODE_LABEL =
    """_:[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?""".r
  // SPARQL/Turtle 1.2 LANGTAG: optional `--ltr`/`--rtl` base direction
  // suffix ("x"@en--ltr → rdf:dirLangString). A single '-' still starts
  // a BCP47 subtag, so the `--` extension is unambiguous.
  private val LANGTAG = """@[a-zA-Z]+(-[a-zA-Z0-9]+)*(--(?:ltr|rtl))?""".r
  private val INTEGER = """[+-]?[0-9]+""".r
  private val DECIMAL = """[+-]?[0-9]*\.[0-9]+""".r
  private val DOUBLE = """[+-]?([0-9]+\.[0-9]*[eE][+-]?[0-9]+|\.?[0-9]+[eE][+-]?[0-9]+)""".r
  private val STRING_D = ("\"" + """([^"\\\n\r]|\\.)*""" + "\"").r
  private val STRING_S = ("'" + """([^'\\\n\r]|\\.)*""" + "'").r
  private val STRING_LONG_D = "(?s)\"\"\".*?\"\"\"".r
  private val STRING_LONG_S = "(?s)'''.*?'''".r

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'b' => sb += '\b'; case 'f' => sb += '\f'
          case '"' => sb += '"'; case '\'' => sb += '\''; case '\\' => sb += '\\'
          case 'u' =>
            if (i + 6 > s.length) throw new graft.GraftException(
              "truncated \\u escape (needs 4 hex digits)")
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 4
          case 'U' =>
            if (i + 10 > s.length) throw new graft.GraftException(
              "truncated \\U escape (needs 8 hex digits)")
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 8
          case other =>
            // ECHAR is closed (tbnrf"'\) — '\q' is a grammar error,
            // not a literal 'q' (SPARQL §19.8 / Turtle §6.4)
            throw new graft.GraftException(
              s"invalid string escape sequence \\$other")
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  def iriRef: Parser[String] = IRIREF ^^ { raw =>
    var inner = raw.substring(1, raw.length - 1)
    if (inner.indexOf('\\') >= 0) inner = unescape(inner) // UCHAR only
    resolveIri(inner)
  }

  // RFC 3986 resolution shared with the other grammars (rdf.IriRef —
  // incl. the §5.3 same-document cases java.net.URI gets wrong).
  private def resolveIri(inner: String): String = base match {
    case Some(b) => graft.rdf.IriRef.resolve(b, inner)
    case None => inner
  }

  def pname: Parser[String] = PNAME ^^ { raw =>
    val idx = raw.indexOf(':')
    val (pfx, local0) = (raw.substring(0, idx), raw.substring(idx + 1))
    // PN_LOCAL_ESC: drop the backslash ('ex:foo\,bar' names ".../foo,bar");
    // percent-encoded pairs stay verbatim in the IRI
    val local = local0.replaceAll("""\\([_~.\-!$&'()*+,;=/?#@%])""", "$1")
    prefixes.get(pfx) match {
      case Some(ns) => ns + local
      case None => throw new SparqlParseException(
        s"Unknown prefix '$pfx:'", 0, 0, s"Unknown prefix '$pfx:' in '$raw'")
    }
  }

  def iri: Parser[String] = iriRef | pname

  def varName: Parser[String] = VAR ^^ (_.substring(1))

  def rdfLiteral: Parser[Lit] = {
    val str: Parser[String] =
      STRING_LONG_D ^^ (s => unescape(s.substring(3, s.length - 3))) |
      STRING_LONG_S ^^ (s => unescape(s.substring(3, s.length - 3))) |
      STRING_D ^^ (s => unescape(s.substring(1, s.length - 1))) |
      STRING_S ^^ (s => unescape(s.substring(1, s.length - 1)))
    str ~ opt(LANGTAG ^^ (_.substring(1)) ^^ Left.apply | "^^" ~> iri ^^ Right.apply) ^^ {
      case lex ~ None => Lit.plain(lex)
      case lex ~ Some(Left(lang)) => Lit.tagged(lex, lang)
      case lex ~ Some(Right(dt)) => Lit.typed(lex, dt)
    }
  }

  def numericLiteral: Parser[Lit] =
    DOUBLE ^^ (s => Lit.typed(s, XSD.double)) |
    DECIMAL ^^ (s => Lit.typed(s, XSD.decimal)) |
    INTEGER ^^ (s => Lit.typed(s, XSD.integer))

  def booleanLiteral: Parser[Lit] =
    kw("true") ^^ (_ => Lit.typed("true", XSD.boolean)) |
    kw("false") ^^ (_ => Lit.typed("false", XSD.boolean))

  def literal: Parser[Lit] = rdfLiteral | numericLiteral | booleanLiteral

  // ------------------------------------------------------------- prologue

  def prologue: Parser[Prologue] =
    rep(prefixDecl | baseDecl) ^^ { _ => Prologue(base, prefixes) }

  // both go through iriRef so UCHAR escapes decode and a RELATIVE
  // IRI resolves against the current in-scope base (RFC 3986 §5.1.1
  // chaining — a later `BASE <sub/>` extends the earlier one), same
  // as the Turtle @prefix/@base directives
  private def prefixDecl: Parser[Unit] =
    kw("PREFIX") ~> ("""([A-Za-z](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?)?:""".r) ~ iriRef ^^ {
      case pc ~ i => prefixes += (pc.dropRight(1) -> i)
    }
  private def baseDecl: Parser[Unit] =
    kw("BASE") ~> iriRef ^^ { i => base = Some(i) }

  // --------------------------------------------------------------- nodes

  def graphNode: Parser[(Node, Seq[TriplePattern])] =
    quotedTriple ^^ (q => (q, Nil)) |
    varName ^^ (v => (VarNode(v), Nil)) |
    iri ^^ (i => (TermNode(Iri(i)): Node, Nil)) |
    literal ^^ (l => (TermNode(l): Node, Nil)) |
    BNODE_LABEL ^^ (b => (VarNode("_:" + b.substring(2)): Node, Nil)) |
    "[" ~ "]" ^^ (_ => (freshBnodeVar(): Node, Nil)) |
    blankNodePropertyList |
    collection

  /** RDF-star quoted triple `<< s p o >>` (Turtle-star data term /
    * SPARQL-star pattern). Components: var/iri/literal/labeled-bnode/
    * nested quoted triple for s and o, var/iri for p — the WG draft's
    * grammar, no anonymous bnodes or property lists inside quoting.
    * Fully concrete → a TermNode(QuotedTriple) data term; any variable
    * → a QuotedNode pattern. */
  def quotedTriple: Parser[Node] = {
    // defs, not vals: the recursive `comp → quotedTriple` reference must
    // construct lazily at PARSE time (one level per actual nesting), or
    // building the parser itself recurses forever
    // a literal is only valid in OBJECT position (qtSubject vs qtObject
    // — both the WG-draft SPARQL grammar and Turtle-star restrict the
    // quoted subject to var/iri/bnode/nested-quote)
    def subj: Parser[Node] =
      quotedTriple |
      varName ^^ (VarNode(_): Node) |
      iri ^^ (i => TermNode(Iri(i)): Node) |
      BNODE_LABEL ^^ (b => VarNode("_:" + b.substring(2)): Node)
    def comp: Parser[Node] =
      subj | literal ^^ (l => TermNode(l): Node)
    def pred: Parser[Node] =
      varName ^^ (VarNode(_): Node) |
      "a\\b".r ^^ (_ => TermNode(Iri(RDF.typ)): Node) |
      iri ^^ (i => TermNode(Iri(i)): Node)
    "<<" ~> subj ~ pred ~ comp <~ ">>" ^^ { case s ~ p ~ o =>
      (s, p, o) match {
        case (TermNode(st), TermNode(pt: Iri), TermNode(ot)) =>
          TermNode(QuotedTriple(st, pt, ot))
        case _ => QuotedNode(s, p, o)
      }
    }
  }

  def blankNodePropertyList: Parser[(Node, Seq[TriplePattern])] =
    "[" ~> propertyList <~ "]" ^^ { pl =>
      val node = freshBnodeVar()
      (node, expandPl(node, pl))
    }

  def collection: Parser[(Node, Seq[TriplePattern])] =
    "(" ~ ")" ^^ (_ => (TermNode(Iri(RDF.nil)): Node, Nil)) |
    "(" ~> rep1(graphNode) <~ ")" ^^ { items =>
      val nodes = items.map(_._1)
      val extras = items.flatMap(_._2)
      val cells = nodes.map(_ => freshBnodeVar())
      val links = cells.zip(nodes).zipWithIndex.flatMap { case ((cell, item), i) =>
        val restNode: Node =
          if (i == cells.length - 1) TermNode(Iri(RDF.nil)) else cells(i + 1)
        Seq(TriplePattern(cell, VerbNode(TermNode(Iri(RDF.first))), item),
          TriplePattern(cell, VerbNode(TermNode(Iri(RDF.rest))), restNode))
      }
      (cells.head, extras ++ links)
    }

  // --------------------------------------------------------------- paths

  def path: Parser[Path] = pathSequence ~ rep("|" ~> pathSequence) ^^ {
    case p ~ rest => rest.foldLeft(p)(PAlt.apply)
  }
  def pathSequence: Parser[Path] = pathEltOrInverse ~ rep("/" ~> pathEltOrInverse) ^^ {
    case p ~ rest => rest.foldLeft(p)(PSeq.apply)
  }
  def pathEltOrInverse: Parser[Path] =
    "^" ~> pathElt ^^ PInv.apply | pathElt
  // NB: a bare `?` modifier must not swallow a following variable's sigil
  // (`:p ?x` vs `:p? :x`) — negative lookahead on var-name chars.
  def pathElt: Parser[Path] =
    pathPrimary ~ opt("*" | "+" | """\?(?![A-Za-z0-9_])""".r) ^^ {
      case p ~ Some("*") => PZeroOrMore(p)
      case p ~ Some("+") => POneOrMore(p)
      case p ~ Some(_) => PZeroOrOne(p)
      case p ~ None => p
    }
  def pathPrimary: Parser[Path] =
    "a\\b".r ^^ (_ => PLink(RDF.typ)) |
    iri ^^ PLink.apply |
    "!" ~> pathNegatedSet |
    "(" ~> path <~ ")"
  def pathNegatedSet: Parser[Path] = {
    val one: Parser[Either[String, String]] =
      "^" ~> (("a\\b".r ^^ (_ => RDF.typ)) | iri) ^^ Right.apply |
      (("a\\b".r ^^ (_ => RDF.typ)) | iri) ^^ Left.apply
    (one ^^ (Seq(_)) | "(" ~> repsep(one, "|") <~ ")") ^^ { items =>
      PNeg(items.collect { case Left(i) => i },
        items.collect { case Right(i) => i })
    }
  }

  // ------------------------------------------------------------- triples

  /** verb: 'a', var, iri, or full property path. Plain iri/'a' parse as a
    * path link so the compiler sees a uniform Verb. */
  def verb: Parser[Verb] =
    varName ^^ (v => VerbNode(VarNode(v))) |
    path ^^ {
      case PLink(i) => VerbNode(TermNode(Iri(i)))
      case p => VerbPath(p)
    }

  /** An object position: the node, any triples its syntax generated
    * (bnode property lists, collections), and an optional SPARQL/Turtle
    * 1.2 annotation block `{| … |}` on the (subject, verb, object)
    * triple — annotations nest, hence the recursive shape. */
  final case class ObjA(node: Node, extra: Seq[TriplePattern],
      ann: Seq[(Verb, Seq[ObjA])])

  def annotatedObject: Parser[ObjA] =
    graphNode ~ opt("{|" ~> propertyList <~ "|}") ^^ {
      case (n, extra) ~ ann => ObjA(n, extra, ann.getOrElse(Nil))
    }

  def objectList: Parser[Seq[ObjA]] = rep1sep(annotatedObject, ",")

  // PropertyListNotEmpty ::= Verb ObjectList (';' (Verb ObjectList)?)* —
  // runs of ';' collapse and a trailing run is legal (shared by the
  // SPARQL and Turtle grammars)
  def propertyList: Parser[Seq[(Verb, Seq[ObjA])]] =
    rep1sep(verb ~ objectList ^^ { case v ~ os => (v, os) },
      rep1(";")) <~ rep(";")

  /** The quoted-triple form of an annotated triple: fully concrete →
    * a data term (same normalization as the `<< … >>` production),
    * anything else a quoted pattern. Property-path verbs cannot be
    * annotated (no single triple to quote). */
  private def quoteOf(s: Node, v: Verb, o: Node): Node = v match {
    case VerbNode(p) => (s, p, o) match {
      case (TermNode(st), TermNode(pt: Iri), TermNode(ot)) =>
        TermNode(QuotedTriple(st, pt, ot))
      case _ => QuotedNode(s, p, o)
    }
    case VerbPath(_) => throw new IllegalArgumentException(
      "annotation block {| … |} is not allowed on a property path")
  }

  /** TriplePattern(s, v, o) plus the object's own triples plus, for an
    * annotation block, the annotation triples about `<< s v o >>`
    * (the 1.2 sugar: assert the triple AND annotate its quoted form). */
  protected def expandObj(s: Node, v: Verb, oa: ObjA): Seq[TriplePattern] = {
    val base = TriplePattern(s, v, oa.node) +: oa.extra
    if (oa.ann.isEmpty) base
    else {
      val q = quoteOf(s, v, oa.node)
      base ++ expandPl(q, oa.ann)
    }
  }

  protected def expandPl(s: Node, pl: Seq[(Verb, Seq[ObjA])])
      : Seq[TriplePattern] =
    pl.flatMap { case (v, objs) => objs.flatMap(expandObj(s, v, _)) }

  def triplesSameSubject: Parser[Seq[TriplePattern]] = {
    // bnode property lists / collections may stand alone; a plain subject
    // REQUIRES a property list (otherwise garbage silently parses as empty)
    (blankNodePropertyList | collection) ~ opt(propertyList) ^^ {
      case (s, extra) ~ plOpt => extra ++ expandPl(s, plOpt.getOrElse(Nil))
    } |
    graphNode ~ propertyList ^^ { case (s, extra) ~ pl => extra ++ expandPl(s, pl) }
  }

  def triplesBlock: Parser[Seq[TriplePattern]] =
    rep1sep(triplesSameSubject, rep1(".")) <~ opt(".") ^^ (_.flatten)

  // --------------------------------------------------------- expressions

  def expression: Parser[Expr] = conditionalOr

  def conditionalOr: Parser[Expr] =
    conditionalAnd ~ rep("||" ~> conditionalAnd) ^^ {
      case e ~ rest => rest.foldLeft(e)(ExOr.apply)
    }
  def conditionalAnd: Parser[Expr] =
    valueLogical ~ rep("&&" ~> valueLogical) ^^ {
      case e ~ rest => rest.foldLeft(e)(ExAnd.apply)
    }
  def valueLogical: Parser[Expr] = {
    val tail: Parser[Expr => Expr] =
      ("<=" | ">=" | "!=" | "=" | "<" | ">") ~ numericExpr ^^ {
        case op ~ r => (e: Expr) => ExCmp(op, e, r)
      } |
      kw("NOT") ~> kw("IN") ~> exprList ^^ (list => (e: Expr) => ExIn(e, list, negated = true)) |
      kw("IN") ~> exprList ^^ (list => (e: Expr) => ExIn(e, list, negated = false))
    numericExpr ~ opt(tail) ^^ { case e ~ t => t.map(_(e)).getOrElse(e) }
  }
  private def exprList: Parser[Seq[Expr]] =
    "(" ~> repsep(expression, ",") <~ ")"

  def numericExpr: Parser[Expr] =
    multiplicative ~ rep(("+" | "-") ~ multiplicative) ^^ {
      case e ~ rest => rest.foldLeft(e) { case (acc, op ~ r) => ExArith(op, acc, r) }
    }
  def multiplicative: Parser[Expr] =
    unary ~ rep(("*" | "/") ~ unary) ^^ {
      case e ~ rest => rest.foldLeft(e) { case (acc, op ~ r) => ExArith(op, acc, r) }
    }
  def unary: Parser[Expr] =
    "!" ~> unary ^^ ExNot.apply |
    "+" ~> unary |
    "-" ~> unary ^^ ExNegNum.apply |
    primary

  def primary: Parser[Expr] =
    bracketted | builtInCall | aggregate | existsExpr | iriOrFunction |
    literal ^^ ExTerm.apply |
    varName ^^ ExVar.apply

  def bracketted: Parser[Expr] = "(" ~> expression <~ ")"

  private val zeroArg = Set("RAND", "NOW", "UUID", "STRUUID", "BNODE")
  private val builtinNames = Seq(
    // longer names BEFORE their prefixes (STRLANGDIR before STRLANG,
    // LANGMATCHES/LANGDIR before LANG, HASLANGDIR before HASLANG) —
    // the keyword alternation tries in order
    "STRLEN", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER", "STRLANGDIR",
    "STRLANG",
    "STRDT", "STR", "LANGMATCHES", "LANGDIR", "LANG", "HASLANGDIR",
    "HASLANG", "DATATYPE", "BOUND", "IRI", "URI",
    "BNODE", "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "UCASE",
    "LCASE", "ENCODE_FOR_URI", "CONTAINS", "YEAR", "MONTH", "DAY", "HOURS",
    "MINUTES", "SECONDS", "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5",
    "SHA1", "SHA256", "SHA384", "SHA512", "COALESCE", "IF", "SAMETERM",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "REGEX", "SUBSTR",
    "REPLACE",
    // SPARQL 1.2 RDF-star builtins (WG draft §"Functions on quoted triples")
    "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "ISTRIPLE")

  def builtInCall: Parser[Expr] = {
    val name: Parser[String] = builtinNames.map(kw).reduce(_ | _)
    name ~ opt("(" ~> repsep(expression, ",") <~ ")") ^? ({
      case n ~ Some(args) => ExCall(n, args)
      case n ~ None if zeroArg(n) => ExCall(n, Nil)
    }, { case n ~ _ => s"builtin $n requires arguments" })
  }

  def aggregate: Parser[Expr] = {
    val distinctP = opt(kw("DISTINCT")) ^^ (_.isDefined)
    kw("COUNT") ~> "(" ~> distinctP ~ ("*" ^^ (_ => None) | expression ^^ (Some(_))) <~ ")" ^^ {
      case d ~ arg => ExAgg("COUNT", d, arg, None)
    } |
    (kw("SUM") | kw("MIN") | kw("MAX") | kw("AVG") | kw("SAMPLE")) ~
      ("(" ~> distinctP ~ expression <~ ")") ^^ {
      case fn ~ (d ~ e) => ExAgg(fn, d, Some(e), None)
    } |
    kw("GROUP_CONCAT") ~> "(" ~> distinctP ~ expression ~
      opt(";" ~> kw("SEPARATOR") ~> "=" ~> rdfLiteral) <~ ")" ^^ {
      case d ~ e ~ sep => ExAgg("GROUP_CONCAT", d, Some(e), sep.map(_.lex))
    }
  }

  def existsExpr: Parser[Expr] =
    kw("NOT") ~> kw("EXISTS") ~> groupGraphPattern ^^ (p => ExExists(p, negated = true)) |
    kw("EXISTS") ~> groupGraphPattern ^^ (p => ExExists(p, negated = false))

  /** iri optionally applied to args → cast / custom function. */
  def iriOrFunction: Parser[Expr] =
    iri ~ opt("(" ~> repsep(expression, ",") <~ ")") ^^ {
      case i ~ Some(args) => ExCall(i, args)
      case i ~ None => ExTerm(Iri(i))
    }

  // ------------------------------------------------------ graph patterns

  def groupGraphPattern: Parser[GraphPattern] =
    "{" ~> (subSelect | groupGraphPatternSub) <~ "}"

  def subSelect: Parser[GraphPattern] =
    selectClause ~ whereClause ~ solutionModifier ~ opt(valuesClause) ^^ {
      case (d, r, proj) ~ where ~ mods ~ values =>
        SubSelect(SelectQuery(d, r, proj, where, mods, values))
    }

  private sealed trait GgpElem
  private case class ETriples(ts: Seq[TriplePattern]) extends GgpElem
  private case class EFilter(e: Expr) extends GgpElem
  /** OPTIONAL group + its OWN top-level filters (hoisted to the
    * LeftJoin condition per §18.2.2.5). Filters inside a NESTED group
    * of the optional pattern are NOT top-level: they evaluate under
    * the inner group's scope and never see the left side's bindings —
    * matching on the folded Filter(...) root could not tell the two
    * apart (a singleton nested group folds to the same shape). */
  private case class EOptional(p: GraphPattern, topFilters: Seq[Expr])
      extends GgpElem
  private case class EMinus(p: GraphPattern) extends GgpElem
  private case class EUnionGroup(p: GraphPattern) extends GgpElem
  private case class EBind(v: String, e: Expr) extends GgpElem
  private case class EValues(t: TableData) extends GgpElem
  private case class ESub(p: GraphPattern) extends GgpElem

  def groupGraphPatternSub: Parser[GraphPattern] = rep(ggpElem <~ opt(".")) ^^ fold

  private def ggpElem: Parser[GgpElem] =
    kw("OPTIONAL") ~> "{" ~> (
      subSelect ^^ (p => EOptional(p, Nil)) |
      rep(ggpElem <~ opt(".")) ^^ { elems =>
        val (g, fs) = foldParts(elems); EOptional(g, fs)
      }) <~ "}" |
    kw("MINUS") ~> groupGraphPattern ^^ EMinus.apply |
    kw("FILTER") ~> constraint ^^ EFilter.apply |
    kw("BIND") ~> "(" ~> expression ~ (kw("AS") ~> varName) <~ ")" ^^ {
      case e ~ v => EBind(v, e)
    } |
    kw("VALUES") ~> inlineData ^^ EValues.apply |
    kw("GRAPH") ~> (varName ^^ (VarNode(_): Node) |
        iri ^^ (i => TermNode(Iri(i)): Node)) ~ groupGraphPattern ^^ {
      case g ~ p => ESub(GraphPat(g, p))
    } |
    kw("SERVICE") ~> opt(kw("SILENT")) ~ (varName ^^ (VarNode(_): Node) |
        iri ^^ (i => TermNode(Iri(i)): Node)) ~ groupGraphPattern ^^ {
      case silent ~ ep ~ p => ESub(Service(ep, p, silent.isDefined))
    } |
    groupOrUnion |
    triplesBlock ^^ ETriples.apply

  private def groupOrUnion: Parser[GgpElem] =
    groupGraphPattern ~ rep(kw("UNION") ~> groupGraphPattern) ^^ {
      case p ~ Nil => ESub(p)
      case p ~ rest => EUnionGroup(rest.foldLeft(p)(Union.apply))
    }

  def constraint: Parser[Expr] = bracketted | builtInCall | existsExpr | iriOrFunction

  private def fold(elems: Seq[GgpElem]): GraphPattern = {
    val (g, filters) = foldParts(elems)
    if (filters.nonEmpty) Filter(g, filters) else g
  }

  /** Group fold, top-level filters returned separately (the OPTIONAL
    * rule needs them BEFORE they wrap the group). */
  private def foldParts(elems: Seq[GgpElem]): (GraphPattern, Seq[Expr]) = {
    var g: GraphPattern = Unit0
    var filters = Vector.empty[Expr]
    def join(r: GraphPattern): Unit = g = if (g == Unit0) r else Join(g, r)
    elems.foreach {
      case ETriples(ts) => join(Bgp(ts))
      case EOptional(p, fs) => g = LeftJoin(g, p, fs)
      case EMinus(p) => g = Minus(g, p)
      case EUnionGroup(p) => join(p)
      case EBind(v, e) => g = Extend(g, v, e)
      case EValues(t) => join(t)
      case ESub(p) => join(p)
      case EFilter(e) => filters :+= e
    }
    (g, filters)
  }

  def inlineData: Parser[TableData] = {
    val dataValue: Parser[Option[RdfTerm]] =
      kw("UNDEF") ^^ (_ => None) |
      iri ^^ (i => Some(Iri(i))) |
      literal ^^ (l => Some(l: RdfTerm))
    varName ~ ("{" ~> rep(dataValue) <~ "}") ^^ {
      case v ~ vals => TableData(Seq(v), vals.map(Seq(_)))
    } |
    ("(" ~> rep(varName) <~ ")") ~
      ("{" ~> rep("(" ~> rep(dataValue) <~ ")") <~ "}") >> {
      // §10.2.2: every data block row carries exactly one value per
      // variable — a ragged row is a grammar-level error
      case vars ~ rows => rows.find(_.length != vars.length) match {
        case Some(bad) => err(s"VALUES row (${bad.length} values) does " +
          s"not match the variable list (${vars.length} variables)")
        case None => success(TableData(vars, rows))
      }
    }
  }

  // ------------------------------------------------------------- queries

  /** (distinct, reduced, projection) */
  def selectClause: Parser[(Boolean, Boolean, Projection)] =
    kw("SELECT") ~> opt(kw("DISTINCT") | kw("REDUCED")) ~ projection ^^ {
      case mod ~ proj =>
        (mod.contains("DISTINCT"), mod.contains("REDUCED"), proj)
    }

  def projection: Parser[Projection] =
    "*" ^^ (_ => SelectAll) |
    rep1(
      "(" ~> expression ~ (kw("AS") ~> varName) <~ ")" ^^ {
        case e ~ v => ProjItem(e, Some(v))
      } |
      varName ^^ (v => ProjItem(ExVar(v), None))
    ) ^^ SelectVars.apply

  def whereClause: Parser[GraphPattern] =
    opt(kw("WHERE")) ~> groupGraphPattern

  /** FROM [NAMED] <iri> → (isNamed, iri). */
  def datasetClause: Parser[(Boolean, String)] =
    kw("FROM") ~> opt(kw("NAMED")) ~ iri ^^ {
      case named ~ i => (named.isDefined, i)
    }

  def solutionModifier: Parser[Modifiers] =
    opt(groupClause) ~ opt(havingClause) ~ opt(orderClause) ~ limitOffset ^^ {
      case g ~ h ~ o ~ ((lim, off)) =>
        Modifiers(g.getOrElse(Nil), h.getOrElse(Nil), o.getOrElse(Nil), lim, off)
    }

  def groupClause: Parser[Seq[GroupCond]] =
    kw("GROUP") ~> kw("BY") ~> rep1(
      "(" ~> expression ~ opt(kw("AS") ~> varName) <~ ")" ^^ {
        case e ~ a => GroupExpr(e, a)
      } |
      varName ^^ GroupVar.apply |
      (builtInCall | iriOrFunction) ^^ (e => GroupExpr(e, None))
    )

  def havingClause: Parser[Seq[Expr]] = kw("HAVING") ~> rep1(constraint)

  def orderClause: Parser[Seq[(Expr, Boolean)]] =
    kw("ORDER") ~> kw("BY") ~> rep1(
      kw("ASC") ~> bracketted ^^ ((_, true)) |
      kw("DESC") ~> bracketted ^^ ((_, false)) |
      constraint ^^ ((_, true)) |
      varName ^^ (v => (ExVar(v): Expr, true))
    )

  def limitOffset: Parser[(Option[Long], Option[Long])] =
    opt(kw("LIMIT") ~> INTEGER ^^ (_.toLong)) ~
      opt(kw("OFFSET") ~> INTEGER ^^ (_.toLong)) ~
      opt(kw("LIMIT") ~> INTEGER ^^ (_.toLong)) ^^ {
      case l1 ~ off ~ l2 => (l1.orElse(l2), off)
    }

  def valuesClause: Parser[TableData] = kw("VALUES") ~> inlineData

  def selectQuery: Parser[SelectQuery] =
    selectClause ~ rep(datasetClause) ~ whereClause ~ solutionModifier ~
      opt(valuesClause) ^^ {
      case (d, r, proj) ~ ds ~ where ~ mods ~ values =>
        SelectQuery(d, r, proj, where, mods, values, DatasetClause.of(ds))
    }

  def constructQuery: Parser[ConstructQuery] =
    kw("CONSTRUCT") ~> ("{" ~> opt(triplesBlock) <~ "}") ~ rep(datasetClause) ~
      whereClause ~ solutionModifier ^^ {
      case tmpl ~ ds ~ where ~ mods =>
        ConstructQuery(tmpl.getOrElse(Nil), where, mods, DatasetClause.of(ds))
    } |
    // CONSTRUCT WHERE { pattern } shorthand
    kw("CONSTRUCT") ~> kw("WHERE") ~> ("{" ~> opt(triplesBlock) <~ "}") ~
      solutionModifier ^^ {
      case tmpl ~ mods => ConstructQuery(tmpl.getOrElse(Nil),
        Bgp(tmpl.getOrElse(Nil)), mods)
    }

  def askQuery: Parser[AskQuery] =
    kw("ASK") ~> rep(datasetClause) ~ groupGraphPattern ^^ {
      case ds ~ p => AskQuery(p, DatasetClause.of(ds))
    }

  def describeQuery: Parser[DescribeQuery] =
    kw("DESCRIBE") ~> rep1(
      varName ^^ (VarNode(_): Node) | iri ^^ (i => TermNode(Iri(i)): Node)) ~
      (rep(datasetClause) ~> opt(whereClause)) ^^ {
      case ts ~ w => DescribeQuery(ts, w)
    }

  def query: Parser[ParsedQuery] =
    prologue ~ (selectQuery | constructQuery | askQuery | describeQuery) ^^ {
      case p ~ q => ParsedQuery(p, q)
    }

  // ------------------------------------------------------------- updates

  def update: Parser[ParsedUpdate] =
    prologue ~ repsep(update1, ";") <~ opt(";") ^^ {
      case p ~ ops => ParsedUpdate(p, ops)
    }

  /** Quads production (Update §19.8 `Quads`): a QuadPattern/QuadData
    * block mixes default-graph triples with `GRAPH VarOrIri { … }`
    * sub-blocks. */
  private def varOrIriNode: Parser[Node] =
    varName ^^ (VarNode(_): Node) | iri ^^ (i => TermNode(Iri(i)): Node)

  private def quadsNotTriples: Parser[Seq[Quad]] =
    kw("GRAPH") ~> varOrIriNode ~ ("{" ~> opt(triplesBlock) <~ "}") ^^ {
      case g ~ ts => ts.getOrElse(Nil).map(Quad(_, Some(g)))
    }

  def quadBlock: Parser[Seq[Quad]] =
    "{" ~> opt(triplesBlock) ~
      rep(quadsNotTriples ~ (opt(".") ~> opt(triplesBlock))) <~ "}" ^^ {
      case first ~ rest =>
        first.getOrElse(Nil).map(Quad(_, None)) ++ rest.flatMap {
          case g ~ after => g ++ after.getOrElse(Nil).map(Quad(_, None))
        }
    }

  private def graphRefAll: Parser[GraphRef] =
    kw("GRAPH") ~> iri ^^ OneGraphRef.apply |
    kw("DEFAULT") ^^ (_ => DefaultRef) |
    kw("NAMED") ^^ (_ => NamedRef) |
    kw("ALL") ^^ (_ => AllRef)

  /** GraphOrDefault (§19.8): `DEFAULT` or `[GRAPH] iri`. */
  private def graphOrDefault: Parser[Option[String]] =
    kw("DEFAULT") ^^ (_ => None) | opt(kw("GRAPH")) ~> iri ^^ (Some(_))

  def update1: Parser[UpdateOp] =
    kw("INSERT") ~> kw("DATA") ~> quadBlock ^^ InsertData.apply |
    kw("DELETE") ~> kw("DATA") ~> quadBlock ^^ DeleteData.apply |
    kw("DELETE") ~> kw("WHERE") ~> quadBlock ^^ DeleteWhere.apply |
    kw("CLEAR") ~> opt(kw("SILENT")) ~ graphRefAll ^^ {
      case s ~ t => Clear(t, s.isDefined)
    } |
    kw("DROP") ~> opt(kw("SILENT")) ~ graphRefAll ^^ {
      case s ~ t => Drop(t, s.isDefined)
    } |
    kw("CREATE") ~> opt(kw("SILENT")) ~ (kw("GRAPH") ~> iri) ^^ {
      case s ~ g => Create(g, s.isDefined)
    } |
    kw("ADD") ~> opt(kw("SILENT")) ~ graphOrDefault ~ (kw("TO") ~> graphOrDefault) ^^ {
      case s ~ f ~ t => AddGraph(f, t, s.isDefined)
    } |
    kw("MOVE") ~> opt(kw("SILENT")) ~ graphOrDefault ~ (kw("TO") ~> graphOrDefault) ^^ {
      case s ~ f ~ t => MoveGraph(f, t, s.isDefined)
    } |
    kw("COPY") ~> opt(kw("SILENT")) ~ graphOrDefault ~ (kw("TO") ~> graphOrDefault) ^^ {
      case s ~ f ~ t => CopyGraph(f, t, s.isDefined)
    } |
    kw("LOAD") ~> opt(kw("SILENT")) ~ iri ~
      opt(kw("INTO") ~> kw("GRAPH") ~> iri) ^^ {
      case s ~ url ~ g => Load(url, g, s.isDefined)
    } |
    modify

  private def usingClause: Parser[(Boolean, String)] =
    kw("USING") ~> opt(kw("NAMED")) ~ iri ^^ { case n ~ i => (n.isDefined, i) }

  def modify: Parser[UpdateOp] = {
    val del = kw("DELETE") ~> quadBlock
    val ins = kw("INSERT") ~> quadBlock
    opt(kw("WITH") ~> iri) ~ del ~ opt(ins) ~ rep(usingClause) ~
      (kw("WHERE") ~> groupGraphPattern) ^^ {
      case g ~ d ~ i ~ u ~ w =>
        Modify(d, i.getOrElse(Nil), w, g, DatasetClause.of(u))
    } |
    opt(kw("WITH") ~> iri) ~ ins ~ rep(usingClause) ~
      (kw("WHERE") ~> groupGraphPattern) ^^ {
      case g ~ i ~ u ~ w => Modify(Nil, i, w, g, DatasetClause.of(u))
    }
  }

  // ------------------------------------------------------------ entrypoints

  private def run[T](p: Parser[T], text: String): T =
    parseAll(p, text) match {
      case Success(result, _) => result
      case Failure(msg, next) =>
        throw new SparqlParseException(msg, next.pos.line, next.pos.column,
          s"$msg at line ${next.pos.line} column ${next.pos.column}\n" +
            next.pos.longString)
      case Error(msg, next) =>
        throw new SparqlParseException(msg, next.pos.line, next.pos.column,
          s"$msg at line ${next.pos.line} column ${next.pos.column}\n" +
            next.pos.longString)
    }

  def parseQuery(text: String): ParsedQuery = run(query, text)
  def parseUpdate(text: String): ParsedUpdate = run(update, text)
}
