package graft

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types._
import graft.rdf._
import graft.rdf.Terms._

/** Engine-boundary conversion: bindings of term structs → a user-facing
  * DataFrame with native-typed columns and QName-shortened IRIs.
  *
  * Mirrors the reference's `_dataframe` + `to_python` +
  * `_normalize_column_type` (gastrodon/__init__.py:389-401, 262-293,
  * 374-387). Column typing is a per-column `Decision`, obtained one of two
  * ways:
  *
  *  - statically from the query AST + source schema metadata
  *    (sparql.TypeInfer) — zero data passes; the default for schema-typed
  *    sources and the only acceptable behavior at 100 TB;
  *  - by sniffing the datatype signatures actually present in ONE
  *    aggregate pass (`toDisplay`) — the fallback for untyped graphs
  *    (inline Turtle, post-UPDATE), costing one extra execution of the
  *    query. Both paths share `displayDecision`/`displayCol`, so they
  *    decide identically whenever the static path applies.
  */
object Display {

  /** How one bindings column is rendered for display. */
  sealed trait Decision
  case object DLong extends Decision
  case object DDouble extends Decision
  case object DBool extends Decision
  case object DTs extends Decision
  case object DDate extends Decision
  /** QName-shortened IRIs / blank labels / lexical forms as strings,
    * for a column PROVEN to carry no quoted-triple terms (the static
    * TypeInfer path over schema-typed sources, or a sniff whose exact
    * quoted-presence aggregate came back false). Omitting the dead
    * RDF-star rendering branch matters: [[Terms.quotedN3]] expands to a
    * multi-thousand-node Catalyst tree PER COLUMN (each packed field is
    * a replace∘replace∘element_at∘split chain repeated across six CASE
    * arms × three positions), and analysis/optimization of that dead
    * tree cost ~0.1-0.2 s per query at bench scale (r17 §1 measurement:
    * select vs selectRaw). Rows that somehow were quoted anyway would
    * display as the raw packed value instead of `<< … >>` — which is why
    * the decision is only made on proof, never as a default. */
  case object DStr extends Decision
  /** Same rendering as [[DStr]] plus the quoted-triple (RDF-star)
    * branch — for columns that may contain quoted terms. */
  case object DStrQ extends Decision
  /** Inference-only marker: signature not statically derivable — forces
    * the sniffing fallback (sparql.TypeInfer). Never reaches displayCol. */
  private[graft] case object DUnknown extends Decision

  private val SIG_CAP = 32

  /** QName shortening of one IRI string column (to_python / short_name,
    * gastrodon/__init__.py:262-315): longest declared namespace wins; the
    * local part must be QName-safe or the full IRI is kept. */
  def shortenExpr(v: Column, prefixes: Map[String, String]): Column = {
    val sorted = prefixes.toSeq.sortBy(-_._2.length)
    sorted.foldRight(v) { case ((pfx, ns), acc) =>
      val local = F.substring(v, ns.length + 1, Int.MaxValue)
      // PN_LOCAL forbids a FINAL '.' (Turtle §6.5) — shortening one
      // would emit a QName the tokenizer re-reads as name + statement
      // dot, breaking write→read round trips
      F.when(v.startsWith(ns) && local.rlike(
          "^[A-Za-z0-9_]([A-Za-z0-9_.\\-]*[A-Za-z0-9_\\-])?$"),
        F.concat(F.lit(pfx + ":"), local)).otherwise(acc)
    }
  }

  def shorten(uri: String, prefixes: Map[String, String]): String = {
    val hit = prefixes.toSeq.sortBy(-_._2.length).collectFirst {
      case (pfx, ns) if uri.startsWith(ns) && uri.substring(ns.length)
          .matches("^[A-Za-z0-9_]([A-Za-z0-9_.\\-]*[A-Za-z0-9_\\-])?$") =>
        pfx + ":" + uri.substring(ns.length)
    }
    hit.getOrElse(uri)
  }

  /** Decision from a column's sniffed `kind:dt` signature set.
    * `mayQuote` comes from the EXACT per-column quoted-presence
    * aggregate, never from `sigs` — the signature set is capped at
    * [[SIG_CAP]] distinct values, so absence of a "3:" entry there
    * would not be proof. */
  private def displayDecision(sigs: Seq[String], mayQuote: Boolean): Decision = {
    val dts = sigs.filter(_.startsWith("2:")).map(_.substring(2))
    val allLit = sigs.nonEmpty && sigs.forall(_.startsWith("2:"))
    if (allLit && dts.forall(XSD.integral)) DLong
    else if (allLit && dts.forall(XSD.numeric)) DDouble
    else if (allLit && dts.forall(_ == XSD.boolean)) DBool
    else if (allLit && dts.forall(_ == XSD.dateTime)) DTs
    else if (allLit && dts.forall(_ == XSD.date)) DDate
    else if (mayQuote) DStrQ
    else DStr
  }

  /** One term column → display column for a given decision. */
  private def displayCol(c: Column, d: Decision,
      prefixes: Map[String, String]): Column = d match {
    case DLong => value(c).cast(LongType)
    case DDouble => value(c).cast(DoubleType)
    case DBool => value(c) === "true"
    // NTZ: the TESTDATA timestamps are tz-naive; writing tz-adjusted
    // timestamps would break oracle comparison
    case DTs => value(c).cast(TimestampNTZType)
    case DDate => value(c).cast(DateType)
    case DStr => // strings / IRIs / mixed, PROVEN quoted-free (see DStr doc)
      F.when(isIri(c), shortenExpr(value(c), prefixes))
        .when(Terms.isBlank(c), F.concat(F.lit("_:"), value(c)))
        .otherwise(value(c))
    case _ => // DStrQ (and defensive DUnknown): full branch incl RDF-star
      F.when(isIri(c), shortenExpr(value(c), prefixes))
        .when(Terms.isBlank(c), F.concat(F.lit("_:"), value(c)))
        .when(Terms.isQuoted(c), Terms.quotedN3(c))
        .otherwise(value(c))
  }

  /** Statically-typed display projection: a pure column rewrite, no data
    * pass. Columns without a decision (never for TypeInfer-produced maps)
    * fall back to string display. */
  def toDisplayStatic(bindings: DataFrame, decisions: Map[String, Decision],
      prefixes: Map[String, String]): DataFrame = {
    val cols = bindings.columns.toSeq
    if (cols.isEmpty) return bindings
    bindings.select(cols.map { n =>
      // fallback for a column WITHOUT a decision stays quoted-capable:
      // absence of a decision is not proof of quoted-freeness
      displayCol(F.col(n), decisions.getOrElse(n, DStrQ), prefixes).as(n)
    }: _*)
  }

  /** Number of sniffing passes taken since JVM start — the coverage
    * metric for the static-inference work: every unit here is a query
    * that executed TWICE (once for the sniff, once for the caller).
    * Observability only; never read on a query path. */
  val sniffCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Sniffing display projection: ONE aggregate pass collects the distinct
    * (kind:dt) signatures per column, then types columnar-ly. The pass
    * executes the query once before the caller's own action — acceptable
    * for the untyped interactive graphs it serves; schema-typed sources
    * take the static path above. */
  def toDisplay(bindings: DataFrame, prefixes: Map[String, String]): DataFrame = {
    sniffCount.incrementAndGet()
    val cols = bindings.columns.toSeq
    if (cols.isEmpty) return bindings
    val sigAggs = cols.map { n =>
      val c = F.col(n)
      F.slice(F.collect_set(F.when(c.isNotNull,
        F.concat(kind(c).cast(StringType), F.lit(":"),
          F.coalesce(dt(c), F.lit(""))))), 1, SIG_CAP).as(n)
    }
    // exact quoted-presence per column, same single pass: the capped
    // signature set cannot prove absence (see displayDecision)
    val quoteAggs = cols.map { n =>
      F.coalesce(F.max(F.coalesce(Terms.isQuoted(F.col(n)), F.lit(false))),
        F.lit(false)).as(s"__q_$n") // outer coalesce: zero-row max is null
    }
    val sigRow = bindings.agg((sigAggs ++ quoteAggs).head,
      (sigAggs ++ quoteAggs).tail: _*).collect()(0)
    val out = cols.zipWithIndex.map { case (n, i) =>
      val sigs = sigRow.getSeq[String](i)
      val mayQuote = sigRow.getBoolean(cols.length + i)
      displayCol(F.col(n), displayDecision(sigs, mayQuote), prefixes).as(n)
    }
    bindings.select(out: _*)
  }

  /** One term → Scala value (to_python, gastrodon/__init__.py:262-293). */
  def termToScala(r: Row, prefixes: Map[String, String]): Any = {
    if (r == null) return null
    val kind = r.getByte(0); val v = r.getString(1); val dt = r.getString(2)
    kind match {
      case KIND_IRI => shorten(v, prefixes)
      case KIND_BLANK => "_:" + v
      case Terms.KIND_TRIPLE => Terms.unpackString(v).n3()
      case _ =>
        if (dt != null && XSD.integral(dt)) v.toLong
        else if (dt != null && XSD.numeric(dt)) v.toDouble
        else if (dt == XSD.boolean) v == "true"
        else v
    }
  }
}
