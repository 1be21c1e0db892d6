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
  * 374-387): the reference tries int then float per all-string column; we
  * inspect the datatype signature of each column in ONE aggregate pass and
  * cast columnar-ly. This pass is a display-boundary cost by design — the
  * 100 TB path is `selectRaw`, which skips it entirely.
  */
object Display {

  private val SIG_CAP = 32

  /** QName shortening of one IRI string column (to_python / short_name,
    * gastrodon/__init__.py:262-315): longest declared namespace wins; the
    * local part must be QName-safe or the full IRI is kept. */
  def shortenExpr(v: Column, prefixes: Map[String, String]): Column = {
    val sorted = prefixes.toSeq.sortBy(-_._2.length)
    sorted.foldRight(v) { case ((pfx, ns), acc) =>
      val local = F.substring(v, ns.length + 1, Int.MaxValue)
      F.when(v.startsWith(ns) && local.rlike("^[A-Za-z0-9_][A-Za-z0-9_.\\-]*$"),
        F.concat(F.lit(pfx + ":"), local)).otherwise(acc)
    }
  }

  def shorten(uri: String, prefixes: Map[String, String]): String = {
    val hit = prefixes.toSeq.sortBy(-_._2.length).collectFirst {
      case (pfx, ns) if uri.startsWith(ns) &&
          uri.substring(ns.length).matches("^[A-Za-z0-9_][A-Za-z0-9_.\\-]*$") =>
        pfx + ":" + uri.substring(ns.length)
    }
    hit.getOrElse(uri)
  }

  /** One term column → display column given the column's datatype
    * signature set. */
  private def displayCol(c: Column, sigs: Seq[String],
      prefixes: Map[String, String]): Column = {
    val dts = sigs.filter(_.startsWith("2:")).map(_.substring(2))
    val allLit = sigs.nonEmpty && sigs.forall(_.startsWith("2:"))
    if (allLit && dts.forall(XSD.integral)) value(c).cast(LongType)
    else if (allLit && dts.forall(XSD.numeric)) value(c).cast(DoubleType)
    else if (allLit && dts.forall(_ == XSD.boolean)) value(c) === "true"
    else if (allLit && dts.forall(_ == XSD.dateTime))
      // NTZ: the TESTDATA timestamps are tz-naive; writing tz-adjusted
      // timestamps would break oracle comparison
      value(c).cast(TimestampNTZType)
    else if (allLit && dts.forall(_ == XSD.date)) value(c).cast(DateType)
    else // strings / IRIs / mixed → display string
      F.when(isIri(c), shortenExpr(value(c), prefixes))
        .when(Terms.isBlank(c), F.concat(F.lit("_:"), value(c)))
        .otherwise(value(c))
  }

  def toDisplay(bindings: DataFrame, prefixes: Map[String, String]): DataFrame = {
    val cols = bindings.columns.toSeq
    if (cols.isEmpty) return bindings
    // one aggregate pass: per column the distinct (kind:dt) signatures
    val sigAggs = cols.map { n =>
      val c = F.col(n)
      F.slice(F.collect_set(F.when(c.isNotNull,
        F.concat(kind(c).cast(StringType), F.lit(":"),
          F.coalesce(dt(c), F.lit(""))))), 1, SIG_CAP).as(n)
    }
    val sigRow = bindings.agg(sigAggs.head, sigAggs.tail: _*).collect()(0)
    val out = cols.zipWithIndex.map { case (n, i) =>
      val sigs = sigRow.getSeq[String](i)
      displayCol(F.col(n), sigs, prefixes).as(n)
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
      case _ =>
        if (dt != null && XSD.integral(dt)) v.toLong
        else if (dt != null && XSD.numeric(dt)) v.toDouble
        else if (dt == XSD.boolean) v == "true"
        else v
    }
  }
}
