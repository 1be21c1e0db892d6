package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession, functions => F}
import graft.rdf._

/** Distributed N-Triples reader/writer.
  *
  * N-Triples is line-delimited → trivially parallel: `spark.read.text`
  * splits the file across partitions and each line parses independently
  * (the reference loads its 30,318-triple DBpedia fixture this way via
  * rdflib — notebooks/local/DBpedia_Schema_Queries.ipynb cell 4; gz is
  * handled transparently by Spark's codec). This is the 100 TB ingest path:
  * a pure narrow map, no shuffle, no driver involvement.
  */
object NTriples {

  /** Parse one N-Triples term starting at `pos`; returns (term, nextPos).
    * Hand-rolled for per-line speed (no regex backtracking). */
  private[sources] def parseTerm(s: String, pos0: Int): (Row, Int) = {
    var pos = pos0
    while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t')) pos += 1
    s.charAt(pos) match {
      case '<' if pos + 1 < s.length && s.charAt(pos + 1) == '<' =>
        // RDF 1.2 quoted triple `<< s p o >>` as a TERM (N-Triples-star)
        val (qs, p1) = parseTerm(s, pos + 2)
        val (qp, p2) = parseTerm(s, p1)
        val (qo, p3) = parseTerm(s, p2)
        var end = p3
        while (end < s.length && Character.isWhitespace(s.charAt(end))) end += 1
        require(end + 1 < s.length && s.charAt(end) == '>' &&
          s.charAt(end + 1) == '>', s"unterminated quoted triple: $s")
        def term(r: Row): RdfTerm = r.getByte(0) match {
          case Terms.KIND_IRI => Iri(r.getString(1))
          case Terms.KIND_BLANK => Blank(r.getString(1))
          case Terms.KIND_TRIPLE => Terms.unpackString(r.getString(1))
          case _ => Lit(r.getString(1), r.getString(2), r.getString(3))
        }
        val packed = Terms.packString(
          QuotedTriple(term(qs), term(qp), term(qo)))
        (Row(Terms.KIND_TRIPLE, packed, null, null), end + 2)
      case '<' =>
        val end = s.indexOf('>', pos)
        (Row(Terms.KIND_IRI, s.substring(pos + 1, end), null, null), end + 1)
      case '_' =>
        var end = pos + 2
        while (end < s.length && !Character.isWhitespace(s.charAt(end))) end += 1
        (Row(Terms.KIND_BLANK, s.substring(pos + 2, end), null, null), end)
      case '"' =>
        var i = pos + 1
        val sb = new StringBuilder
        while (s.charAt(i) != '"') {
          if (s.charAt(i) == '\\') {
            s.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
                i += 4
              case 'U' =>
                sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16)))
                i += 8
              case c => sb += c
            }
            i += 2
          } else { sb += s.charAt(i); i += 1 }
        }
        val lex = sb.toString
        var next = i + 1
        if (next < s.length && s.charAt(next) == '@') {
          var end = next + 1
          while (end < s.length && !Character.isWhitespace(s.charAt(end))) end += 1
          val tag = s.substring(next + 1, end)
          // N-Triples 1.2: `--ltr`/`--rtl` suffix → rdf:dirLangString
          val dt = if (tag.contains("--")) RDF.dirLangString else RDF.langString
          (Row(Terms.KIND_LIT, lex, dt, tag), end)
        } else if (next + 1 < s.length && s.charAt(next) == '^' && s.charAt(next + 1) == '^') {
          val dtEnd = s.indexOf('>', next + 3)
          (Row(Terms.KIND_LIT, lex, s.substring(next + 3, dtEnd), null), dtEnd + 1)
        } else (Row(Terms.KIND_LIT, lex, XSD.string, null), next)
    }
  }

  def parseLine(line: String): Option[Row] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) None
    else {
      val (s, p1) = parseTerm(t, 0)
      val (p, p2) = parseTerm(t, p1)
      val (o, _) = parseTerm(t, p2)
      Some(Row(s, p, o))
    }
  }

  /** [[parseLine]] with the documented failure contract: a malformed
    * line raises ONE exception type naming the line (strict — the
    * default, so corrupt data cannot silently vanish), or is dropped
    * when `lenient` (crawl-scale ingest where a bad line must not kill
    * a 1000-executor job). The hand-rolled [[parseTerm]] fails fast
    * with whatever low-level error the corruption hits first; this
    * wrapper is the boundary that turns that into policy. */
  def parseLineChecked(line: String, lenient: Boolean): Option[Row] =
    try parseLine(line)
    catch {
      case e if scala.util.control.NonFatal(e) =>
        if (lenient) None
        else throw new graft.GraftException(
          s"malformed N-Triples line: $line", e)
    }

  /** Read .nt / .nt.gz into a triples DataFrame. Strict by default —
    * a malformed line fails the read with the offending line in the
    * message; `lenient = true` skips malformed lines instead. */
  def read(spark: SparkSession, path: String,
      lenient: Boolean = false): RdfGraph = {
    val lines = spark.read.textFile(path)
    val rows = lines.rdd.flatMap(parseLineChecked(_, lenient))
    val df = spark.createDataFrame(rows, Terms.tripleType)
      .dropDuplicates("s", "p", "o")
    RdfGraph(df, RdfGraph.defaultPrefixes)
  }

  private[sources] def fmt(kind: Byte, v: String, dt: String, lang: String): String =
    kind match {
      case Terms.KIND_IRI => s"<$v>"
      case Terms.KIND_BLANK => s"_:$v"
      case Terms.KIND_TRIPLE => Terms.unpackString(v).n3()
      case _ => Lit(v, dt, lang).n3()
    }

  /** Distributed N-Triples sink (one line per triple). N-Triples has no
    * quad syntax, so a quad store writes its DEFAULT graph only — the
    * same boundary as the Turtle serializer. */
  def write(g: RdfGraph, path: String): Unit = {
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    val base =
      if (g.isQuads)
        g.triples.where(org.apache.spark.sql.functions.col("g").isNull)
          .select("s", "p", "o")
      else g.triples
    base.map { r =>
      val s = r.getStruct(0); val p = r.getStruct(1); val o = r.getStruct(2)
      fmt(s.getByte(0), s.getString(1), s.getString(2), s.getString(3)) + " " +
        fmt(p.getByte(0), p.getString(1), p.getString(2), p.getString(3)) + " " +
        fmt(o.getByte(0), o.getString(1), o.getString(2), o.getString(3)) + " ."
    }.write.mode("overwrite").text(path)
  }
}
