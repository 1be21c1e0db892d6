package graft.sources

import org.apache.spark.sql.SparkSession
import graft.rdf._
import graft.sparql.{Parser => SparqlParser}
import graft.sparql.Ast._

/** TriG reader/writer — the Turtle of quad stores (W3C TriG: Turtle
  * plus graph blocks), completing the serialization family: Turtle and
  * N-Triples carry the default graph, N-Quads and TriG carry named
  * graphs; N-Triples/N-Quads are the line-splittable distributed path,
  * Turtle/TriG the prefix-aware inline/display path.
  *
  * The reader accepts all four statement shapes of the grammar —
  * directives, `GRAPH <label> { … }`, `<label> { … }`, a bare
  * `{ … }` default-graph block, and bare Turtle statements — reusing
  * the SPARQL grammar's triples productions exactly like the Turtle
  * reader (Turtle.scala), driver-side (TriG is not line-splittable;
  * large-scale named-graph loads go through [[NQuads]]). Graph labels
  * may be IRIs or blank nodes. The writer mirrors the reader: the
  * default graph serializes as bare Turtle statements, each named
  * graph as a `<label> { … }` block, both grouped by subject. */
object Trig {

  private class TrigParser(prefixes: Map[String, String])
      extends TurtleParser(prefixes) {

    def graphLabel: Parser[RdfTerm] =
      iri ^^ (Iri(_)) |
      """_:[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?""".r ^^
        (l => Blank(l.substring(2)))

    /** `{ … }` — statements SEPARATED by dots, only the final dot
      * optional (the TriG triplesBlock production: a missing dot
      * between two subject groups is a syntax error). */
    def wrapped: Parser[Seq[TriplePattern]] =
      "{" ~> opt(rep1sep(triplesSameSubject, ".") <~ opt(".")) <~ "}" ^^
        (_.toSeq.flatten.flatten)

    def block: Parser[Seq[(TriplePattern, Option[RdfTerm])]] =
      directive ^^ (_ => Nil) |
      ((kwPub("GRAPH") ~> graphLabel) ~ wrapped) ^^ {
        case g ~ ts => ts.map((_, Some(g)))
      } |
      (graphLabel ~ wrapped) ^^ { case g ~ ts => ts.map((_, Some(g))) } |
      wrapped ^^ (_.map((_, None))) |
      (triplesSameSubject <~ ".") ^^ (_.map((_, None)))

    def trigDoc: Parser[Seq[(TriplePattern, Option[RdfTerm])]] =
      rep(block) ^^ (_.flatten)

    def parseTrigDoc(text: String): Seq[(TriplePattern, Option[RdfTerm])] =
      parseWhole(trigDoc, text)
  }

  /** Driver-side parse to a quad list (None = default graph) — the
    * term-level view the conformance harness compares against N-Quads
    * expected files; [[parse]] wraps it into a Spark-backed store. */
  def parseQuads(text: String,
      extraPrefixes: Map[String, String] = Map.empty)
      : Seq[(RdfTerm, RdfTerm, RdfTerm, Option[RdfTerm])] = {
    val p = new TrigParser(RdfGraph.defaultPrefixes ++ extraPrefixes)
    p.parseTrigDoc(text).map { case (tp, g) =>
      (Turtle.nodeTerm(tp.s, "TriG"), Turtle.verbTerm(tp, "TriG"),
        Turtle.nodeTerm(tp.o, "TriG"), g)
    }
  }

  /** Parse a TriG document into a QUAD store (set semantics; g null =
    * default graph). */
  def parse(text: String, spark: SparkSession,
      extraPrefixes: Map[String, String] = Map.empty): RdfGraph = {
    val p = new TrigParser(RdfGraph.defaultPrefixes ++ extraPrefixes)
    val patterns = p.parseTrigDoc(text)
    val quads = patterns.map { case (tp, g) =>
      (Turtle.nodeTerm(tp.s, "TriG"), Turtle.verbTerm(tp, "TriG"),
        Turtle.nodeTerm(tp.o, "TriG"), g)
    }
    RdfGraph.fromQuads(spark, quads, p.declaredPrefixes)
  }

  /** Serialize to TriG text: default graph as bare statements, one
    * `<label> { … }` block per named graph, subjects grouped, prefixes
    * shortened. Driver-side display/export path (collects the store);
    * the distributed sinks are [[write]] (TriG part files) and
    * [[NQuads.write]] (line-oriented). A triple-only graph writes as
    * pure Turtle (valid TriG). */
  def serialize(g: RdfGraph): String = {
    val sb = new StringBuilder
    val prefixOrder = g.prefixes.toSeq.sortBy(_._1)
    prefixOrder.foreach { case (p, ns) => sb.append(s"@prefix $p: <$ns> .\n") }
    if (prefixOrder.nonEmpty) sb.append("\n")
    def fmt(r: org.apache.spark.sql.Row): String =
      Turtle.fmtTerm(r, g.prefixes)

    val rows =
      if (g.isQuads) g.triples.orderBy("s.value", "p.value", "o.value").collect()
      else g.triples.orderBy("s.value", "p.value", "o.value").collect()
        .map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), null))
    val (named, dflt) = rows.partition(r => !r.isNullAt(3))

    def emit(ts: Array[org.apache.spark.sql.Row], indent: String): Unit =
      ts.groupBy(r => fmt(r.getStruct(0))).toSeq.sortBy(_._1).foreach {
        case (subj, grp) =>
          val body = grp
            .sortBy(r => (r.getStruct(1).getString(1), r.getStruct(2).getString(1)))
            .map(r => s"$indent  ${fmt(r.getStruct(1))} ${fmt(r.getStruct(2))}")
            .mkString(" ;\n")
          sb.append(s"$indent$subj\n$body .\n")
      }

    emit(dflt, "")
    named.groupBy(r => fmt(r.getStruct(3))).toSeq.sortBy(_._1).foreach {
      case (label, grp) =>
        if (sb.nonEmpty) sb.append("\n")
        sb.append(s"$label {\n")
        emit(grp, "  ")
        sb.append("}\n")
    }
    sb.toString
  }

  /** Distributed TriG sink, the quad-store analogue of [[Turtle.write]]:
    * (graph, subject)-grouped blocks streamed per-partition under a
    * shared `@prefix` header. Default-graph triples write as bare
    * subject blocks; named-graph triples write one `<label> { … }` block
    * per subject group — TriG 1.1 permits the same graph label in any
    * number of graph statements (their contents union), and Turtle's
    * re-declared-prefix / re-opened-subject allowances carry over, so
    * the part files concatenate to the same store with no global sort
    * and no driver materialization. */
  def write(g: RdfGraph, path: String, numPartitions: Int = 0): Unit = {
    val prefixes = g.prefixes
    val header = prefixes.toSeq.sortBy(_._1)
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("\n")
    val F = org.apache.spark.sql.functions
    val base =
      if (g.isQuads) g.triples.select("g", "s", "p", "o")
      else g.triples.select(F.lit(null).cast(graft.rdf.Terms.termType).as("g"),
        F.col("s"), F.col("p"), F.col("o"))
    val parts =
      if (numPartitions > 0) base.repartition(numPartitions, F.col("g"), F.col("s"))
      else base.repartition(F.col("g"), F.col("s"))
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    parts.sortWithinPartitions("g", "s", "p", "o")
      .mapPartitions { it =>
        val buf = it.buffered
        val blocks = new Iterator[String] {
          def hasNext: Boolean = buf.hasNext
          def next(): String = {
            val head = buf.head
            val gTerm = if (head.isNullAt(0)) null else head.getStruct(0)
            val s = head.getStruct(1)
            val named = gTerm != null
            val indent = if (named) "  " else ""
            val sb = new StringBuilder
            if (named)
              sb.append(Turtle.fmtTerm(gTerm, prefixes)).append(" {\n")
            sb.append(indent).append(Turtle.fmtTerm(s, prefixes)).append('\n')
            var first = true
            def sameGroup: Boolean = buf.hasNext && {
              val r = buf.head
              (if (r.isNullAt(0)) null else r.getStruct(0)) == gTerm &&
                r.getStruct(1) == s
            }
            while (sameGroup) {
              val r = buf.next()
              if (!first) sb.append(" ;\n")
              sb.append(indent).append("  ")
                .append(Turtle.fmtTerm(r.getStruct(2), prefixes))
                .append(' ').append(Turtle.fmtTerm(r.getStruct(3), prefixes))
              first = false
            }
            sb.append(" .")
            if (named) sb.append("\n}")
            sb.toString
          }
        }
        if (blocks.hasNext && header.nonEmpty) Iterator(header) ++ blocks
        else blocks
      }.write.mode("overwrite").text(path)
  }

  /** Read a [[write]]-produced directory back into a quad store: each
    * part file is standalone TriG; repeated graph labels across files
    * union (set semantics at load). */
  def read(spark: SparkSession, path: String,
      extraPrefixes: Map[String, String] = Map.empty): RdfGraph = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // concatenation semantics in name-sorted order — see Turtle.read
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
    val p = new TrigParser(RdfGraph.defaultPrefixes ++ extraPrefixes)
    val quads = files.flatMap { st =>
      val in = fs.open(st.getPath)
      val doc =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      p.parseTrigDoc(doc).map { case (tp, gl) =>
        (Turtle.nodeTerm(tp.s, "TriG"), Turtle.verbTerm(tp, "TriG"),
          Turtle.nodeTerm(tp.o, "TriG"), gl)
      }
    }
    RdfGraph.fromQuads(spark, quads, p.declaredPrefixes)
  }
}
