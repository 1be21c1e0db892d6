package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.rdf.{RdfGraph, RdfTerm}
import graft.sources.sparql.SparqlHttp

/** Remote SPARQL-protocol endpoint — the Spark-native `RemoteEndpoint`
  * (gastrodon/__init__.py:632-775). Query text is prepared exactly like the
  * reference (prefix auto-injection + `?_var` substitution, both at text
  * level so any remote dialect passes through) and shipped to the endpoint
  * via the "sparql" DataSourceV2 source; results come back as distributed
  * term-struct DataFrames.
  *
  * @param url          endpoint URL
  * @param prefixes     prefix → namespace map for auto-injection and display
  * @param user         basic-auth user (gastrodon/__init__.py:680)
  * @param password     basic-auth password
  * @param defaultGraph default-graph-uri protocol param (:684-685)
  * @param base         BASE for injection (reference injects `base <...>`,
  *                     gastrodon/__init__.py:331-333)
  */
class RemoteEndpoint(
    url: String,
    prefixes: Map[String, String] = RdfGraph.defaultPrefixes,
    user: Option[String] = None,
    password: Option[String] = None,
    defaultGraph: Option[String] = None,
    base: Option[String] = None,
    partitions: Int = 1,
    pageSize: Long = 0L)(implicit spark: SparkSession) {

  private val httpConf =
    SparqlHttp.Config(url, user, password, defaultGraph, 60000)

  /** prefix → namespace table (namespaces(), gastrodon/__init__.py:179-204). */
  def namespaces(): DataFrame = {
    import spark.implicits._
    prefixes.toSeq.sortBy(_._1).toDF("prefix", "namespace")
  }

  // ---- query-text preparation (the reference's text-level pipeline) -------

  private val qnameRe = java.util.regex.Pattern.compile(
    "(?<![\\w<:/#])([A-Za-z][A-Za-z0-9_.-]*)?:(?![/0-9])")
  private val declRe = java.util.regex.Pattern.compile(
    "(?i)\\bprefix\\s+([A-Za-z][A-Za-z0-9_.-]*)?\\s*:")

  /** Prepend base + only the referenced-and-undeclared prefixes
    * (_prepend_namespaces, gastrodon/__init__.py:317-346). */
  private[graft] def prependNamespaces(sparql: String): String = {
    val candidates = {
      val m = qnameRe.matcher(sparql)
      val out = scala.collection.mutable.LinkedHashSet[String]()
      while (m.find()) out += Option(m.group(1)).getOrElse("")
      out
    }
    val declared = {
      val m = declRe.matcher(sparql)
      val out = scala.collection.mutable.HashSet[String]()
      while (m.find()) out += Option(m.group(1)).getOrElse("")
      out
    }
    val decls = new StringBuilder
    base.foreach(b => decls.append(s"base <$b>\n"))
    candidates.filter(p => prefixes.contains(p) && !declared(p))
      .foreach(p => decls.append(s"prefix $p: <${prefixes(p)}>\n"))
    decls.append(sparql).toString
  }

  /** `?_var`/`$_var` → n3-serialized constant (_substitute_arguments,
    * gastrodon/__init__.py:348-356; _var_regex :45). */
  private[graft] def substitute(sparql: String, bindings: Map[String, Any]): String =
    if (bindings.isEmpty) sparql
    else {
      val m = java.util.regex.Pattern.compile("[?$]_([A-Za-z_0-9]+)").matcher(sparql)
      val sb = new java.lang.StringBuilder
      while (m.find()) {
        val name = m.group(1)
        val rep = bindings.get(name) match {
          // QName-shaped display values resolve against the endpoint's
          // prefix map — same round-trip the local engine gives
          case Some(v) => Engine.resolveTerm(v, prefixes).n3()
          case None => m.group(0)
        }
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
      }
      m.appendTail(sb)
      sb.toString
    }

  private def prepare(sparql: String, bindings: Map[String, Any]): String =
    substitute(prependNamespaces(sparql), bindings)

  // ---- query execution ----------------------------------------------------

  /** SELECT → term-struct DataFrame, streamed off the endpoint on
    * executors (no display projection — the 100 TB path). */
  def selectRaw(sparql: String, bindings: Map[String, Any] = Map.empty,
      vars: Seq[String] = Nil): DataFrame = {
    var r = spark.read.format("sparql")
      .option("url", url)
      .option("query", prepare(sparql, bindings))
      .option("timeoutMs", "60000")
    user.foreach(u => r = r.option("user", u))
    password.foreach(p => r = r.option("password", p))
    defaultGraph.foreach(g => r = r.option("defaultGraph", g))
    if (vars.nonEmpty) r = r.option("vars", vars.mkString(","))
    if (partitions > 1) r = r.option("partitions", partitions.toString)
      .option("pageSize", pageSize.toString)
    r.load()
  }

  /** SELECT → display DataFrame (typed columns, QName-shortened IRIs) —
    * `RemoteEndpoint.select` (gastrodon/__init__.py:487-511, 745-764). */
  def select(sparql: String, bindings: Map[String, Any] = Map.empty): DataFrame =
    Display.toDisplay(
      selectRaw(sparql, bindings)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      prefixes)

  /** CONSTRUCT → graph. Mirrors the reference's emulation: the query text
    * is shipped as-is and the endpoint's ?s ?p ?o JSON bindings are
    * reassembled into triples (_construct, gastrodon/__init__.py:766-775). */
  def construct(sparql: String, bindings: Map[String, Any] = Map.empty): RdfGraph =
    RdfGraph(
      selectRaw(sparql, bindings, vars = Seq("s", "p", "o"))
        .dropDuplicates("s", "p", "o"),
      prefixes)

  /** ASK → boolean (driver-side single protocol call). */
  def ask(sparql: String, bindings: Map[String, Any] = Map.empty): Boolean = {
    val in = SparqlHttp.execute(httpConf, prepare(sparql, bindings))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val m = java.util.regex.Pattern
      .compile("\"boolean\"\\s*:\\s*(true|false)").matcher(text)
    if (!m.find()) throw new GraftException(s"not an ASK response: ${text.take(200)}")
    m.group(1).toBoolean
  }

  /** SPARQL UPDATE via POST (update=…) — RemoteEndpoint._update
    * (gastrodon/__init__.py:670-676). */
  def update(sparql: String, bindings: Map[String, Any] = Map.empty): Unit = {
    val in = SparqlHttp.execute(httpConf, prepare(sparql, bindings),
      accept = "*/*", param = "update")
    try in.readAllBytes() finally in.close()
  }

  /** Copy the blank-node closure reachable from `node` (peel,
    * gastrodon/__init__.py:688-743). Each BFS level is ONE remote query
    * over the whole frontier (VALUES batch) instead of the reference's
    * one-HTTP-round-trip-per-node walk. */
  def peel(node: RdfTerm): RdfGraph = {
    var frontier: Seq[RdfTerm] = Seq(node)
    val seen = scala.collection.mutable.HashSet[String](node.n3())
    var acc: DataFrame = null
    var i = 0
    while (i < 100000 && frontier.nonEmpty) {
      // Virtuoso round-trips bnodes as <nodeID://…> IRIs; plain `_:x` in a
      // query is a fresh variable, so re-query store-scoped labels as IRIs
      // (the reference's _bnode_to_sparql hack, gastrodon/__init__.py:667-668)
      val values = frontier.map {
        case rdf.Blank(l) if l.contains("://") => s"<$l>"
        case t => t.n3()
      }.mkString(" ")
      val level = selectRaw(
        s"SELECT ?s ?p ?o { VALUES ?s { $values } ?s ?p ?o }").cache()
      acc = if (acc == null) level else acc.union(level)
      frontier = level.where(F.col("o.kind") === rdf.Terms.KIND_BLANK)
        .select("o").distinct().collect()
        .map(r => rdf.Blank(r.getStruct(0).getString(1)): RdfTerm)
        .filter(t => seen.add(t.n3())).toSeq
      i += 1
    }
    val triples =
      if (acc == null) RdfGraph.empty(spark).triples
      else acc.dropDuplicates("s", "p", "o")
    RdfGraph(triples, prefixes)
  }
}
