package graft.rdf

/** RFC 3986 §5 reference resolution shared by every parser that has a
  * base (SPARQL/Turtle prologue, TriG, RDF/XML xml:base) — one copy of
  * the §5.3 same-document cases `java.net.URI` gets wrong, so a fix
  * here reaches all grammars at once (it took one round to fix the
  * first divergence; see the sparql/Parser history). */
object IriRef {

  /** A reference with a scheme is absolute (RFC 3986 §4.3) — the first
    * path segment of a RELATIVE ref cannot contain ':' (that's why
    * Turtle writes `./a:b`), so this test is exact, unlike substring
    * heuristics that miss tag:/doi:/isbn: schemes. */
  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.\\-]*:.*".r

  def isAbsolute(ref: String): Boolean = SchemeRe.matches(ref)

  /** Resolve `ref` against `base` (empty base = pass through). §5.3
    * same-document cases java.net.URI gets wrong are handled explicitly:
    * an empty ref is the base minus fragment (NOT the base's directory),
    * a query-only ref keeps the base's full path (Java drops the last
    * segment, JDK-6523089), and '#' keeps path AND query. */
  def resolve(base: String, ref: String): String =
    if (base.isEmpty || isAbsolute(ref)) ref
    else try {
      val noFrag = base.takeWhile(_ != '#')
      if (ref.isEmpty) noFrag
      else if (ref.startsWith("#")) noFrag + ref
      else if (ref.startsWith("?")) noFrag.takeWhile(_ != '?') + ref
      else new java.net.URI(base).resolve(ref).toString
    } catch { case _: Exception => ref }
}
