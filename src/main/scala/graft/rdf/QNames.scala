package graft.rdf

/** QName computation utilities — ports of `Endpoint.ns_part`/`local_part`/
  * `is_ok_qname`/`short_name` (gastrodon/__init__.py:206-315), including
  * the SPARQL 1.1 PN_LOCAL-derived validity regex with percent and colon
  * removed (`_valid_tail_regex`, gastrodon/__init__.py:42-49). */
object QNames {

  // PN_CHARS_BASE minus surrogate-pair ranges (JVM regex is UTF-16; the
  // astral range is expressed with \x{...})
  private val pncb = "_A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF" +
    "\u0370-\u037D\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF" +
    "\u3001-\uD7FF\uF900-\uFDCF\uFDF0-\uFFFD\\x{10000}-\\x{EFFFF}"
  private val pnc = "\\-0-9\u00B7\u0300-\u036F\u203F-\u2040" + pncb

  /** Modified PN_LOCAL from the SPARQL 1.1 grammar, percent/colon removed
    * (a URI whose tail matches can safely be shown as prefix:local). */
  private[rdf] val validTail =
    java.util.regex.Pattern.compile(s"[${pncb}0-9]([$pnc.]*[$pnc])?")

  /** Is `s` a valid QName local part (the shape the display layer emits
    * after `prefix:`)? Used by the round-trip heuristic to keep literals
    * that merely contain a colon from being mistaken for QNames. */
  def isValidLocal(s: String): Boolean = validTail.matcher(s).matches()

  /** Namespace part: everything through the LAST `#` or `/`
    * (syntax-based, gastrodon/__init__.py:224-241). */
  def nsPart(url: String): String =
    url.substring(0, math.max(url.lastIndexOf('#'), url.lastIndexOf('/')) + 1)

  /** Local part: everything after the last `#`/`/`
    * (gastrodon/__init__.py:243-260). */
  def localPart(url: String): String =
    url.substring(math.max(url.lastIndexOf('#'), url.lastIndexOf('/')) + 1)

  /** Can the URI be safely rendered as a QName against the declared
    * namespaces? (is_ok_qname, gastrodon/__init__.py:206-222 — requires a
    * PN_LOCAL-valid tail AND a declared namespace). */
  def isOkQname(url: String, namespaces: Set[String]): Boolean =
    validTail.matcher(localPart(url)).matches() && namespaces(nsPart(url))

  /** Shorten to `prefix:local` when safe, else None (short_name,
    * gastrodon/__init__.py:295-315). */
  def shortName(url: String, prefixes: Map[String, String]): Option[String] = {
    val ns = nsPart(url)
    val local = localPart(url)
    if (!validTail.matcher(local).matches()) None
    else prefixes.collectFirst { case (p, n) if n == ns => s"$p:$local" }
  }
}
