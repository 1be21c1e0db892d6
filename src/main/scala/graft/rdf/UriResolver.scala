package graft.rdf

/** Doc-time URI resolution: `<...>`/bare text resolve against a base URI
  * with RFC-3986 join; `prefix:local` resolves against the namespace map
  * (unrestricted local part — not XML QNames). Port of
  * `gastrodon/domain/__init__.py:96-126`, behavior pinned by the sphinx
  * doctests at `docs/uri_resolution_examples.rst:12-90`.
  */
final case class UriResolver(namespaces: Map[String, String], baseUri: String) {

  private def urljoin(base: String, rel: String): String =
    try java.net.URI.create(base).resolve(rel).toString
    catch { case _: IllegalArgumentException => rel }

  /** Any written form → URI string (any_to_uri,
    * gastrodon/domain/__init__.py:105-116). */
  def anyToUri(text: String): String = {
    if (text.startsWith("<") && text.endsWith(">"))
      return urljoin(baseUri, text.substring(1, text.length - 1))
    val parts = text.split(":", 2)
    if (parts.length == 1) return urljoin(baseUri, parts(0))
    namespaces.get(parts(0)) match {
      case Some(ns) => ns + parts(1)
      case None => text
    }
  }

  /** URI → human-friendly display form: base-relative `<local>`, else
    * `prefix:local`, else `<uri>` (humanize_uri,
    * gastrodon/domain/__init__.py:118-126). */
  def humanizeUri(uri: String): String = {
    if (uri.startsWith(baseUri))
      return "<" + uri.substring(baseUri.length) + ">"
    namespaces.collectFirst {
      case (prefix, ns) if uri.startsWith(ns) =>
        prefix + ":" + uri.substring(ns.length)
    }.getOrElse("<" + uri + ">")
  }
}
