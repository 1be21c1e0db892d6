package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{HtmlLinks, ResolveUrl}
import graft.pipeline.{Graphs, TextAnalysis}

/** Outlink extraction ([[graft.expressions.HtmlLinks]]), RFC 3986
  * reference resolution ([[graft.expressions.ResolveUrl]] — pinned
  * against the spec's own §5.4 example vectors), and the composed
  * host-edge / host-PageRank chain. */
class HtmlLinksSpec extends SparkSpec {
  import spark.implicits._

  private def links(html: String): Seq[String] = {
    val a = HtmlLinks.extract(UTF8String.fromString(html))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  private def res(base: String, ref: String): String = {
    val r = ResolveUrl.resolve(UTF8String.fromString(base),
      UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  test("href extraction: quoting styles, order, duplicates kept") {
    val html = """<html><body>
      <a href="/one">1</a>
      <A HREF='/two'>2</A>
      <a class="x" href=three.html>3</a>
      <a href="/one">again</a>
      <area shape="rect" href="/map">m</area>
      </body></html>"""
    assert(links(html) === Seq("/one", "/two", "three.html", "/one", "/map"))
  }

  test("entities in hrefs decode; whitespace trims") {
    assert(links("""<a href=" /p?a=1&amp;b=2 ">x</a>""") ===
      Seq("/p?a=1&b=2"))
    assert(links("""<a href="/p&#63;q">x</a>""") === Seq("/p?q"))
  }

  test("non-navigational refs drop") {
    val html = """<a href="#top">t</a><a href="">e</a>
      <a href="javascript:void(0)">j</a><a href="MAILTO:x@y">m</a>
      <a href="tel:+1">p</a><a href="data:text/plain,x">d</a>
      <a href="http://ok.example/">k</a>"""
    assert(links(html) === Seq("http://ok.example/"))
  }

  test("quote-aware tag scan; script/style/comment bodies skipped") {
    val html = """<a href="a>b" title="x>y">t</a>
      <script>var s = '<a href="/fake1">';</script>
      <!-- <a href="/fake2"> -->
      <style>a[href="/fake3"]{}</style>
      <a href="/real">r</a>"""
    assert(links(html) === Seq("a>b", "/real"))
  }

  test("first href in a tag wins; tags named a* are not anchors") {
    assert(links("""<a href="/x" href="/y">t</a>""") === Seq("/x"))
    assert(links("""<abbr href="/no">t</abbr><address href="/no2"/>""") ===
      Seq.empty)
  }

  test("rel=nofollow: token match, only in skipNofollow mode") {
    val html = """<a href="/a" rel="nofollow">n</a>
      <a href="/b" rel="external NOFOLLOW sponsored">n2</a>
      <a href="/c" rel="nofollowme">not-a-token</a>
      <a rel=nofollow href="/d">attr-order</a>
      <a href="/e">plain</a>"""
    def ex(skip: Boolean) = {
      val a = HtmlLinks.extract(UTF8String.fromString(html), skip)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(ex(false) === Seq("/a", "/b", "/c", "/d", "/e"))
    assert(ex(true) === Seq("/c", "/e"))
    // SQL two-arg form
    import spark.implicits._
    val viaSql = spark.sql(
      s"""SELECT html_links('<a href="/x" rel="nofollow">x</a>' ||
           '<a href="/y">y</a>', true)""").as[Seq[String]].head()
    assert(viaSql === Seq("/y"))
  }

  test("<base href> overrides the resolution base in hostEdges/frontier") {
    val docs = Seq(
      ("http://orig.example/p",
        """<head><base target="_b" href="http://moved.example/dir/"></head>
           <a href="rel.html">r</a><a href="/abs">a</a>"""))
      .toDF("url", "html")
    val edges = Graphs.hostEdges(docs).as[(String, String)].collect().toSet
    // both links resolve against moved.example now; src is the PAGE host
    assert(edges === Set(("orig.example", "moved.example")))
    val frontier = Graphs.frontierUrls(docs, Seq.empty[String].toDF("url"))
      .as[String].collect().toSet
    assert(frontier === Set("http://moved.example/dir/rel.html",
      "http://moved.example/abs"))
    // htmlBase contract: first wins; absent → null
    val b = docs.select(TextAnalysis.htmlBase(F.col("html"))).as[String].head()
    assert(b === "http://moved.example/dir/")
    assert(Seq(Tuple1("<p>no base</p>")).toDF("h")
      .select(TextAnalysis.htmlBase(F.col("h"))).head().isNullAt(0))
  }

  test("stray quote in an unquoted value doesn't swallow later links") {
    // HTML5: '>' always ends a tag; quotes only open a value after '='
    assert(links("""<a href=foo"bar>x</a> <a href="/real">r</a>""") ===
      Seq("foo\"bar", "/real"))
    assert(links("""<p class=x"oops>text</p><a href="/ok">k</a>""") ===
      Seq("/ok"))
  }

  test("base href: comment/script-aware scan, first wins, entity decode") {
    import graft.expressions.HtmlLinks
    def base(h: String): String = {
      val b = HtmlLinks.baseHref(UTF8String.fromString(h))
      if (b == null) null else b.toString
    }
    // a commented-out or scripted <base> never hijacks resolution
    assert(base("""<!-- <base href="http://evil.example/"> -->
      <base href="/real/">""") === "/real/")
    assert(base("""<script>var s='<base href="http://evil.example/">';
      </script><base href="/good/">""") === "/good/")
    assert(base("""<base href="/a/"><base href="/b/">""") === "/a/")
    assert(base("""<base target="_b" href="/p?x=1&amp;y=2">""") ===
      "/p?x=1&y=2")
    assert(base("<p>no base</p>") === null)
    assert(base("<basefont size=3><a href='/x'>t</a>") === null)
    // SQL registration
    import spark.implicits._
    assert(spark.sql("""SELECT html_base('<base href="/sql/">x')""")
      .as[String].head() === "/sql/")
  }

  test("null in, null out; no anchors means empty array") {
    assert(HtmlLinks.extract(null) === null)
    assert(links("plain text, no markup & such <") === Seq.empty)
  }

  // RFC 3986 §5.4.1 normal examples (fragments dropped by design —
  // the link-graph target is the resource)
  test("resolve_url: RFC 3986 normal examples") {
    val b = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q",
      "g#s" -> "http://a/b/c/g",
      "g?y#s" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    for ((ref, want) <- cases)
      assert(res(b, ref) === want, s"ref='$ref'")
  }

  test("resolve_url: RFC 3986 abnormal examples") {
    val b = "http://a/b/c/d;p?q"
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y")
    for ((ref, want) <- cases)
      assert(res(b, ref) === want, s"ref='$ref'")
  }

  test("resolve_url: edge contracts") {
    // authority-only base gets the mandatory leading slash
    assert(res("http://h.example", "g") === "http://h.example/g")
    // absolute ref passes through minus fragment
    assert(res("http://a/", "https://b.example/x#frag") ===
      "https://b.example/x")
    // schemeless base / non-hierarchical base + relative ref → null
    assert(res("no-scheme/path", "g") === null)
    assert(res("mailto:x@y", "g") === null)
    // oversized input → null
    assert(res("http://a/" + "x" * 9000, "g") === null)
    assert(ResolveUrl.resolve(null, UTF8String.fromString("g")) === null)
  }

  test("hostEdges: extract → resolve → host pairs, distinct, no self") {
    val docs = Seq(
      ("http://www.alpha.example/p/1",
        """<a href="/p/2">self</a><a href="http://beta.example/x">b</a>
           <a href="//gamma.example:80/y">g</a><a href="#f">skip</a>"""),
      ("http://beta.example/",
        """<a href="../up">self2</a><a href="http://ALPHA.example/z">a</a>
           <a href="http://beta.example/other">selfhost</a>"""),
      ("not a url", """<a href="http://omega.example/">unresolvable</a>"""))
      .toDF("url", "html")
    val edges = Graphs.hostEdges(docs).as[(String, String)].collect().toSet
    assert(edges === Set(
      ("alpha.example", "beta.example"),
      ("alpha.example", "gamma.example"),
      ("beta.example", "alpha.example")))
  }

  test("pageRankHosts: ranks join back to host strings, mass conserved") {
    val edges = Seq(
      ("a.example", "b.example"), ("b.example", "a.example"),
      ("c.example", "a.example")).toDF("src_host", "dst_host")
    val out = Graphs.pageRankHosts(edges, iters = 3)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq ===
      Seq("a.example", "b.example", "c.example"))
    // a receives from b AND dangling-free c, so it must outrank both
    val byHost = out.map(r => r._1 -> r._2).toMap
    assert(byHost("a.example") > byHost("b.example"))
    assert(byHost("b.example") > byHost("c.example"))
    // deterministic: rerun is bit-identical
    val again = Graphs.pageRankHosts(edges, iters = 3)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq === out.toSeq)
  }

  test("frontierUrls: new targets only — own pages and seen corpus drop") {
    val docs = Seq(
      ("http://a.example/p/1",
        """<a href="/p/2">own</a><a href="http://new.example/n1">n</a>
           <a href="http://old.example/o1">o</a>"""),
      ("http://a.example/p/2",
        """<a href="http://new.example/n2">n</a>
           <a href="http://new.example/n1">dup</a>"""))
      .toDF("url", "html")
    val seen = Seq("http://old.example/o1").toDF("url")
    val frontier = Graphs.frontierUrls(docs, seen).as[String].collect().toSet
    assert(frontier === Set("http://new.example/n1", "http://new.example/n2"))
    // empty seen corpus: everything non-own is frontier
    val all = Graphs.frontierUrls(docs, seen.limit(0)).as[String].collect().toSet
    assert(all === frontier + "http://old.example/o1")
  }

  test("withHostRank: pages carry their host's rank; unlinked hosts NULL") {
    val docs = Seq(
      ("http://www.alpha.example/p", """<a href="http://beta.example/">b</a>"""),
      ("http://beta.example/q", """<a href="http://alpha.example/">a</a>"""),
      ("http://beta.example/r", "no links here"),
      ("http://lonely.example/", "plain text, never linked"))
      .toDF("url", "html")
    val out = Graphs.withHostRank(docs).select("url", "host_rank")
      .as[(String, Option[Double])].collect().toMap
    assert(out("http://beta.example/q") === out("http://beta.example/r"))
    assert(out("http://beta.example/q").isDefined &&
      out("http://www.alpha.example/p").isDefined)
    assert(out("http://lonely.example/").isEmpty)
  }

  test("SQL registration: html_links and resolve_url") {
    val r = spark.sql(
      """SELECT resolve_url('http://h.example/a/b',
           html_links('<a href="../c?x=1&amp;y=2">t</a>')[0]) AS u""")
      .as[String].collect()
    assert(r.toSeq === Seq("http://h.example/c?x=1&y=2"))
  }

  test("html_anchors: href + rendered text; recovery and edge rules") {
    import graft.expressions.HtmlAnchors
    def anchors(h: String): Seq[(String, String)] = {
      val a = HtmlAnchors.extract(UTF8String.fromString(h))
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      }
    }
    assert(anchors(
      """<a href="/a">Click <b>here</b> &amp; now</a>
         <a href="/b"><img src=x.png></a>
         <a href="#skip">no link</a>
         <a href="/c">unclosed runs to next <a href="/d">d text</a>""") ===
      Seq(("/a", "Click here & now"), ("/b", ""),
        ("/c", "unclosed runs to next"), ("/d", "d text")))
    // comments/scripts outside anchors are skipped; EOF-cut discarded
    assert(anchors("<!-- <a href='/x'>n</a> --><a href='/y'>y</a>") ===
      Seq(("/y", "y")))
    assert(anchors("<a href='/z'>never closed") === Seq.empty)
    assert(HtmlAnchors.extract(null) === null)
    // self-closed script has no body: anchors after it survive
    // (HtmlLinks parity — a </script> hunt to EOF would drop them)
    assert(anchors("""<script src="x.js"/><a href="/s">s</a>""") ===
      Seq(("/s", "s")))
    // bare '<' in text is not a tag and must not eat the next anchor
    assert(anchors("""3 < 5 <a href="/lt">lt</a>""") === Seq(("/lt", "lt")))
    // SQL registration
    import spark.implicits._
    val viaSql = spark.sql(
      """SELECT html_anchors('<a href="/q">Quarterly report</a>')[0].text""")
      .as[String].head()
    assert(viaSql === "Quarterly report")
  }

  test("hostile input never throws") {
    val rnd = new scala.util.Random(7)
    for (i <- 0 until 300) {
      val junk = (0 until rnd.nextInt(80)).map(_ =>
        "<>&\"'=/ah ref#:.".charAt(rnd.nextInt(16))).mkString
      links(junk)                          // must not throw
      res("http://a/b/c", junk)            // must not throw
      res(junk, junk)                      // must not throw
    }
    // unterminated structures
    assert(links("<a href=\"/x") === Seq.empty)
    assert(links("<script><a href=\"/x\">") === Seq.empty)
    assert(links("<a href=") === Seq.empty)
  }
}
