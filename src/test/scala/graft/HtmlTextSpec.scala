package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.TextAnalysis

/** The HTML main-content extractor: tag stripping, script/style
  * dropping, entity decoding, renderer-style whitespace collapse, and
  * hostile-markup degradation. */
class HtmlTextSpec extends SparkSpec {

  private def ext(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(TextAnalysis.htmlText(F.col("h")).as("t"))
      .collect().head.getString(0)
  }

  test("tags strip; block tags break lines; inline tags join") {
    assert(ext("<html><body><h1>Title</h1><p>One <b>bold</b> word.</p>" +
      "<p>Two</p></body></html>") == "Title\nOne bold word.\nTwo")
    assert(ext("pre<span>in</span>post") == "preinpost")
    assert(ext("a<br>b") == "a\nb")
  }

  test("script and style bodies drop whole, case-insensitive") {
    assert(ext("<p>keep</p><script>var x = '<p>not text</p>';</script>" +
      "<p>also</p>") == "keep\nalso")
    assert(ext("<STYLE type=\"text/css\">p { color: red }</STYLE>body") ==
      "body")
    // unterminated script swallows the rest instead of leaking code
    assert(ext("text<script>if (a < b) {") == "text")
    // self-closed script has no body to skip
    assert(ext("<script src=\"x.js\"/>after") == "after")
  }

  test("comments, doctype, and processing instructions drop") {
    assert(ext("<!DOCTYPE html><!-- hidden <p>x</p> -->shown" +
      "<?php echo 1 ?>") == "shown")
    assert(ext("a<!-- unterminated") == "a")
  }

  test("entities decode; unknown entities stay literal") {
    assert(ext("Tom &amp; Jerry &lt;3 &#65;&#x42; &copy;") ==
      "Tom & Jerry <3 AB ©")
    assert(ext("&bogus; &noSemicolonEver and &#xZZ;") ==
      "&bogus; &noSemicolonEver and &#xZZ;")
    assert(ext("one&nbsp;space") == "one space")
    // numeric whitespace entities separate instead of leaking literally
    assert(ext("line1&#10;line2 tab&#9;ped") == "line1 line2 tab ped")
  }

  test("whitespace collapses like a renderer; output is trimmed") {
    assert(ext("  <p>\n  a\n   b  </p>\t<p>c</p>  ") == "a b\nc")
    assert(ext("<td>a</td><td>b</td>") == "a b")
    // consecutive block boundaries collapse to one newline
    assert(ext("<p>a</p><div></div><p>b</p>") == "a\nb")
  }

  test("quoted attributes may contain '>'; bare '<' is literal text") {
    assert(ext("<a href=\"q?a>b\" title='x>y'>link</a>") == "link")
    assert(ext("3 < 5 and 7 > 2") == "3 < 5 and 7 > 2")
  }

  test("non-HTML text passes through; null and junk degrade safely") {
    import spark.implicits._
    assert(ext("plain text, no markup.") == "plain text, no markup.")
    val rows = Seq((1L, null.asInstanceOf[String]), (2L, "<"), (3L, ""))
      .toDF("id", "h")
      .select(F.col("id"), TextAnalysis.htmlText(F.col("h")).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows(1L).isEmpty)
    assert(rows(2L).contains("<"))
    assert(rows(3L).contains(""))
  }

  test("hostile markup never throws (random and mutated)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "<>&;!-/=\"' abcdefghijklmnop#xscriptstyle"
    for (_ <- 0 until 500) {
      val junk = Array.fill(rnd.nextInt(200))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      ext(junk) // any output, no throw
    }
  }

  test("SQL function html_text is registered") {
    val got = spark.sql(
      "SELECT html_text('<p>a &amp; b</p>') AS t").collect().head.getString(0)
    assert(got == "a & b")
  }
}
