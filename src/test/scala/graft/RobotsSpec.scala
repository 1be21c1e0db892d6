package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.RobotsAllowed
import graft.pipeline.Crawl

/** RFC 9309 robots.txt evaluation ([[graft.expressions.RobotsAllowed]],
  * `Crawl.filterByRobots`): the spec's own matching examples, group
  * selection, wildcard/anchor patterns, precedence, and the frontier
  * politeness gate. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def allowed(body: String, path: String, ua: String = "graftbot") =
    RobotsAllowed.allowed(UTF8String.fromString(body),
      UTF8String.fromString(path), ua)

  test("pattern matching: the RFC/Google example table") {
    import RobotsAllowed.{matches => m}
    assert(m("/fish", "/fish"))
    assert(m("/fish", "/fish.html"))
    assert(m("/fish", "/fish/salmon.html"))
    assert(!m("/fish", "/Fish.asp"))
    assert(!m("/fish", "/catfish"))
    assert(m("/fish/", "/fish/salmon"))
    assert(!m("/fish/", "/fish"))
    assert(m("/*.php", "/index.php"))
    assert(m("/*.php", "/folder/any.php.file.html"))
    assert(!m("/*.php", "/php/"))          // no trailing .php
    assert(!m("/*.php", "/windex"))
    assert(m("/*.php$", "/filename.php"))
    assert(m("/*.php$", "/folder/filename.php"))
    assert(!m("/*.php$", "/filename.php?parameters"))
    assert(!m("/*.php$", "/filename.php5"))
    assert(m("/fish*.php", "/fish.php"))
    assert(m("/fish*.php", "/fishheads/catfish.php?parameters"))
    assert(!m("/fish*.php", "/Fish.PHP"))
    assert(m("/fish$", "/fish"))
    assert(!m("/fish$", "/fishes"))
  }

  test("group selection: most specific UA wins; rules merge across groups") {
    val body =
      """User-agent: *
        |Disallow: /private/
        |
        |User-agent: graftbot
        |Disallow: /only-graft/
        |
        |User-agent: graft
        |Disallow: /short/
        |
        |User-agent: graftbot
        |Disallow: /more-graft/
        |""".stripMargin
    // graftbot picks the LONGEST matching token: its two groups merge,
    // the shorter 'graft' group and '*' do not apply
    assert(!allowed(body, "/only-graft/x"))
    assert(!allowed(body, "/more-graft/x"))
    assert(allowed(body, "/short/x"))
    assert(allowed(body, "/private/x"))
    // an unknown bot falls back to *
    assert(!allowed(body, "/private/x", "otherbot"))
    assert(allowed(body, "/only-graft/x", "otherbot"))
  }

  test("precedence: longest pattern wins, Allow wins ties") {
    val body =
      """User-agent: *
        |Allow: /folder/page
        |Disallow: /folder/
        |""".stripMargin
    assert(allowed(body, "/folder/page"))
    assert(allowed(body, "/folder/page.html"))
    assert(!allowed(body, "/folder/other"))
    val tie =
      """User-agent: *
        |Allow: /page
        |Disallow: /page
        |""".stripMargin
    assert(allowed(tie, "/page"))
  }

  test("a bare '$' rule matches nothing; mixed-case UA works in Scala API") {
    // '$' anchors an EMPTY pattern: no real path satisfies it, so the
    // host stays allowed (a buggy match-everything would block it all)
    assert(allowed("User-agent: *\nDisallow: $", "/x"))
    assert(allowed("User-agent: *\nDisallow: $", "/"))
    import spark.implicits._
    val urls = Seq("http://a.example/private/x").toDF("url")
    val robots = Seq(("a.example", "User-agent: graftbot\nDisallow: /private/"))
      .toDF("host", "robots_txt")
    // the Scala wrapper lowercases the token like the SQL builder does
    assert(Crawl.filterByRobots(urls, robots, "GraftBot").count() === 0)
  }

  test("edge contracts: empty Disallow, comments, no groups, null body") {
    assert(allowed("User-agent: *\nDisallow:", "/anything"))
    assert(allowed("# just comments\n", "/x"))
    assert(allowed("", "/x"))
    assert(!allowed(
      "User-agent: * # trailing comment\nDisallow: /x # comment", "/x/y"))
    assert(RobotsAllowed.allowed(UTF8String.fromString(
      "User-agent: *\nDisallow: /"), null, "bot") === false)
    // crawl-delay/sitemap lines do not end the group
    val body =
      """User-agent: *
        |Crawl-delay: 10
        |Disallow: /blocked/
        |Sitemap: http://x/s.xml
        |Disallow: /also/
        |""".stripMargin
    assert(!allowed(body, "/blocked/p") && !allowed(body, "/also/p"))
  }

  test("hostile input never throws; oversized body truncates") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val junk = (0 until rnd.nextInt(60)).map(_ =>
        "Uagent:*/$#\n dislow:".charAt(rnd.nextInt(20))).mkString
      allowed(junk, "/x")
    }
    val big = "User-agent: *\n" + ("# pad\n" * 100000) + "Disallow: /late/\n"
    allowed(big, "/late/x") // > 500 KiB: the tail rule may be cut; no throw
  }

  test("filterByRobots gates a frontier; SQL registration") {
    val urls = Seq(
      "http://a.example/public/1",
      "http://a.example/private/2",
      "http://a.example/private/allowed-page",
      "http://b.example/anything",
      "http://norobots.example/x").toDF("url")
    val robots = Seq(
      ("a.example",
        "User-agent: *\nDisallow: /private/\nAllow: /private/allowed-page"),
      ("b.example", "User-agent: graftbot\nDisallow: /"))
      .toDF("host", "robots_txt")
    val kept = Crawl.filterByRobots(urls, robots, "graftbot")
      .as[String].collect().toSet
    assert(kept === Set(
      "http://a.example/public/1",
      "http://a.example/private/allowed-page",
      "http://norobots.example/x"))
    val viaSql = spark.sql(
      """SELECT robots_allowed('User-agent: *
           |Disallow: /no/', '/no/x', 'anybot')""".stripMargin)
      .as[Boolean].head()
    assert(viaSql === false)
  }
}
