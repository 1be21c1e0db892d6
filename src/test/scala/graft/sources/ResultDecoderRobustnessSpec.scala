package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.sources.sparql.ResultDecoders

/** Mutation-robustness fuzz over the SPARQL-results decoders — the
  * OTHER dirty-input boundary: these run on EXECUTORS against whatever
  * bytes a remote endpoint returns, so a malformed response must
  * surface as the decoders' documented IOException-with-context (or an
  * IllegalArgumentException from an impossible header), never an
  * implementation artifact that kills the task with NPE/ClassCast/
  * index errors. Same mutation engine as ParserRobustnessSpec. */
class ResultDecoderRobustnessSpec extends AnyFunSuite {

  private val vars = Array("s", "n", "l")

  private val jsonDoc =
    """{"head":{"vars":["s","n","l"]},
      | "results":{"bindings":[
      |  {"s":{"type":"uri","value":"http://example.com/a"},
      |   "n":{"type":"literal","datatype":"http://www.w3.org/2001/XMLSchema#integer","value":"42"},
      |   "l":{"type":"literal","xml:lang":"en-US","value":"Hi"}},
      |  {"s":{"type":"bnode","value":"b0"},
      |   "n":{"type":"literal","value":"plain"}}
      |]}}
      |""".stripMargin

  private val xmlDoc =
    """<?xml version="1.0"?>
      |<sparql xmlns="http://www.w3.org/2005/sparql-results#">
      |  <head><variable name="s"/><variable name="n"/><variable name="l"/></head>
      |  <results>
      |    <result>
      |      <binding name="s"><uri>http://example.com/a</uri></binding>
      |      <binding name="n"><literal datatype="http://www.w3.org/2001/XMLSchema#integer">42</literal></binding>
      |      <binding name="l"><literal xml:lang="en-US">Hi</literal></binding>
      |    </result>
      |    <result><binding name="s"><bnode>b0</bnode></binding></result>
      |  </results>
      |</sparql>
      |""".stripMargin

  private val tsvDoc =
    "?s\t?n\t?l\n" +
      "<http://example.com/a>\t\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>\t\"Hi\"@en-US\n" +
      "_:b0\t\"plain\"\t\n"

  private val csvDoc =
    "s,n,l\nhttp://example.com/a,42,Hi\n_:b0,plain,\n"

  private def documented(t: Throwable): Boolean = t match {
    case _: java.io.IOException => true
    case _: IllegalArgumentException => true
    case _: graft.GraftException => true
    case _ => false
  }

  private val interesting =
    "{}[]<>\"'@\\.;,()#%&^`|*+?$=:_- \n\t0123456789aZé中😀"

  private def mutate(doc: String, rnd: Random): String = {
    val sb = new StringBuilder(doc)
    (1 to 1 + rnd.nextInt(3)).foreach { _ =>
      if (sb.nonEmpty) rnd.nextInt(5) match {
        case 0 => sb.setCharAt(rnd.nextInt(sb.length),
          interesting.charAt(rnd.nextInt(interesting.length)))
        case 1 =>
          val at = rnd.nextInt(sb.length)
          sb.delete(at, math.min(sb.length, at + 1 + rnd.nextInt(3)))
        case 2 => sb.insert(rnd.nextInt(sb.length + 1),
          interesting.charAt(rnd.nextInt(interesting.length)))
        case 3 => sb.setLength(rnd.nextInt(sb.length + 1))
        case 4 =>
          val from = rnd.nextInt(sb.length)
          sb.insert(rnd.nextInt(sb.length + 1), sb.substring(from,
            math.min(sb.length, from + 1 + rnd.nextInt(8))))
      }
    }
    sb.toString
  }

  private val rounds =
    sys.env.get("GRAFT_FUZZ_ROUNDS").map(_.toInt).getOrElse(400)

  private def fuzz(name: String, contentType: String, doc: String): Unit =
    test(s"$name decoder: $rounds mutations parse or raise the documented error") {
      val rnd = new Random(name.hashCode ^ 20260815)
      (1 to rounds).foreach { i =>
        val mutated = mutate(doc, rnd)
        try {
          val d = ResultDecoders(contentType,
            new ByteArrayInputStream(mutated.getBytes(UTF_8)), vars)
          try { while (d.next()) d.get() } finally d.close()
        } catch {
          case t: Throwable if documented(t) => ()
          case t: Throwable =>
            fail(s"$name mutation $i leaked ${t.getClass.getName}: " +
              s"${t.getMessage}\n--- input:\n$mutated", t)
        }
      }
    }

  fuzz("json", "application/sparql-results+json", jsonDoc)
  fuzz("xml", "application/sparql-results+xml", xmlDoc)
  fuzz("tsv", "text/tab-separated-values", tsvDoc)
  fuzz("csv", "text/csv", csvDoc)
}
