package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.UriResolver

/** The reference's sphinx doctest table ported verbatim
  * (docs/uri_resolution_examples.rst:12-90). */
class UriResolverSpec extends AnyFunSuite {

  private val x = UriResolver(
    Map(
      "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
      "dc" -> "http://purl.org/dc/elements/1.1/"),
    "http://dbpedia.org/resource/")

  test("any_to_uri doctests") {
    assert(x.anyToUri("Curry") == "http://dbpedia.org/resource/Curry")
    assert(x.anyToUri("<Proton>") == "http://dbpedia.org/resource/Proton")
    assert(x.anyToUri("<..>") == "http://dbpedia.org/")
    assert(x.anyToUri("/ontology/Person") == "http://dbpedia.org/ontology/Person")
    assert(x.anyToUri("http://slashdot.org/") == "http://slashdot.org/")
    assert(x.anyToUri("<http://reddit.com/>") == "http://reddit.com/")
    assert(x.anyToUri("rdfs:Class") == "http://www.w3.org/2000/01/rdf-schema#Class")
    assert(x.anyToUri("dc:title") == "http://purl.org/dc/elements/1.1/title")
    assert(x.anyToUri("dc:Work/title") == "http://purl.org/dc/elements/1.1/Work/title")
  }

  test("humanize_uri doctests") {
    assert(x.humanizeUri("http://www.w3.org/2000/01/rdf-schema#Class") == "rdfs:Class")
    assert(x.humanizeUri("http://purl.org/dc/elements/1.1/title") == "dc:title")
    assert(x.humanizeUri("https://tonyortega.org/") == "<https://tonyortega.org/>")
    assert(x.humanizeUri("http://dbpedia.org/resource/Fishbone") == "<Fishbone>")
  }

  test("round trip: humanize ∘ any_to_uri is identity on QNames") {
    for (q <- Seq("rdfs:Class", "dc:title"))
      assert(x.humanizeUri(x.anyToUri(q)) == q)
  }
}
