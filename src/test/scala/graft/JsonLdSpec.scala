package graft

import graft.rdf._
import graft.sources.JsonLd
import graft.sources.JsonLd.JsonLdParseException

/** JSON-LD 1.1 reader/writer ([[graft.sources.JsonLd]]): context
  * processing, IRI expansion, value typing, lists/sets/maps, reverse
  * properties, named graphs, the two serializers and their round
  * trips. Fixture shapes follow the json-ld11 REC's own examples. */
class JsonLdSpec extends SparkSpec {

  private def triples(json: String, base: String = "") =
    JsonLd.parseTriples(json, base).toSet

  private def quads(json: String, base: String = "") =
    JsonLd.parseQuads(json, base).toSet

  private val EX = "http://example.com/"

  // ----------------------------------------------------------- contexts

  test("terms, compact IRIs and @vocab expand; @base resolves @id") {
    val doc = s"""{
      "@context": {
        "ex": "$EX",
        "name": "ex:name",
        "knows": {"@id": "ex:knows", "@type": "@id"},
        "@vocab": "http://voc.example/",
        "@base": "http://base.example/dir/"
      },
      "@id": "alice",
      "name": "Alice",
      "age": 31,
      "knows": "bob"
    }"""
    assert(triples(doc) == Set(
      (Iri("http://base.example/dir/alice"), Iri(EX + "name"),
        Lit.plain("Alice")),
      (Iri("http://base.example/dir/alice"), Iri("http://voc.example/age"),
        Lit("31", XSD.ns + "integer", null)),
      (Iri("http://base.example/dir/alice"), Iri(EX + "knows"),
        Iri("http://base.example/dir/bob"))))
  }

  test("a term definition may reference a term defined later (cycle-free)") {
    val doc = s"""{
      "@context": {
        "pred": {"@id": "ex:p"},
        "ex": "$EX"
      },
      "@id": "${EX}s",
      "pred": "v"
    }"""
    assert(triples(doc) ==
      Set((Iri(EX + "s"), Iri(EX + "p"), Lit.plain("v"))))
  }

  test("keyword aliases: id/type as @id/@type") {
    val doc = s"""{
      "@context": {"id": "@id", "type": "@type", "ex": "$EX"},
      "id": "ex:s",
      "type": "ex:Klass"
    }"""
    assert(triples(doc) ==
      Set((Iri(EX + "s"), Iri(RDF.ns + "type"), Iri(EX + "Klass"))))
  }

  test("a null term mapping drops the property; null values drop too") {
    val doc = s"""{
      "@context": {"ex": "$EX", "secret": null},
      "@id": "ex:s",
      "secret": "hidden",
      "ex:kept": null,
      "ex:p": "v"
    }"""
    assert(triples(doc) == Set((Iri(EX + "s"), Iri(EX + "p"), Lit.plain("v"))))
  }

  test("an @id value equal to a term is still a document-relative IRI") {
    val doc = s"""{
      "@context": {"name": "${EX}nameProp", "@base": "http://base.example/"},
      "@id": "name",
      "name": "v"
    }"""
    assert(triples(doc) == Set((Iri("http://base.example/name"),
      Iri(EX + "nameProp"), Lit.plain("v"))))
  }

  test("an UNMAPPED remote context is rejected loudly") {
    val e = intercept[JsonLdParseException](
      triples("""{"@context": "http://example.com/ctx.jsonld", "a": "b"}"""))
    assert(e.getMessage.contains("offline context map"), e.getMessage)
  }

  test("remote contexts resolve from the caller-supplied offline map") {
    val ctxDoc = s"""{"@context": {"ex": "$EX", "name": "ex:name"}}"""
    // a context document may itself reference another
    val chained = """{"@context": ["https://ctx.example/v1",
                                   {"age": "ex:age"}]}"""
    val doc = """{
      "@context": "https://ctx.example/v2",
      "@id": "ex:s", "name": "n", "age": 4
    }"""
    val ts = JsonLd.parseTriples(doc, contexts = Map(
      "https://ctx.example/v1" -> ctxDoc,
      "https://ctx.example/v2" -> chained)).toSet
    assert(ts == Set(
      (Iri(EX + "s"), Iri(EX + "name"), Lit.plain("n")),
      (Iri(EX + "s"), Iri(EX + "age"), Lit("4", XSD.ns + "integer", null))))
    // cyclic references fail loudly
    val cyc = """{"@context": "https://ctx.example/loop"}"""
    val e = intercept[JsonLdParseException](JsonLd.parseTriples(
      """{"@context": "https://ctx.example/loop", "a": "b"}""",
      contexts = Map("https://ctx.example/loop" -> cyc)))
    assert(e.getMessage.contains("cyclic"), e.getMessage)
  }

  // ------------------------------------------------------------- values

  test("native JSON typing: strings, booleans, integers, doubles") {
    val doc = s"""{
      "@id": "${EX}s",
      "${EX}str": "plain",
      "${EX}flag": true,
      "${EX}n": 42,
      "${EX}big": 12345678901234567890,
      "${EX}d": 2.5,
      "${EX}e": 1.1e1
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "s"), Iri(EX + "str"), Lit.plain("plain")),
      (Iri(EX + "s"), Iri(EX + "flag"), Lit("true", XSD.ns + "boolean", null)),
      (Iri(EX + "s"), Iri(EX + "n"), Lit("42", XSD.ns + "integer", null)),
      (Iri(EX + "s"), Iri(EX + "big"),
        Lit("12345678901234567890", XSD.ns + "integer", null)),
      (Iri(EX + "s"), Iri(EX + "d"), Lit("2.5E0", XSD.ns + "double", null)),
      (Iri(EX + "s"), Iri(EX + "e"), Lit("1.1E1", XSD.ns + "double", null))))
  }

  test("canonical xsd:double lexical forms") {
    assert(JsonLd.canonicalDouble(1.1) == "1.1E0")
    assert(JsonLd.canonicalDouble(11.0) == "1.1E1")
    assert(JsonLd.canonicalDouble(0.1) == "1.0E-1")
    assert(JsonLd.canonicalDouble(5.0) == "5.0E0")
    assert(JsonLd.canonicalDouble(-0.25) == "-2.5E-1")
    assert(JsonLd.canonicalDouble(1e21) == "1.0E21")
  }

  test("value objects: @type, @language; term and default @language") {
    val doc = s"""{
      "@context": {
        "@language": "en",
        "ex": "$EX",
        "fr": {"@id": "ex:fr", "@language": "fr"},
        "plain": {"@id": "ex:plain", "@language": null}
      },
      "@id": "ex:s",
      "ex:title": "Default",
      "fr": "Bonjour",
      "plain": "NoTag",
      "ex:typed": {"@value": "2024-01-01", "@type": "http://www.w3.org/2001/XMLSchema#date"},
      "ex:tagged": {"@value": "Hi", "@language": "EN-US"}
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "s"), Iri(EX + "title"), Lit.tagged("Default", "en")),
      (Iri(EX + "s"), Iri(EX + "fr"), Lit.tagged("Bonjour", "fr")),
      (Iri(EX + "s"), Iri(EX + "plain"), Lit.plain("NoTag")),
      (Iri(EX + "s"), Iri(EX + "typed"),
        Lit("2024-01-01", XSD.ns + "date", null)),
      // r14 policy: language tags are case-PRESERVED in every reader
      (Iri(EX + "s"), Iri(EX + "tagged"), Lit.tagged("Hi", "EN-US"))))
  }

  test("@value with both @type and @language is an error") {
    intercept[JsonLdParseException](triples(
      s"""{"@id": "${EX}s", "${EX}p":
          {"@value": "x", "@type": "${EX}t", "@language": "en"}}"""))
  }

  test("datatype coercion on native numbers (@type xsd:double)") {
    val doc = s"""{
      "@context": {"d": {"@id": "${EX}d",
        "@type": "http://www.w3.org/2001/XMLSchema#double"}},
      "@id": "${EX}s", "d": 5
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "s"), Iri(EX + "d"), Lit("5.0E0", XSD.ns + "double", null))))
  }

  // -------------------------------------------------- lists, sets, maps

  test("@list builds an rdf:List; empty list is rdf:nil") {
    val doc = s"""{
      "@context": {"seq": {"@id": "${EX}seq", "@container": "@list"}},
      "@id": "${EX}s",
      "seq": ["a", "b"],
      "${EX}none": {"@list": []}
    }"""
    val ts = triples(doc)
    assert(ts.exists { case (s, p, _) =>
      s == Iri(EX + "s") && p == Iri(EX + "none") }, ts)
    assert(ts.toSeq.count(_._2 == Iri(RDF.ns + "first")) == 2)
    // chain: s seq n1; n1 first "a"; n1 rest n2; n2 first "b"; n2 rest nil
    val Some((_, _, head)) = ts.find { case (s, p, _) =>
      s == Iri(EX + "s") && p == Iri(EX + "seq") }: @unchecked
    val Some((_, _, second)) = ts.find { case (s, p, _) =>
      s == head && p == Iri(RDF.ns + "rest") }: @unchecked
    assert(ts.contains((head, Iri(RDF.ns + "first"), Lit.plain("a"))))
    assert(ts.contains((second, Iri(RDF.ns + "first"), Lit.plain("b"))))
    assert(ts.contains((second, Iri(RDF.ns + "rest"), Iri(RDF.ns + "nil"))))
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "none"), Iri(RDF.ns + "nil"))))
  }

  test("@set flattens transparently") {
    val doc = s"""{
      "@id": "${EX}s",
      "${EX}p": {"@set": ["a", "b"]}
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "s"), Iri(EX + "p"), Lit.plain("a")),
      (Iri(EX + "s"), Iri(EX + "p"), Lit.plain("b"))))
  }

  test("language maps (@container @language) and index maps (@container @index)") {
    val doc = s"""{
      "@context": {
        "label": {"@id": "${EX}label", "@container": "@language"},
        "byIdx": {"@id": "${EX}v", "@container": "@index"}
      },
      "@id": "${EX}s",
      "label": {"en": "Queen", "de": ["Königin", "Her Majestät"]},
      "byIdx": {"a": 1, "b": [2, 3]}
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "s"), Iri(EX + "label"), Lit.tagged("Queen", "en")),
      (Iri(EX + "s"), Iri(EX + "label"), Lit.tagged("Königin", "de")),
      (Iri(EX + "s"), Iri(EX + "label"), Lit.tagged("Her Majestät", "de")),
      (Iri(EX + "s"), Iri(EX + "v"), Lit("1", XSD.ns + "integer", null)),
      (Iri(EX + "s"), Iri(EX + "v"), Lit("2", XSD.ns + "integer", null)),
      (Iri(EX + "s"), Iri(EX + "v"), Lit("3", XSD.ns + "integer", null))))
  }

  test("@container @id maps key node ids; own @id wins; @none is anonymous") {
    val doc = s"""{
      "@context": {"m": {"@id": "${EX}m", "@container": "@id"}},
      "@id": "${EX}s",
      "m": {
        "${EX}k1": {"${EX}v": 1},
        "${EX}k2": {"@id": "${EX}own", "${EX}v": 2},
        "@none": {"${EX}v": 3}
      }
    }"""
    val ts = triples(doc)
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "m"), Iri(EX + "k1"))))
    assert(ts.contains((Iri(EX + "k1"), Iri(EX + "v"),
      Lit("1", XSD.ns + "integer", null))))
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "m"), Iri(EX + "own"))))
    assert(!ts.exists(_._1 == Iri(EX + "k2")))
    val Some((_, _, anon)) = ts.find { case (s, p, o) =>
      s == Iri(EX + "s") && p == Iri(EX + "m") && o.isInstanceOf[Blank]
    }: @unchecked
    assert(ts.contains((anon, Iri(EX + "v"), Lit("3", XSD.ns + "integer", null))))
  }

  test("@container @type maps add a type from the key") {
    val doc = s"""{
      "@context": {"kind": {"@id": "${EX}kind", "@container": "@type"}},
      "@id": "${EX}s",
      "kind": {"${EX}Article": {"@id": "${EX}a"},
               "@none": "${EX}b"}
    }"""
    val ts = triples(doc)
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "kind"), Iri(EX + "a"))))
    assert(ts.contains((Iri(EX + "a"), Iri(RDF.ns + "type"),
      Iri(EX + "Article"))))
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "kind"), Iri(EX + "b"))))
    assert(!ts.exists { case (s, p, _) =>
      s == Iri(EX + "b") && p == Iri(RDF.ns + "type") })
  }

  test("property-scoped contexts apply at the use site and propagate") {
    val doc = s"""{
      "@context": {
        "ex": "$EX",
        "detail": {"@id": "ex:detail", "@context": {
          "name": "ex:scopedName",
          "@language": "fr"
        }}
      },
      "@id": "ex:s",
      "ex:name": "outer",
      "detail": {"@id": "ex:d", "name": "inner",
                 "ex:deeper": {"@id": "ex:dd", "name": "deepest"}}
    }"""
    val ts = triples(doc)
    // outside the scope, "name" is not a term and "outer" keeps no tag
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "name"), Lit.plain("outer"))))
    // inside: "name" maps to ex:scopedName and the default language
    // applies; the scope PROPAGATES into nested nodes (1.1 default)
    assert(ts.contains((Iri(EX + "d"), Iri(EX + "scopedName"),
      Lit.tagged("inner", "fr"))))
    assert(ts.contains((Iri(EX + "dd"), Iri(EX + "scopedName"),
      Lit.tagged("deepest", "fr"))))
  }

  test("type-scoped contexts activate on @type and do not propagate") {
    val doc = s"""{
      "@context": {
        "ex": "$EX",
        "Person": {"@id": "ex:Person",
                   "@context": {"name": "ex:personName"}}
      },
      "@id": "ex:p",
      "@type": "Person",
      "name": "Ada",
      "ex:knows": {"@id": "ex:q", "ex:name": "untyped child",
                   "name": "dropped — scope must not propagate"}
    }"""
    val ts = triples(doc)
    assert(ts.contains((Iri(EX + "p"), Iri(RDF.ns + "type"),
      Iri(EX + "Person"))))
    assert(ts.contains((Iri(EX + "p"), Iri(EX + "personName"),
      Lit.plain("Ada"))))
    // inside the child, "name" is no longer a term (scope reverted)
    assert(ts.contains((Iri(EX + "q"), Iri(EX + "name"),
      Lit.plain("untyped child"))))
    assert(!ts.exists { case (s, p, _) =>
      s == Iri(EX + "q") && p == Iri(EX + "personName") })
    // ...but a TYPED child re-activates it
    val doc2 = s"""{
      "@context": {
        "ex": "$EX",
        "Person": {"@id": "ex:Person",
                   "@context": {"name": "ex:personName"}}
      },
      "@id": "ex:p", "@type": "Person",
      "ex:knows": {"@id": "ex:q", "@type": "Person", "name": "child"}
    }"""
    assert(triples(doc2).contains((Iri(EX + "q"), Iri(EX + "personName"),
      Lit.plain("child"))))
  }

  test("@container @graph: each value lands in a fresh named graph the " +
      "property points at (r13 — closes the last container gap)") {
    val got = quads(
      s"""{"@context": {"m": {"@id": "${EX}m", "@container": "@graph"}},
           "@id": "${EX}s",
           "m": {"@id": "${EX}n", "${EX}p": "in-graph"}}""")
    val gname = got.collectFirst {
      case (s, p, o, _) if s == Iri(EX + "s") && p == Iri(EX + "m") => o
    }.getOrElse(fail(s"no membership triple in $got"))
    assert(gname.isInstanceOf[Blank], "simple @graph container names are fresh bnodes")
    assert(got.contains(
      (Iri(EX + "n"), Iri(EX + "p"), Lit.plain("in-graph"), Some(gname))))
    // a graph-id map: the key names the graph
    val got2 = quads(
      s"""{"@context": {"m": {"@id": "${EX}m",
             "@container": ["@graph", "@id"]}},
           "@id": "${EX}s",
           "m": {"${EX}g1": {"@id": "${EX}n", "${EX}p": "keyed"}}}""")
    assert(got2.contains((Iri(EX + "s"), Iri(EX + "m"), Iri(EX + "g1"), None)))
    assert(got2.contains(
      (Iri(EX + "n"), Iri(EX + "p"), Lit.plain("keyed"), Some(Iri(EX + "g1")))))
    // @graph combines only with @id/@index/@set
    intercept[JsonLdParseException](triples(
      s"""{"@context": {"m": {"@id": "${EX}m",
             "@container": ["@graph", "@language"]}},
           "@id": "${EX}s", "m": {}}"""))
  }

  // ------------------------------------------- nesting, reverse, graphs

  test("nested node objects get blank nodes; references join by @id") {
    val doc = s"""{
      "@id": "${EX}s",
      "${EX}child": {"${EX}name": "kid"},
      "${EX}ref": {"@id": "${EX}o"}
    }"""
    val ts = triples(doc)
    val Some((_, _, child)) = ts.find(_._2 == Iri(EX + "child")): @unchecked
    assert(child.isInstanceOf[Blank])
    assert(ts.contains((child, Iri(EX + "name"), Lit.plain("kid"))))
    assert(ts.contains((Iri(EX + "s"), Iri(EX + "ref"), Iri(EX + "o"))))
  }

  test("document blank-node labels are shared; distinct anonymous nodes differ") {
    val doc = s"""[
      {"@id": "_:b0", "${EX}p": {"@id": "_:b0"}},
      {"@id": "${EX}s", "${EX}q": {"${EX}r": 1}, "${EX}q2": {"${EX}r": 1}}
    ]"""
    val ts = triples(doc)
    val Some((b, _, b2)) = ts.find(_._2 == Iri(EX + "p")): @unchecked
    assert(b == b2)
    val Some((_, _, q)) = ts.find(_._2 == Iri(EX + "q")): @unchecked
    val Some((_, _, q2)) = ts.find(_._2 == Iri(EX + "q2")): @unchecked
    assert(q != q2)
  }

  test("@reverse key and reverse term definitions") {
    val doc = s"""{
      "@context": {
        "parentOf": {"@reverse": "${EX}childOf"}
      },
      "@id": "${EX}mom",
      "parentOf": {"@id": "${EX}kid"},
      "@reverse": {"${EX}employs": {"@id": "${EX}corp"}}
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "kid"), Iri(EX + "childOf"), Iri(EX + "mom")),
      (Iri(EX + "corp"), Iri(EX + "employs"), Iri(EX + "mom"))))
  }

  test("top-level @graph is the default graph; @id + @graph names one") {
    val doc = s"""{
      "@context": {"ex": "$EX"},
      "@graph": [
        {"@id": "ex:a", "ex:p": 1},
        {"@id": "ex:g1", "@graph": [{"@id": "ex:b", "ex:p": 2}]}
      ]
    }"""
    assert(quads(doc) == Set(
      (Iri(EX + "a"), Iri(EX + "p"), Lit("1", XSD.ns + "integer", null), None),
      (Iri(EX + "b"), Iri(EX + "p"), Lit("2", XSD.ns + "integer", null),
        Some(Iri(EX + "g1")))))
  }

  test("a graph-naming node can also carry its own properties") {
    val doc = s"""{
      "@id": "${EX}g",
      "${EX}author": "me",
      "@graph": [{"@id": "${EX}x", "${EX}p": "in"}]
    }"""
    assert(quads(doc) == Set(
      (Iri(EX + "g"), Iri(EX + "author"), Lit.plain("me"), None),
      (Iri(EX + "x"), Iri(EX + "p"), Lit.plain("in"), Some(Iri(EX + "g")))))
  }

  // ------------------------------------------------------------- errors

  test("malformed JSON and duplicate keys are rejected") {
    intercept[JsonLdParseException](triples("""{"a": """))
    intercept[JsonLdParseException](triples(
      s"""{"@id": "${EX}s", "${EX}p": 1, "${EX}p": 2}"""))
    intercept[JsonLdParseException](triples(""""just a string""""))
  }

  test("@type: @json builds rdf:JSON literals in JCS canonical form") {
    val doc = s"""{
      "@context": {"j": {"@id": "${EX}j", "@type": "@json"}},
      "@id": "${EX}s",
      "j": {"zeta": [1, true, null], "alpha": {"b": "x\\"y", "a": 2}}
    }"""
    assert(triples(doc) == Set((Iri(EX + "s"), Iri(EX + "j"),
      Lit("""{"alpha":{"a":2,"b":"x\"y"},"zeta":[1,true,null]}""",
        RDF.ns + "JSON", null))))
    // an ARRAY value is ONE literal, not per-item values
    val arr = s"""{
      "@context": {"j": {"@id": "${EX}j", "@type": "@json"}},
      "@id": "${EX}s", "j": [1, 2]
    }"""
    assert(triples(arr) == Set((Iri(EX + "s"), Iri(EX + "j"),
      Lit("[1,2]", RDF.ns + "JSON", null))))
    // explicit value-object form
    val vo = s"""{"@id": "${EX}s",
      "${EX}p": {"@value": {"k": 1}, "@type": "@json"}}"""
    assert(triples(vo) == Set((Iri(EX + "s"), Iri(EX + "p"),
      Lit("""{"k":1}""", RDF.ns + "JSON", null))))
    // non-integral numbers need the ES formatter — loud error
    intercept[JsonLdParseException](triples(
      s"""{"@context": {"j": {"@id": "${EX}j", "@type": "@json"}},
           "@id": "${EX}s", "j": {"k": 1.5}}"""))
  }

  test("rdf:JSON literals round-trip through serialize (native embed)") {
    val g = RdfGraph.fromTriples(spark, Seq(
      (Iri(EX + "s"), Iri(EX + "j"),
        Lit("""{"a":1,"b":[true,"x"]}""", RDF.ns + "JSON", null)),
      // a NON-canonical lexical must survive byte-exactly too
      (Iri(EX + "s"), Iri(EX + "k"),
        Lit("""{ "spaced": 1 }""", RDF.ns + "JSON", null))),
      Map("ex" -> EX))
    val text = JsonLd.serialize(g)
    assert(text.contains(""""@type" : "@json""""), text)
    assert(tripleSet(JsonLd.parse(text, spark)) == tripleSet(g))
  }

  test("@nest entries expand onto the parent node (incl. aliases)") {
    val doc = s"""{
      "@context": {"ex": "$EX", "meta": "@nest"},
      "@id": "ex:s",
      "meta": {"ex:a": 1, "@nest": {"ex:b": 2}},
      "ex:c": 3
    }"""
    assert(triples(doc) == Set(
      (Iri(EX + "s"), Iri(EX + "a"), Lit("1", XSD.ns + "integer", null)),
      (Iri(EX + "s"), Iri(EX + "b"), Lit("2", XSD.ns + "integer", null)),
      (Iri(EX + "s"), Iri(EX + "c"), Lit("3", XSD.ns + "integer", null))))
    // a nest object that is a value object is an error
    intercept[JsonLdParseException](triples(
      s"""{"@id": "${EX}s", "@nest": {"@value": "x"}}"""))
  }

  // -------------------------------------------------------- serializers

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  private def termOf(r: org.apache.spark.sql.Row): RdfTerm =
    r.getByte(0) match {
      case Terms.KIND_IRI => Iri(r.getString(1))
      case Terms.KIND_BLANK => Blank(r.getString(1))
      case Terms.KIND_TRIPLE => Terms.unpackString(r.getString(1))
      case _ => Lit(r.getString(1), r.getString(2), r.getString(3))
    }

  private def tripleSet(g: RdfGraph): Set[(RdfTerm, RdfTerm, RdfTerm)] =
    g.triples.collect().map { r =>
      (termOf(r.getStruct(0)), termOf(r.getStruct(1)), termOf(r.getStruct(2)))
    }.toSet

  private lazy val mixedGraph: RdfGraph = RdfGraph.fromTriples(spark, Seq(
    (Iri(EX + "s1"), Iri(RDF.ns + "type"), Iri(EX + "Klass")),
    (Iri(EX + "s1"), Iri(EX + "name"), Lit.plain("quote \" and \\ back\nline")),
    (Iri(EX + "s1"), Iri(EX + "rank"), Lit("7", XSD.ns + "integer", null)),
    (Iri(EX + "s1"), Iri(EX + "score"), Lit("2.5E0", XSD.ns + "double", null)),
    (Iri(EX + "s1"), Iri(EX + "odd"), Lit("007", XSD.ns + "integer", null)),
    (Iri(EX + "s1"), Iri(EX + "label"), Lit.tagged("étiquette", "fr")),
    (Blank("b1"), Iri(EX + "knows"), Iri(EX + "s1")),
    (Blank("b1"), Iri(EX + "age"), Lit("3", XSD.ns + "integer", null))),
    Map("ex" -> EX))

  test("serialize → parse fixpoint on a mixed graph (compacted form)") {
    val text = JsonLd.serialize(mixedGraph)
    assert(text.contains("\"ex:rank\" : 7"), text) // native canonical int
    assert(text.contains("\"@type\" : \"ex:Klass\""), text)
    // non-canonical "007" must NOT go native
    assert(text.contains("007"), text)
    val back = JsonLd.parse(text, spark)
    assert(tripleSet(back) == tripleSet(mixedGraph))
  }

  test("serialize → parse fixpoint on a quad store") {
    val g = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), Iri(EX + "p"), Lit.plain("x"), None),
      (Iri(EX + "b"), Iri(EX + "p"), Lit.plain("y"), Some(Iri(EX + "g1"))),
      (Blank("n"), Iri(EX + "p"), Blank("n"), Some(Iri(EX + "g1"))),
      (Iri(EX + "c"), Iri(EX + "p"), Lit("1", XSD.ns + "integer", null),
        Some(Blank("gb")))),
      Map("ex" -> EX))
    val back = JsonLd.parse(JsonLd.serialize(g), spark)
    def quadSet(x: RdfGraph) = x.triples.collect().map { r =>
      (termOf(r.getStruct(0)), termOf(r.getStruct(1)), termOf(r.getStruct(2)),
        if (r.isNullAt(3)) null else termOf(r.getStruct(3)))
    }.toSet
    assert(quadSet(back) == quadSet(g))
  }

  test("compact under a user context applies coercions and round-trips") {
    val g = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "s"), Iri(EX + "knows"), Iri(EX + "o"), None),
      (Iri(EX + "s"), Iri(EX + "knows"), Blank("friend"), None),
      (Iri(EX + "s"), Iri(EX + "age"), Lit("41", XSD.ns + "integer", null),
        None),
      (Iri(EX + "s"), Iri(EX + "label"), Lit.tagged("hello", "en"), None),
      (Iri(EX + "s"), Iri(EX + "other"), Lit.tagged("salut", "fr"), None),
      (Iri(EX + "s"), Iri(RDF.ns + "type"), Iri(EX + "Person"), None),
      (Iri(EX + "s"), Iri(EX + "plain"), Lit.plain("bare"), None),
      (Iri(EX + "x"), Iri(EX + "p"), Lit("7", XSD.ns + "integer", null),
        Some(Iri(EX + "g1")))))
    val ctx = s"""{
      "@context": {
        "ex": "$EX",
        "@vocab": "$EX",
        "knows": {"@id": "ex:knows", "@type": "@id"},
        "age": {"@id": "ex:age",
                "@type": "http://www.w3.org/2001/XMLSchema#integer"},
        "label": {"@id": "ex:label", "@language": "en"}
      }
    }"""
    val text = JsonLd.compact(g, ctx)
    // coerced renderings
    assert(text.contains(""""knows" : [ "ex:o", "_:friend" ]""") ||
      text.contains(""""knows" : [ "_:friend", "ex:o" ]"""), text)
    assert(text.contains(""""age" : 41"""), text)
    assert(text.contains(""""label" : "hello""""), text)
    // non-matching language stays an explicit value object
    assert(text.contains(""""@language" : "fr""""), text)
    // @vocab suffix for an unmapped property; term for the type
    assert(text.contains(""""plain" : "bare""""), text)
    assert(text.contains(""""@type" : "Person""""), text)
    // the full graph round-trips bit-exactly (quads included)
    def quadSet(x: RdfGraph) = x.triples.collect().map { r =>
      (termOf(r.getStruct(0)), termOf(r.getStruct(1)), termOf(r.getStruct(2)),
        if (r.isNullAt(3)) null else termOf(r.getStruct(3)))
    }.toSet
    assert(quadSet(JsonLd.parse(text, spark)) == quadSet(g))
  }

  test("compact with a default @language keeps plain strings explicit") {
    val g = RdfGraph.fromTriples(spark, Seq(
      (Iri(EX + "s"), Iri(EX + "p"), Lit.plain("untagged")),
      (Iri(EX + "s"), Iri(EX + "q"), Lit.tagged("tagged", "en"))))
    val text = JsonLd.compact(g,
      s"""{"ex": "$EX", "@language": "en", "@vocab": "$EX"}""")
    // the tagged value may render bare (default language matches); the
    // PLAIN one must stay an explicit value object or it would re-parse
    // tagged
    assert(tripleSet(JsonLd.parse(text, spark)) == tripleSet(g))
    assert(text.contains(""""q" : "tagged""""), text)
    assert(text.contains(""""@value" : "untagged""""), text)
  }

  test("quoted triples are rejected by both serializers") {
    val g = RdfGraph.fromTriples(spark, Seq(
      (Iri(EX + "m"), Iri(EX + "about"),
        QuotedTriple(Iri(EX + "s"), Iri(EX + "p"), Lit.plain("o")))))
    intercept[Exception](JsonLd.serialize(g))
    intercept[Exception](JsonLd.write(g, tmpDir("jldq")))
  }

  test("JsonLd.write round-trips a 6k-triple graph across part files") {
    val base = (0 until 2000).flatMap { i =>
      val s: RdfTerm =
        if (i % 7 == 0) Blank(s"b$i") else Iri(s"${EX}s$i")
      Seq(
        (s, Iri(EX + "name"), Lit.plain(s"""name "$i"\nline\t\\end""")),
        (s, Iri(EX + "rank"), Lit(i.toString, XSD.ns + "integer", null)),
        (s, Iri(EX + "label"), Lit.tagged(s"étiquette $i", "fr")))
    }
    val g = RdfGraph.fromTriples(spark, base, Map("ex" -> EX))
    val out = tmpDir("jldw")
    JsonLd.write(g, out, numPartitions = 8)
    val files = new java.io.File(out).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(files.length > 1, "expected multiple part files")
    // every part is a standalone-valid JSON document
    files.foreach { f =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      assert(m.readTree(java.nio.file.Files.readString(f.toPath)).isArray,
        f.getName)
    }
    assert(tripleSet(JsonLd.read(spark, out)) == tripleSet(g))
  }

  test("JsonLd.write round-trips a quad store (named-graph wrapping)") {
    val g = RdfGraph.fromQuads(spark, (0 until 500).map { i =>
      (Iri(s"${EX}s${i % 50}"), Iri(EX + "p"),
        Lit(i.toString, XSD.ns + "integer", null),
        if (i % 3 == 0) None else Some(Iri(s"${EX}g${i % 4}")))
    }, Map("ex" -> EX))
    val out = tmpDir("jldwq")
    JsonLd.write(g, out, numPartitions = 4)
    def quadSet(x: RdfGraph) = x.triples.collect().map { r =>
      (termOf(r.getStruct(0)), termOf(r.getStruct(1)), termOf(r.getStruct(2)),
        if (r.isNullAt(3)) null else termOf(r.getStruct(3)))
    }.toSet
    assert(quadSet(JsonLd.read(spark, out)) == quadSet(g))
  }

  test("a labeled bnode split across part files stays one node on read") {
    // bnode _:x is subject of many triples and object of others — with 8
    // hash partitions its subject-group and the groups referencing it
    // land in different parts; concatenation semantics must rejoin them
    val ts: Seq[(RdfTerm, RdfTerm, RdfTerm)] =
      (0 until 100).map(i =>
        (Blank("x"), Iri(EX + "n"),
          Lit(i.toString, XSD.ns + "integer", null)): (RdfTerm, RdfTerm, RdfTerm)) ++
      (0 until 100).map(i =>
        (Iri(s"${EX}r$i"), Iri(EX + "to"), Blank("x")): (RdfTerm, RdfTerm, RdfTerm))
    val g = RdfGraph.fromTriples(spark, ts)
    val out = tmpDir("jldb")
    JsonLd.write(g, out, numPartitions = 8)
    val back = JsonLd.read(spark, out)
    val bnodeSubjects = tripleSet(back).collect {
      case (b: Blank, _, _) => b }
    assert(bnodeSubjects.toSet.size == 1, "bnode split across parts")
    assert(tripleSet(back).size == 200)
  }
}
