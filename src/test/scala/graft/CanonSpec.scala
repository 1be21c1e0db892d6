package graft

import graft.rdf._
import graft.rdf.Canon.Quad

/** RDFC-1.0 dataset canonicalization ([[graft.rdf.Canon]]). The
  * load-bearing property is label/order INDEPENDENCE: the canonical
  * form of a dataset must be bit-identical under any input blank-node
  * relabeling and any statement order — that is what makes it a
  * content address and an isomorphism decider. Cases cover the REC's
  * algorithm branches: no bnodes, unique first-degree hashes, shared
  * hashes resolved by N-degree (cycles), fully symmetric twins, quads
  * with bnode graph names, and the poison-graph work cap. */
class CanonSpec extends SparkSpec {

  private val EX = "http://example.com/"
  private def iri(s: String) = Iri(EX + s)
  private def q(s: RdfTerm, p: RdfTerm, o: RdfTerm, g: RdfTerm = null): Quad =
    (s, p, o, g)

  private def relabel(quads: Seq[Quad], f: String => String): Seq[Quad] = {
    def m(t: RdfTerm): RdfTerm = t match {
      case Blank(l) => Blank(f(l))
      case QuotedTriple(s, p, o) => QuotedTriple(m(s), m(p), m(o))
      case other => other
    }
    quads.map { case (s, p, o, g) =>
      (m(s), m(p), m(o), if (g == null) null else m(g))
    }
  }

  test("ground datasets canonicalize to their sorted N-Quads") {
    val quads = Seq(
      q(iri("b"), iri("p"), Lit.plain("x")),
      q(iri("a"), iri("p"), Lit("1", XSD.ns + "integer", null)))
    assert(Canon.canonicalNQuads(quads) ==
      s"""<${EX}a> <${EX}p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
         |<${EX}b> <${EX}p> "x" .
         |""".stripMargin)
  }

  test("unique first-degree hashes issue c14n labels in hash order") {
    val quads = Seq(
      q(Blank("x"), iri("p"), Lit.plain("one")),
      q(Blank("y"), iri("p"), Lit.plain("two")))
    val labels = Canon.canonicalLabels(quads)
    assert(labels.keySet == Set("x", "y"))
    assert(labels.values.toSet == Set("c14n0", "c14n1"))
    // label independence: renaming + reordering yields the same doc
    val renamed = relabel(quads, l => "zz" + l.reverse).reverse
    assert(Canon.canonicalNQuads(renamed) == Canon.canonicalNQuads(quads))
  }

  test("a bnode cycle (shared first-degree hashes) canonicalizes stably") {
    // _:a :next _:b . _:b :next _:a . with distinguishing payloads
    val quads = Seq(
      q(Blank("a"), iri("next"), Blank("b")),
      q(Blank("b"), iri("next"), Blank("a")),
      q(Blank("a"), iri("val"), Lit.plain("A")),
      q(Blank("b"), iri("val"), Lit.plain("B")))
    val doc = Canon.canonicalNQuads(quads)
    val renamed = relabel(quads.reverse, {
      case "a" => "b"; case "b" => "a"; case l => l
    })
    assert(Canon.canonicalNQuads(renamed) == doc)
    // the payloads break symmetry: "A" must always sit on the same
    // canonical label
    assert(doc.linesIterator.exists(l =>
      l.contains(""""A"""") && l.startsWith("_:c14n")), doc)
  }

  test("fully symmetric twins still produce one canonical form") {
    // two interchangeable bnodes — any bijection is valid, the
    // canonical DOCUMENT must not depend on which is which
    val quads = Seq(
      q(Blank("p"), iri("p"), Lit.plain("same")),
      q(Blank("q"), iri("p"), Lit.plain("same")))
    val doc = Canon.canonicalNQuads(quads)
    assert(doc == Canon.canonicalNQuads(
      relabel(quads, { case "p" => "1"; case _ => "0" })))
    assert(doc.linesIterator.size == 2)
  }

  test("a 4-cycle needs the N-degree permutation walk and stays stable") {
    def cycle(names: Seq[String]): Seq[Quad] =
      names.indices.map(i => q(Blank(names(i)), iri("n"),
        Blank(names((i + 1) % names.size))))
    val doc = Canon.canonicalNQuads(cycle(Seq("a", "b", "c", "d")))
    assert(doc == Canon.canonicalNQuads(cycle(Seq("w", "k", "z", "m"))))
    assert(doc == Canon.canonicalNQuads(cycle(Seq("d", "c", "b", "a"))))
    assert(doc.linesIterator.size == 4)
  }

  test("bnode graph names participate in canonical labeling") {
    val quads = Seq(
      q(iri("s"), iri("p"), Lit.plain("in"), Blank("g")),
      q(Blank("g"), iri("author"), Lit.plain("me")))
    val labels = Canon.canonicalLabels(quads)
    assert(labels.keySet == Set("g"))
    val doc = Canon.canonicalNQuads(quads)
    assert(doc.contains(s"""<${EX}s> <${EX}p> "in" _:c14n0 ."""), doc)
  }

  test("isomorphic decides bijection; non-isomorphic shapes differ") {
    val chain = Seq(
      q(Blank("a"), iri("n"), Blank("b")),
      q(Blank("b"), iri("n"), Blank("c")))
    val chain2 = relabel(chain, l => l + "!")
    assert(Canon.isomorphic(chain, chain2))
    val fork = Seq(
      q(Blank("a"), iri("n"), Blank("b")),
      q(Blank("a"), iri("n"), Blank("c")))
    assert(!Canon.isomorphic(chain, fork))
    // same shape, different ground payload
    assert(!Canon.isomorphic(chain,
      chain :+ q(iri("x"), iri("p"), Lit.plain("extra"))))
  }

  test("datasetHash is stable under relabel+reorder and shape-sensitive") {
    val quads = Seq(
      q(Blank("a"), iri("n"), Blank("b")),
      q(Blank("b"), iri("v"), Lit.tagged("hé", "fr")),
      q(iri("s"), iri("p"), Blank("a"), iri("g1")))
    val h = Canon.datasetHash(quads)
    assert(h == Canon.datasetHash(relabel(quads.reverse, l => l * 3)))
    assert(h != Canon.datasetHash(quads.tail))
    assert(h.matches("[0-9a-f]{64}"))
  }

  test("a long symmetric bnode chain fails loudly, never StackOverflow") {
    // every interior node of an unlabeled chain is first-degree
    // identical, so N-degree hashing recurses node-by-node — the depth
    // guard must convert that into a CanonException
    val n = 5000
    val quads = (0 until n).map(i =>
      q(Blank(s"c$i"), iri("n"), Blank(s"c${i + 1}")))
    intercept[Canon.CanonException](Canon.canonicalLabels(quads,
      maxSteps = Long.MaxValue))
  }

  test("a long chain WITH distinguishing payloads canonicalizes fine") {
    // payloads make every first-degree hash unique — no N-degree pass,
    // linear work, no recursion
    val n = 5000
    val quads = (0 until n).flatMap(i => Seq(
      q(Blank(s"c$i"), iri("n"), Blank(s"c${i + 1}")),
      q(Blank(s"c$i"), iri("v"), Lit(i.toString, XSD.ns + "integer", null))))
    val labels = Canon.canonicalLabels(quads)
    assert(labels.size == n + 1)
    assert(Canon.canonicalNQuads(quads) ==
      Canon.canonicalNQuads(relabel(quads.reverse, l => "x" + l)))
  }

  test("the work cap rejects poison graphs loudly") {
    // K_n on bnodes with one predicate: all first-degree hashes equal,
    // the permutation walk explodes — must throw, not spin
    val n = 9
    val quads = for (i <- 0 until n; j <- 0 until n if i != j)
      yield q(Blank(s"b$i"), iri("e"), Blank(s"b$j"))
    intercept[Canon.CanonException](
      Canon.canonicalLabels(quads, maxSteps = 200000L))
  }

  test("RdfGraph wrappers: canonicalNQuads / isomorphic / datasetHash") {
    val g1 = RdfGraph.fromTriples(spark, Seq(
      (Blank("x"), iri("p"), Lit.plain("v")),
      (iri("s"), iri("q"), Blank("x"))))
    val g2 = RdfGraph.fromTriples(spark, Seq(
      (iri("s"), iri("q"), Blank("other")),
      (Blank("other"), iri("p"), Lit.plain("v"))))
    assert(g1.isomorphic(g2))
    assert(g1.datasetHash() == g2.datasetHash())
    assert(g1.canonicalNQuads().contains("_:c14n0"))
    val g3 = RdfGraph.fromTriples(spark, Seq(
      (Blank("x"), iri("p"), Lit.plain("DIFFERENT"))))
    assert(!g1.isomorphic(g3))
  }

  test("canonicalLines (distributed) matches the driver canonical form") {
    val g = RdfGraph.fromQuads(spark, Seq(
      (iri("a"), iri("p"), Lit.plain("x\ny \"q\" \\z\tend"), None),
      (iri("b"), iri("p"), Lit.tagged("é", "fr"), Some(iri("g1"))),
      (Blank("n"), iri("p"), Blank("m"), None),
      (Blank("m"), iri("q"), Lit("2", XSD.ns + "integer", null),
        Some(Blank("gb"))),
      (iri("meta"), iri("about"),
        QuotedTriple(iri("s"), iri("p"), Lit.plain("o")), None),
      (iri("c"), iri("p"), Lit("1", XSD.ns + "integer", null), None)))
    val lines = Canon.canonicalLines(g).collect().map(_.getString(0)).sorted
    val expected = g.canonicalNQuads().linesIterator.toSeq
    assert(lines.toSeq == expected)
  }

  test("canonicalLines on a plain triple store; writeCanonical sink") {
    val g = RdfGraph.fromTriples(spark, Seq(
      (iri("s"), iri("p"), Lit.plain("v")),
      (Blank("x"), iri("p"), iri("s"))))
    assert(Canon.canonicalLines(g).collect().map(_.getString(0)).sorted
      .mkString("", "\n", "\n") == g.canonicalNQuads())
    val dir = java.nio.file.Files.createTempDirectory("canonw")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("out").toString
    Canon.writeCanonical(g, out)
    val files = new java.io.File(out).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).sortBy(_.getName)
    val doc = files.map(f => java.nio.file.Files.readString(f.toPath))
      .mkString
    assert(doc == g.canonicalNQuads())
  }

  test("canonicalLines dedupes duplicate ground rows like the driver form") {
    // a store built from an arbitrary frame can carry duplicate rows
    // (set semantics are a loader property) — the distributed document
    // must still byte-match the driver serializer, which dedupes
    val one = RdfGraph.fromTriples(spark, Seq(
      (iri("s"), iri("p"), Lit.plain("v")),
      (iri("s2"), iri("p"), Lit.plain("w"))))
    val dup = one.copy(triples = one.triples.unionByName(one.triples))
    assert(Canon.canonicalLines(dup).collect().map(_.getString(0)).sorted
      .mkString("", "\n", "\n") == one.canonicalNQuads())
  }

  test("datasetHashDistributed == driver datasetHash (ground, bnodes, " +
      "quads, duplicates)") {
    // ground-only triple store
    val ground = RdfGraph.fromTriples(spark, Seq(
      (iri("s"), iri("p"), Lit.plain("v")),
      (iri("s2"), iri("p"), Lit("1", XSD.ns + "integer", null))))
    assert(ground.datasetHashDistributed() == ground.datasetHash())
    // bnode-bearing quad store (labels must canonicalize identically)
    val mixed = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("n"), iri("p"), Blank("m"), None),
      (Blank("m"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "fr"), Some(iri("g1")))))
    assert(mixed.datasetHashDistributed() == mixed.datasetHash())
    // relabeling must not move the distributed address either
    val relabeled = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("zz"), iri("p"), Blank("qq"), None),
      (Blank("qq"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "fr"), Some(iri("g1")))))
    assert(relabeled.datasetHashDistributed() ==
      mixed.datasetHashDistributed())
    // duplicate ground rows hash like the deduped driver form
    val dupd = ground.copy(
      triples = ground.triples.unionByName(ground.triples))
    assert(dupd.datasetHashDistributed() == ground.datasetHash())
  }

  test("merkleHash: deterministic under repartitioning + relabeling, " +
      "recomputable from the written canonical document") {
    val mixed = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("n"), iri("p"), Blank("m"), None),
      (Blank("m"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "fr"), Some(iri("g1")))))
    val h = mixed.merkleHash()
    // physical layout must not move the address: content buckets, not
    // partition boundaries, decide the segments
    val shuffled = mixed.copy(triples = mixed.triples.repartition(7))
    assert(shuffled.merkleHash() == h)
    val coalesced = mixed.copy(triples = mixed.triples.coalesce(1))
    assert(coalesced.merkleHash() == h)
    // blank-node relabeling must not move it either (RDFC lines)
    val relabeled = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("zz"), iri("p"), Blank("qq"), None),
      (Blank("qq"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "fr"), Some(iri("g1")))))
    assert(relabeled.merkleHash() == h)
    // write → read-back → merkleHashOfLines gives the same root, so a
    // catalog can verify a stored canonical document without the graph
    val dir = java.nio.file.Files.createTempDirectory("graft_merkle").toString
    Canon.writeCanonical(mixed, s"$dir/canon")
    assert(Canon.merkleHashOfLines(
      spark.read.text(s"$dir/canon").toDF("line")) == h)
    // fanout is part of the address space; a one-quad delta moves it
    assert(mixed.merkleHash(fanout = 16) != h)
    val delta = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("n"), iri("p"), Blank("m"), None),
      (Blank("m"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "FR"), Some(iri("g1")))))
    assert(delta.merkleHash() != h)
    // and it is a DIFFERENT address space from the document hash
    assert(h != mixed.datasetHash())
  }

  test("merkleHash two-level tree: fanouts past 4096 stay deterministic") {
    // past 4096 the root goes through the two-level segment tree (leaf
    // buckets on 24 hash bits, ≤4096 parents digested distributed) —
    // the 100 TB escape hatch from ~25 GB/segment at the default fanout
    val g = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("n"), iri("p"), Blank("m"), None),
      (Blank("m"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "fr"), Some(iri("g1")))))
    val wide = g.merkleHash(fanout = 65536)
    // deterministic: recompute, and under a different physical layout
    assert(g.merkleHash(fanout = 65536) == wide)
    assert(g.copy(triples = g.triples.repartition(5))
      .merkleHash(fanout = 65536) == wide)
    // a different fanout is a different address — both across the
    // 4096 boundary and between two wide fanouts
    assert(wide != g.merkleHash())
    assert(wide != g.merkleHash(fanout = 65537))
    // a one-quad delta moves the wide root too
    val delta = RdfGraph.fromQuads(spark, Seq(
      (Iri(EX + "a"), iri("p"), Lit.plain("x"), None),
      (Blank("n"), iri("p"), Blank("m"), None),
      (Blank("m"), iri("q"), Lit.plain("y"), Some(iri("g1"))),
      (iri("b"), iri("p"), Lit.tagged("é", "FR"), Some(iri("g1")))))
    assert(delta.merkleHash(fanout = 65536) != wide)
    // recomputable from the written canonical document at any fanout
    val dir = java.nio.file.Files.createTempDirectory("graft_merkle2").toString
    Canon.writeCanonical(g, s"$dir/canon")
    assert(Canon.merkleHashOfLines(
      spark.read.text(s"$dir/canon").toDF("line"), fanout = 65536) == wide)
    // the ceiling is enforced
    intercept[IllegalArgumentException] {
      g.merkleHash(fanout = 4096 * 4096 + 1)
    }
  }

  test("RdfGraph.diff: exclusive rows each side, null-safe on graph names") {
    val a = RdfGraph.fromQuads(spark, Seq(
      (iri("s1"), iri("p"), Lit.plain("shared"), None),
      (iri("s2"), iri("p"), Lit.plain("only-a"), None),
      (iri("s3"), iri("p"), Lit.plain("g-shared"), Some(iri("g1")))))
    val b = RdfGraph.fromQuads(spark, Seq(
      (iri("s1"), iri("p"), Lit.plain("shared"), None),
      (iri("s3"), iri("p"), Lit.plain("g-shared"), Some(iri("g1"))),
      (iri("s4"), iri("p"), Lit.plain("only-b"), Some(iri("g2")))))
    val (onlyA, onlyB) = a.diff(b)
    assert(onlyA.collect().map(_.getStruct(2).getString(1)).toSet ==
      Set("only-a"))
    assert(onlyB.collect().map(_.getStruct(2).getString(1)).toSet ==
      Set("only-b"))
    // identical stores diff to nothing (the default-graph null rows
    // must match null-safely)
    val (e1, e2) = a.diff(a)
    assert(e1.isEmpty && e2.isEmpty)
  }

  test("quoted triples canonicalize (bnodes inside the quotation)") {
    val quads = Seq(
      q(QuotedTriple(Blank("inner"), iri("p"), Lit.plain("o")),
        iri("certainty"), Lit("0.9", XSD.ns + "double", null)),
      q(Blank("inner"), iri("name"), Lit.plain("n")))
    val doc = Canon.canonicalNQuads(quads)
    assert(doc == Canon.canonicalNQuads(
      relabel(quads, l => l + "_renamed").reverse))
    assert(doc.contains("<< _:c14n0"), doc)
  }
}
