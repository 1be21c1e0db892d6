package graft

/** End-to-end port of Inference_Over_RDF_Containers.ipynb: the races
  * fixture (cell 5), the forward-chaining container-inference rules
  * (cells 17/26/30), and the committed query outputs. Citations are cell
  * numbers in the reference notebook. */
class InferenceGoldenSpec extends SparkSpec {

  private val racesTtl = """
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    @prefix : <http://example.com/> .
    :tioga_downs_2017_08_14
        a rdf:Seq ;
        rdf:_1 :race_1 ;
        rdf:_2 :race_2 ;
        rdf:_3 :race_3 .
    :race_1
        a rdf:Seq ;
        rdf:_1 "PRINCE ADIRAN" ;
        rdf:_2 "KDMAKEWAY" ;
        rdf:_3 "ANDERSON VALLEY" ;
        rdf:_4 "SETTINEMONFIRE" ;
        rdf:_5 "TRILLIONAIR" ;
        rdf:_6 "OZZY BLUE CHIP" .
    :race_2
        a rdf:Seq ;
        rdf:_1 "MACHMEMACKIE" ;
        rdf:_2 "FREE LOVE" ;
        rdf:_3 "FRANKIES DRAGON" ;
        rdf:_4 "IM AN ART MAJOR" ;
        rdf:_5 "GOLD STAR SPIKE" ;
        rdf:_6 "F TWENTY TWO" ;
        rdf:_7 "TAILGUNNER HANOVER" .
    :race_3
        a rdf:Seq ;
        rdf:_1 "LYONS JOHNNY" ;
        rdf:_2 "BETTORSLUCKYSTREAK" ;
        rdf:_3 "DASH OF DANGER" ;
        rdf:_4 "NEPTUNE" ;
        rdf:_5 "WINYARD HANOVER" ;
        rdf:_6 "DEE'S ROCKETMAN" .
  """

  private def freshRaces(): Engine = {
    val e = Engine.inline(racesTtl)
    e.bindNamespace("", "http://example.com/")
    e
  }

  private def rule1(e: Engine): Unit = e.update("""
    INSERT { ?p a rdfs:ContainerMembershipProperty . }
    WHERE { ?s ?p ?o .
      FILTER(REGEX(STR(?p),"^http://www[.]w3[.]org/1999/02/22-rdf-syntax-ns#_[1-9]([0-9])*$")) }""")

  private def rule2(e: Engine): Unit = e.update("""
    INSERT { ?container rdfs:member ?member . }
    WHERE { ?container ?cmp ?member .
      ?cmp a rdfs:ContainerMembershipProperty . }""")

  private lazy val races: Engine = {
    val e = freshRaces(); rule1(e); rule2(e); e.graph = e.graph.cache(); e
  }

  test("2-hop STRSTARTS query finds all 19 horses (cell 8)") {
    val e = freshRaces()
    val df = e.select("""
      SELECT ?horse {
        :tioga_downs_2017_08_14 ?p1 ?race . ?race ?p2 ?horse .
        FILTER(STRSTARTS(STR(?p1),"http://www.w3.org/1999/02/22-rdf-syntax-ns#_"))
        FILTER(STRSTARTS(STR(?p2),"http://www.w3.org/1999/02/22-rdf-syntax-ns#_")) }""")
    assert(df.count() == 19)
  }

  test("rule_1 classifies exactly rdf:_1..rdf:_7 (cell 19)") {
    val df = races.select(
      "SELECT ?p { ?p a rdfs:ContainerMembershipProperty } ORDER BY ?p")
    val ps = df.collect().map(_.getString(0)).toSeq
    assert(ps.toSet == (1 to 7).map(i => s"rdf:_$i").toSet)
  }

  test("2-hop via inferred classes finds 19 horses (cell 21)") {
    val df = races.select("""
      SELECT ?horse {
        :tioga_downs_2017_08_14 ?p1 ?race . ?p1 a rdfs:ContainerMembershipProperty .
        ?race ?p2 ?horse . ?p2 a rdfs:ContainerMembershipProperty . }""")
    assert(df.count() == 19)
  }

  test("rule_2 derives rdfs:member for all 4 containers (cell 28)") {
    val df = races.select(
      "SELECT DISTINCT ?list { ?list rdfs:member ?member }")
    assert(df.count() == 4)
  }

  test("race_2 has 7 members (cell 41)") {
    val n = Engine.one(races.select(
      "SELECT (COUNT(*) AS ?count) { :race_2 rdfs:member ?member }"))
    assert(n == 7L)
  }

  test("set semantics collapse duplicate members to 1 but keep 3 CMP triples (cells 43-48)") {
    val e = Engine.inline("""
      @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
      @prefix : <http://example.com/> .
      :three_cheers a rdf:Seq ;
        rdf:_1 "cheer!" ; rdf:_2 "cheer!" ; rdf:_3 "cheer!" .""")
    e.bindNamespace("", "http://example.com/")
    rule1(e); rule2(e)
    val member = Engine.one(e.select(
      "SELECT (COUNT(*) AS ?count) { :three_cheers rdfs:member ?member }"))
    assert(member == 1L) // rdfs:member is a SET → one triple
    val cmp = Engine.one(e.select(
      """SELECT (COUNT(*) AS ?count) { :three_cheers ?p ?member .
           ?p a rdfs:ContainerMembershipProperty }"""))
    assert(cmp == 3L) // the three positional triples survive
  }

  test("property path member/member reaches 19 horses (cell 51)") {
    val df = races.select(
      "SELECT ?horse { :tioga_downs_2017_08_14 rdfs:member/rdfs:member ?horse }")
    assert(df.count() == 19)
  }

  test("inverse-head path from a literal: F TWENTY TWO's race mates (cell 56)") {
    val df = races.select("""
      SELECT ?horse { "F TWENTY TWO" ^rdfs:member/rdfs:member ?horse }""")
    assert(df.collect().map(_.getString(0)).toSet.size == 7) // race_2 field
  }

  test("rdfs:member+ closure = 3 races + 19 horses (cell 58)") {
    val df = races.select(
      "SELECT ?member { :tioga_downs_2017_08_14 rdfs:member+ ?member }")
    assert(df.count() == 22)
  }

  test("anonymous blank-node pattern counts 19 (cell 61)") {
    val n = Engine.one(races.select("""
      SELECT (COUNT(*) AS ?count) {
        :tioga_downs_2017_08_14 ?p1 [ ?p2 ?horse ] .
        ?p1 a rdfs:ContainerMembershipProperty .
        ?p2 a rdfs:ContainerMembershipProperty . }"""))
    assert(n == 19L)
  }

  test("races with win/place/show projection (cell 64)") {
    val df = races.select("""
      SELECT ?race ?win ?place ?show {
        ?race ^rdfs:member :tioga_downs_2017_08_14 ;
              rdf:_1 ?win ; rdf:_2 ?place ; rdf:_3 ?show . }""")
    assert(df.count() == 3)
  }

  test("subquery + FILTER(?count=6) finds the two 6-horse races (cell 73)") {
    val df = races.select("""
      SELECT ?race {
        { SELECT ?race (COUNT(*) AS ?count) {
            ?race ^rdfs:member :tioga_downs_2017_08_14 ; ?rdfN ?horse .
            ?rdfN a rdfs:ContainerMembershipProperty . } GROUP BY ?race }
        FILTER(?count = 6) }""")
    val rs = df.collect().map(_.getString(0)).toSet
    assert(rs == Set(":race_1", ":race_3"))
  }
}
