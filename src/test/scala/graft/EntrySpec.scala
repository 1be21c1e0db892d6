package graft

/** The driver's smoke contract: SparkEntry.entry returns rows on
  * sf0.001, and every queries-map key with an oracle also has a query. */
class EntrySpec extends SparkSpec {

  test("flagship entry query returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("bench queries all exist") {
    val missing = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"bench names without query: $missing")
  }
}
