package graft

import java.nio.file.Files
import org.apache.spark.sql.{functions => F}
import graft.sources.GraphStore

/** Predicate-partitioned persistent graph layout: round-trip fidelity,
  * query equivalence, and — the point of the layout — partition-pruned
  * scans for constant-predicate patterns. */
class GraphStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("save/load round-trips triples and prefixes") {
    val out = Files.createTempDirectory("graft-store").toFile.getAbsolutePath
    val g = Tables.graph(spark, dir, "region", "nation")
      .withPrefix("gp", "urn:graft:p/")
    GraphStore.save(g, out)
    val loaded = GraphStore.load(spark, out)
    assert(loaded.size == g.size)
    assert(loaded.triples.except(g.triples).isEmpty)
    assert(g.triples.except(loaded.triples).isEmpty)
    assert(loaded.prefixes("gp") == "urn:graft:p/")
  }

  test("queries over the loaded graph match the direct graph") {
    val out = Files.createTempDirectory("graft-store2").toFile.getAbsolutePath
    GraphStore.save(Tables.graph(spark, dir, "customer", "nation"), out)
    val loaded = GraphStore.load(spark, out)
    val e = Engine.fromGraph(loaded.withPrefix("gp", "urn:graft:p/"))
    val q = """PREFIX gp: <urn:graft:p/>
               SELECT ?cname ?nname {
                 ?c gp:c_nation_ref ?n . ?c gp:c_name ?cname .
                 ?n gp:n_name ?nname }"""
    val got = e.selectRaw(q).count()
    val want = Engine.fromGraph(Tables.graph(spark, dir, "customer", "nation"))
      .selectRaw(q).count()
    assert(got == want && got == 150)
  }

  test("constant-predicate scans are partition-pruned") {
    val out = Files.createTempDirectory("graft-store3").toFile.getAbsolutePath
    GraphStore.save(Tables.graph(spark, dir, "nation"), out)
    val loaded = GraphStore.load(spark, out)
    val e = Engine.fromGraph(loaded.withPrefix("gp", "urn:graft:p/"))
    val df = e.selectRaw(
      "PREFIX gp: <urn:graft:p/> SELECT ?name { ?n gp:n_name ?name }")
    val scan = df.queryExecution.executedPlan.toString
    // the partition filter on __pred must reach the file scan
    assert(scan.contains("PartitionFilters") && scan.contains("__pred"),
      s"expected a pruned partition scan in:\n$scan")
    assert(df.count() == 25)
  }
}
