package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.rdf.{Canon, RdfGraph, Terms}

/** Scale rehearsal for the round-12 graph operators that are table-
  * driven (the oracled q_canon/q_graph_diff run over tiny dims by
  * design, so the 10× evidence comes from here): canonical N-Quads
  * over a lineitem-derived ground graph (millions of triples — the
  * columnar path, driver untouched) including the globally-sorted
  * sink, and a large-vs-large graph diff with broadcast disabled so
  * the anti-joins exercise the shuffle path they would take on a
  * cluster. Writes one JSON artifact with sf0.1/sf1 wall times.
  *
  * Usage: Test/runMain graft.demo.CanonScale [sf1Dir] [outJson]
  */
object CanonScale {
  def main(args: Array[String]): Unit = {
    val sf1Dir = args.headOption.getOrElse("/tmp/sf1")
    val outJson = args.lift(1).getOrElse("/root/repo/BENCH_sf1_r14_canon.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    /** lineitem → 2 ground triples per row (IRI key, typed qty literal
      * + plain shipmode literal). */
    def graphOf(dir: String, maxQty: Int = Int.MaxValue): RdfGraph = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(F.col("l_quantity") <= maxQty)
      val s = Terms.iri(F.concat(F.lit("urn:li/"),
        F.col("l_orderkey").cast("string"), F.lit("/"),
        F.col("l_linenumber").cast("string")))
      val qty = li.select(s.as("s"),
        Terms.iri(F.lit("urn:p/qty")).as("p"),
        Terms.lit(F.col("l_quantity").cast("string"),
          "http://www.w3.org/2001/XMLSchema#integer").as("o"))
      val mode = li.select(s.as("s"),
        Terms.iri(F.lit("urn:p/flag")).as("p"),
        Terms.plainLit(F.col("l_returnflag")).as("o"))
      RdfGraph(qty.unionByName(mode), Map.empty)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def rehearse(dir: String, tag: String)
        : (Long, Double, Double, Double, Double, Double) = {
      val g = graphOf(dir)
      val n = g.triples.count()
      // best-of-2 per op (shared-box noise)
      val canonCount = Seq.fill(2)(
        time(Canon.canonicalLines(g).count())).min
      val canonWrite = Seq.fill(2)(
        time(Canon.writeCanonical(g, s"/tmp/canon_scale_$tag"))).min
      // r13: the streamed content address (sorted-fold SHA-256 —
      // O(1) driver memory, no materialization)
      val hashT = Seq.fill(2)(time(g.datasetHashDistributed())).min
      // r14: the parallel Merkle address — per-segment digests run
      // distributed; only the <=4096 digest lines fold on the driver
      val merkleT = Seq.fill(2)(time(g.merkleHash())).min
      // large-vs-large diff, broadcast off → shuffle anti-joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = graphOf(dir, maxQty = 48)
      val b = graphOf(dir, maxQty = 49) // superset of a
      val diffT = Seq.fill(2)(time {
        val (onlyA, onlyB) = a.diff(b)
        assert(onlyA.count() == 0L) // a ⊆ b
        onlyB.count()
      }).min
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
      println(f"[canon-scale] $tag triples=$n canon_count=$canonCount%.2f " +
        f"canon_write=$canonWrite%.2f hash=$hashT%.2f merkle=$merkleT%.2f " +
        f"diff=$diffT%.2f")
      (n, canonCount, canonWrite, hashT, merkleT, diffT)
    }

    val (n01, c01, w01, h01, m01, d01) =
      rehearse("/root/testdata/sf0.1", "sf01")
    val (n1, c1, w1, h1, m1, d1) = rehearse(sf1Dir, "sf1")
    val json =
      f"""{
         |  "note": "canonical N-Quads (columnar ground path: count, globally-sorted write, streamed sorted-fold datasetHashDistributed, parallel merkleHash) and large-vs-large graph diff (shuffle anti-joins, broadcast disabled) over a 2-triples-per-lineitem-row ground graph, best-of-2, local[32]",
         |  "sf01": {"triples": $n01, "canon_count_sec": $c01%.3f, "canon_write_sec": $w01%.3f, "dataset_hash_sec": $h01%.3f, "merkle_hash_sec": $m01%.3f, "diff_sec": $d01%.3f},
         |  "sf1":  {"triples": $n1, "canon_count_sec": $c1%.3f, "canon_write_sec": $w1%.3f, "dataset_hash_sec": $h1%.3f, "merkle_hash_sec": $m1%.3f, "diff_sec": $d1%.3f},
         |  "ratio_10x": {"canon_count": ${c1 / c01}%.2f, "canon_write": ${w1 / w01}%.2f, "dataset_hash": ${h1 / h01}%.2f, "merkle_hash": ${m1 / m01}%.2f, "diff": ${d1 / d01}%.2f}
         |}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
