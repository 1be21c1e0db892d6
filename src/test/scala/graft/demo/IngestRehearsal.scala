package graft.demo

import java.nio.file.Files
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.rdf.RdfGraph
import graft.sources.GraphStore

/** Streaming-ingest scale rehearsal: per-batch merge cost must scale
  * with the BATCH, not the store — r14 killed the full-store probe
  * (every tick read every predicate directory), r16 kills the
  * remaining axis: a batch touching a Zipf-hot predicate used to
  * anti-join against that predicate's FULL extension (rdf:type at
  * 100 TB = a multi-TB read per micro-batch). The per-directory bloom
  * sidecars route definitely-new rows around the probe entirely.
  *
  * Three sections, one JSON artifact:
  *
  * 1. `pruned` (carried from r15): stores A (50 preds × 20k),
  *    B (500 × 20k), C (50 × 200k); one identical 10k-row batch over
  *    3 predicates, half replayed duplicates. B ≈ A (untouched
  *    directories are never listed), C grows only with the touched
  *    data that must be read for the duplicate half.
  *
  * 2. `zipf` (r16): stores Z1 (hot predicate 100k rows = 67% of the
  *    store) and Z2 (hot predicate 1M rows, same cold tail); one
  *    identical 10k-row batch of FRESH hot-predicate rows with
  *    subjects above the stored range (the append-mostly shape — new
  *    entity ids / timestamps sort after old ones). Flat means
  *    Z2 ≈ Z1: the blooms exclude the fresh rows without reading the
  *    extension, and the ~fpp false positives' subject-range filter
  *    prunes every row group.
  *
  * 3. `quad` (r16): stores Q1 (4 graphs × 10 preds × 5k) and Q2 (40
  *    graphs, same per-graph data); one identical batch into the
  *    default graph over 3 predicates, half duplicates. Q2 ≈ Q1 pins
  *    the two-level (graph, predicate) pruning — the 36 extra graph
  *    directories are never touched.
  *
  * Usage: Test/runMain graft.demo.IngestRehearsal [outJson]
  */
object IngestRehearsal {

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("/root/repo/INGEST_r16.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    def iriCol(prefix: String, id: org.apache.spark.sql.Column) =
      F.struct(F.lit(graft.rdf.Terms.KIND_IRI).as("kind"),
        F.concat(F.lit(prefix), id).as("value"),
        F.lit(null).cast("string").as("dt"),
        F.lit(null).cast("string").as("lang"))

    def buildStore(nPreds: Int, rowsPerPred: Int): String = {
      val out = Files.createTempDirectory("graft-ingest-rehearsal")
        .toString + "/store"
      val df = spark.range(nPreds.toLong * rowsPerPred).select(
        iriCol("urn:s/", F.col("id")).as("s"),
        iriCol("urn:p/", F.col("id") % nPreds).as("p"),
        iriCol("urn:o/", F.col("id")).as("o"))
      GraphStore.save(RdfGraph(df, RdfGraph.defaultPrefixes), out)
      out
    }

    /** One AvailableNow ingest of the same 10k-line batch: 5k lines
      * that already exist in every store (subjects 0..4999 hit preds
      * 0..2 only in stores where id%nPreds<3 — so to keep the batch
      * IDENTICAL across stores, the duplicate half replays lines that
      * exist in all three: p = id%50 for ids ≡ 0..2 (mod 50), present
      * in A and C; for B (500 preds) they are new. The comparison that
      * matters — B vs A — therefore runs the SAME anti-join shape with
      * the same touched-partition count.) */
    def ingestOnce(store: String, lines: String, nq: Boolean = false): Double = {
      val landing = Files.createTempDirectory("graft-ir-land").toString
      Files.writeString(java.nio.file.Paths.get(landing,
        if (nq) "batch.nq" else "batch.nt"), lines)
      val t0 = System.nanoTime()
      val q =
        if (nq) GraphStore.startNqIngest(spark, landing, store,
          s"rehearse${System.nanoTime()}")
        else GraphStore.startNtIngest(spark, landing, store,
          s"rehearse${System.nanoTime()}")
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    def mixedBatch(): String = {
      val lines = new StringBuilder
      var i = 0
      while (i < 10000) {
        val id = i * 50 + (i % 3) // predicate = id % 50 ∈ {0,1,2}
        lines.append(s"<urn:s/$id> <urn:p/${id % 50}> <urn:o/$id> .\n")
        i += 1
      }
      lines.toString
    }

    def bestOf3(run: () => Double): Double = (1 to 3).map(_ => run()).min

    // warmup: pay streaming/parquet first-use costs outside the clock
    val warm = buildStore(10, 1000)
    ingestOnce(warm, mixedBatch())

    // ---- section 1: pruned listing (r15 protocol, regression guard)
    val a = buildStore(50, 20000)
    val b = buildStore(500, 20000)
    val c = buildStore(50, 200000)
    val pruned = Map("A" -> a, "B" -> b, "C" -> c).map { case (k, s) =>
      // fresh landing+query each rep; the batch re-merges (appends
      // nothing after rep 1 in A/C; B appends once) — the probe cost
      // is what we time
      k -> bestOf3(() => ingestOnce(s, mixedBatch()))
    }

    // ---- section 2: Zipf-hot predicate, fresh-data steady state
    // zero-padded ids make lexicographic order = numeric order, so
    // "new ids continue above the stored range" (the append-mostly
    // shape) is visible to parquet row-group stats
    def pad(i: Long): String = f"$i%09d"
    def buildZipf(hotRows: Int): String = {
      val out = Files.createTempDirectory("graft-ir-zipf")
        .toString + "/store"
      val hot = spark.range(hotRows).select(
        iriCol("urn:s/", F.format_string("%09d", F.col("id"))).as("s"),
        iriCol("urn:p/", F.lit("hot")).as("p"),
        iriCol("urn:o/", F.col("id")).as("o"))
      val cold = spark.range(50000).select(
        iriCol("urn:s/", F.format_string("%09d", F.col("id"))).as("s"),
        iriCol("urn:p/cold", F.col("id") % 10).as("p"),
        iriCol("urn:o/c", F.col("id")).as("o"))
      GraphStore.save(RdfGraph(hot.unionByName(cold),
        RdfGraph.defaultPrefixes), out)
      out
    }
    val z1 = buildZipf(100000)  // hot = 67% of 150k rows
    val z2 = buildZipf(1000000) // hot extension ×10, cold tail fixed
    var zipfTick = 0
    def zipfBatch(): String = {
      // fresh rows each call, ids strictly above everything stored or
      // previously ingested — replays within bestOf3 stay set-correct
      // and later reps still measure the fresh-data path
      zipfTick += 1
      val base = 2000000L + zipfTick * 10000L
      (0 until 10000).map(i =>
        s"<urn:s/${pad(base + i)}> <urn:p/hot> <urn:o/n${base + i}> .")
        .mkString("", "\n", "\n")
    }
    val zipf = Map(
      "Z1" -> bestOf3(() => ingestOnce(z1, zipfBatch())),
      "Z2" -> bestOf3(() => ingestOnce(z2, zipfBatch())))

    // ---- section 3: quad store, two-level pruning
    def buildQuad(nGraphs: Int): String = {
      val out = Files.createTempDirectory("graft-ir-quad")
        .toString + "/store"
      val df = spark.range(nGraphs.toLong * 10 * 5000).select(
        iriCol("urn:s/", F.col("id")).as("s"),
        iriCol("urn:p/", F.col("id") % 10).as("p"),
        iriCol("urn:o/", F.col("id")).as("o"),
        F.when(F.col("id") % nGraphs === 0,
          F.lit(null).cast(graft.rdf.Terms.termType))
          .otherwise(iriCol("urn:g/", F.col("id") % nGraphs)).as("g"))
      GraphStore.save(RdfGraph(df, RdfGraph.defaultPrefixes), out)
      out
    }
    val q1 = buildQuad(4)
    val q2 = buildQuad(40)
    def quadBatch(): String = {
      // default-graph lines over preds 0..2; half exist in both stores
      // (id % 40 == 0 implies id % 4 == 0), half are new
      val lines = new StringBuilder
      var i = 0
      while (i < 5000) {
        val id = i * 40L // in both stores' default graphs when pred hits
        lines.append(s"<urn:s/$id> <urn:p/${id % 10}> <urn:o/$id> .\n")
        lines.append(
          s"<urn:s/new$i> <urn:p/${i % 3}> <urn:o/new$i> .\n")
        i += 1
      }
      lines.toString
    }
    val quad = Map(
      "Q1" -> bestOf3(() => ingestOnce(q1, quadBatch(), nq = true)),
      "Q2" -> bestOf3(() => ingestOnce(q2, quadBatch(), nq = true)))

    val json =
      s"""{"pruned": {"store_A_50x20k_sec": ${pruned("A")}, """ +
        s""""store_B_500x20k_sec": ${pruned("B")}, """ +
        s""""store_C_50x200k_sec": ${pruned("C")}, """ +
        s""""b_over_a": ${pruned("B") / pruned("A")}, """ +
        s""""c_over_a": ${pruned("C") / pruned("A")}}, """ +
        s""""zipf": {"hot100k_sec": ${zipf("Z1")}, """ +
        s""""hot1m_sec": ${zipf("Z2")}, """ +
        s""""z2_over_z1": ${zipf("Z2") / zipf("Z1")}}, """ +
        s""""quad": {"graphs4_sec": ${quad("Q1")}, """ +
        s""""graphs40_sec": ${quad("Q2")}, """ +
        s""""q2_over_q1": ${quad("Q2") / quad("Q1")}}, """ +
        s""""note": "pruned: identical mixed batch, B=10x store same touched dirs (want ~A); zipf: fresh 10k-row batches on the hot predicate, Z2=10x hot extension (bloom prefilter: want ~Z1); quad: identical default-graph batch, Q2=10x graph dirs (two-level pruning: want ~Q1)"}"""
    Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
