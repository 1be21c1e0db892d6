package graft

import java.nio.file.Files
import scala.util.Random
import graft.sources.GraphStore

/** Random differential net for the continuous-ingest surface: seeded
  * random tick sequences — fresh rows, within-batch duplicates,
  * replays of earlier rows, hot/cold predicate mixes, interleaved
  * [[GraphStore.compact]] calls, simulated crashes (sidecar deletions
  * AND compactions killed mid-flight at either crash window, via the
  * [[GraphStore.crashCompactForTest]] seam), and full fresh-checkpoint
  * replays — against an in-memory SET model. After every sequence the
  * store's exact content must equal the model, and the stats sidecar
  * must equal the model's per-predicate counts. This exercises the
  * interactions no single pin covers: a bloom built before a
  * compaction filtering a replay after it, a crash-deleted bloom
  * healing mid-sequence, duplicates arriving in later ticks than their
  * originals, an ingest batch landing on a directory a crashed
  * compaction left mid-swap.
  *
  * Deepen with GRAFT_MODEL_SEEDS_EXTRA (comma-separated extra seeds)
  * and GRAFT_FUZZ_ROUNDS (ticks per sequence, default 12). */
class GraphStoreModelSpec extends SparkSpec {

  private def extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(',')).filter(_.nonEmpty).map(_.trim.toInt)
  private def ticks: Int =
    sys.env.get("GRAFT_FUZZ_ROUNDS").map(_.toInt.min(240).max(6))
      .getOrElse(12)

  private def run(seed: Int, quads: Boolean): Unit = {
    val rnd = new Random(seed)
    val landing = Files.createTempDirectory(s"graft-model-l$seed").toString
    val store =
      Files.createTempDirectory(s"graft-model-s$seed").toString + "/store"
    val ckpt = Files.createTempDirectory(s"graft-model-c$seed").toString
    // model rows as N-Triples/N-Quads LINES (set semantics by string)
    val model = scala.collection.mutable.LinkedHashSet.empty[String]
    val preds = Vector("urn:p/hot", "urn:p/hot", "urn:p/hot",
      "urn:p/a", "urn:p/b", "urn:p/c") // Zipf-ish: hot carries half
    val graphs = Vector("", "", "<urn:g/1> ", "<urn:g/2> ")
    var nextId = 0

    def freshLine(): String = {
      nextId += 1
      val g = if (quads) graphs(rnd.nextInt(graphs.size)) else ""
      s"<urn:s/$nextId> <${preds(rnd.nextInt(preds.size))}> " +
        s"<urn:o/$nextId> $g."
    }

    for (t <- 0 until ticks) {
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      val n = 1 + rnd.nextInt(40)
      for (_ <- 0 until n) {
        val roll = rnd.nextInt(10)
        if (roll < 6 || model.isEmpty) lines += freshLine()
        else if (roll < 9) // replay a row from an EARLIER tick
          lines += model.toVector(rnd.nextInt(model.size))
        else { // within-batch duplicate
          val l = freshLine(); lines += l; lines += l
        }
      }
      Files.writeString(java.nio.file.Paths.get(landing,
        s"t$t.${if (quads) "nq" else "nt"}"), lines.mkString("\n") + "\n")
      model ++= lines
      val q =
        if (quads) GraphStore.startNqIngest(spark, landing, store,
          s"model$seed-$t", checkpointDir = Some(ckpt))
        else GraphStore.startNtIngest(spark, landing, store,
          s"model$seed-$t", checkpointDir = Some(ckpt))
      q.awaitTermination()
      // interleaved operational events
      if (rnd.nextInt(4) == 0) GraphStore.compact(spark, store,
        targetBytes = 1L << 20, minFiles = 2)
      if (rnd.nextInt(5) == 0) { // crash simulation: sidecars lost
        Files.deleteIfExists(java.nio.file.Paths.get(store, "_stats.json"))
        val walk = Files.walk(java.nio.file.Paths.get(store))
        try walk.filter(_.getFileName.toString == "_bloom.bin")
          .forEach(p => Files.delete(p))
        finally walk.close()
      }
      if (rnd.nextInt(6) == 0) { // crash simulation: compaction killed
        // mid-flight — phase 1 (temp built, carried files renamed in)
        // or phase 2 (between the swap renames); subsequent ticks,
        // compactions, and loads must heal it losslessly
        val leaves = liveLeafDirs(store)
        if (leaves.nonEmpty) {
          val rel = leaves(rnd.nextInt(leaves.size))
          // a small target forces a carried/merged mix when file sizes
          // straddle it; a large one makes everything merged
          val target = if (rnd.nextBoolean()) 1L << 14 else 1L << 20
          GraphStore.crashCompactForTest(spark, store, rel,
            phase = 1 + rnd.nextInt(2), targetBytes = target)
        }
      }
    }
    // a full replay from a FRESH checkpoint (every file redelivered,
    // against whatever bloom/compaction state the sequence left) must
    // add nothing
    val q2 =
      if (quads) GraphStore.startNqIngest(spark, landing, store,
        s"model$seed-replay", checkpointDir = Some(
          Files.createTempDirectory(s"graft-model-c2$seed").toString))
      else GraphStore.startNtIngest(spark, landing, store,
        s"model$seed-replay", checkpointDir = Some(
          Files.createTempDirectory(s"graft-model-c2$seed").toString))
    q2.awaitTermination()

    val g = GraphStore.load(spark, store)
    assert(g.size == model.size,
      s"seed $seed quads=$quads: store ${g.size} != model ${model.size}")
    // exact content: re-serialize the store to lines and set-compare
    val dir = Files.createTempDirectory(s"graft-model-o$seed").toString
    if (quads) graft.sources.NQuads.write(g, dir)
    else graft.sources.NTriples.write(g, dir)
    val got = spark.read.textFile(dir).collect().toSet
    val want = model.toSet
    assert(got == want, {
      val missing = want -- got
      val extra = got -- want
      s"seed $seed quads=$quads: missing=${missing.take(3)} extra=${extra.take(3)}"
    })
    // stats sidecar equals the model's per-predicate counts (the last
    // tick may have healed it after a simulated crash)
    val wantCounts = model.toSeq
      .map(_.split(" ")(1).stripPrefix("<").stripSuffix(">"))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(g.predCounts == wantCounts,
      s"seed $seed quads=$quads: stats ${g.predCounts} != $wantCounts")
  }

  /** The store's live leaf partition directories (markers excluded),
    * store-relative — the candidates a crash-injected compaction can
    * target. */
  private def liveLeafDirs(store: String): Vector[String] = {
    val root = new java.io.File(store)
    if (!root.isDirectory) return Vector.empty
    val top = root.listFiles.filter(_.isDirectory).toVector
    top.flatMap { d =>
      if (d.getName.startsWith("__pred=")) Vector(d.getName)
      else if (d.getName.startsWith("__g="))
        d.listFiles.filter(f => f.isDirectory &&
          f.getName.startsWith("__pred="))
          .map(f => s"${d.getName}/${f.getName}").toVector
      else Vector.empty
    }
  }

  private def seeds: Seq[Int] = Seq(13, 20260816) ++ extraSeeds

  test("random ingest/compact/crash sequences match the set model " +
      "(triples store)") {
    for (seed <- seeds) run(seed, quads = false)
  }

  test("random ingest/compact/crash sequences match the set model " +
      "(quad store)") {
    for (seed <- seeds) run(seed, quads = true)
  }
}
