package graft.demo

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft._
import graft.sources.GraphStore

/** Manual drive of the public API (what a user of the library does) —
  * used by /verify-style runtime checks: `sbt "Test/runMain graft.demo.Drive"`.
  *
  * Round 17 surface: incremental (bin-packing) compaction, the
  * self-maintaining `compactWhenFilesExceed` ingest knob, crash-healing
  * for mid-swap compactions, and the single-writer `_lock`. */
object Drive {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-drive")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val landing = Files.createTempDirectory("drive-landing").toString
    val store = Files.createTempDirectory("drive-store").toString + "/store"
    val ckpt = Files.createTempDirectory("drive-ckpt").toString
    val hotDir = new java.io.File(store, "__pred=urn%3Ap%2Fknows")
    def hotFiles(): Int =
      if (!hotDir.isDirectory) 0
      else hotDir.listFiles.count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))

    println("=== 10 ingest ticks with compactWhenFilesExceed=3 (self-maintaining):")
    for (t <- 0 until 10) {
      Files.writeString(java.nio.file.Paths.get(landing, s"t$t.nt"),
        (0 until 50).map(i =>
          s"<urn:s/${t * 100 + i}> <urn:p/knows> <urn:o/${t * 100 + i}> .")
          .mkString("\n"))
      GraphStore.startNtIngest(spark, landing, store, s"drive$t",
        checkpointDir = Some(ckpt),
        compactWhenFilesExceed = Some(3)).awaitTermination()
      println(s"  tick $t: hot-dir files = ${hotFiles()}")
    }
    val g0 = GraphStore.load(spark, store)
    println(s"=== store rows after 10 ticks (expect 500): ${g0.size}")

    println("=== single-writer lock: a held _lock fails a second writer fast:")
    Files.writeString(java.nio.file.Paths.get(store, "_lock"),
      """{"owner": "some other process", "acquired_ms": 0}""")
    try { GraphStore.compact(spark, store); println("  !!! lock NOT enforced") }
    catch { case e: GraftException =>
      println("  GraftException: " + e.getMessage.take(100) + "…") }
    println("  breakLock → " + GraphStore.breakLock(spark, store))

    println("=== crash a compaction between its two swap renames; load() heals:")
    GraphStore.crashCompactForTest(spark, store,
      "__pred=urn%3Ap%2Fknows", phase = 2)
    println(s"  mid-swap: live dir exists = ${hotDir.isDirectory}, markers = " +
      new java.io.File(store).list.count(_.startsWith(".compact-")))
    val g1 = GraphStore.load(spark, store)
    println(s"  healed at load: rows = ${g1.size} (expect 500), markers left = " +
      new java.io.File(store).list.count(_.startsWith(".compact-")))

    println("=== incremental compact: full-size files carry by rename:")
    val before = hotDir.listFiles.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val mLen = before.map(_.length).max
    Files.writeString(java.nio.file.Paths.get(landing, "t99.nt"),
      (0 until 50).map(i =>
        s"<urn:s/z$i> <urn:p/knows> <urn:o/z$i> .").mkString("\n"))
    GraphStore.startNtIngest(spark, landing, store, "drive99",
      checkpointDir = Some(ckpt)).awaitTermination()
    val done = GraphStore.compact(spark, store, targetBytes = 2 * mLen,
      minFiles = 1)
    val after = hotDir.listFiles.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    println(s"  compacted $done dir(s); " +
      s"carried file survives: ${after.exists(f => f.length == mLen)}; " +
      s"files ${before.length + 1} -> ${after.length}")
    val g2 = GraphStore.load(spark, store)
    println(s"  rows after compact (expect 550): ${g2.size}")

    println("=== SPARQL over the ingested store (public Engine API):")
    Engine.fromGraph(g2).select(
      "SELECT (COUNT(*) AS ?n) { ?s <urn:p/knows> ?o }").show(false)

    spark.stop()
  }
}
