package graft.demo

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.GraphStore

/** Continuous-ingest soak: thousands of micro-batches is where the
  * sliver-file accumulation bites — every tick appends a few files per
  * touched directory, and per-tick cost picks up an O(files) component
  * (the probe's listing when a duplicate shows up, the footer-stats
  * sum every tick). 200 AvailableNow ticks into one store; in the
  * default mode [[GraphStore.compact]] runs between ticks at the 100
  * and 150 marks, in `auto` mode NO compact is ever scheduled — the
  * stream maintains itself via `compactWhenFilesExceed`. The artifact
  * records per-tick wall times in 25-tick windows plus the hot
  * directory's file count before/after each compaction. Flat windows
  * (without any operator-scheduled compact in auto mode) are the
  * "done" criterion — r16's unmaintained windows drifted upward with
  * the file count.
  *
  * Usage: Test/runMain graft.demo.IngestSoak [outJson] [nTicks] [auto]
  */
object IngestSoak {

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("/root/repo/SOAK_r16.json")
    val nTicks = args.lift(1).map(_.toInt).getOrElse(200)
    val auto = args.lift(2).contains("auto")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    val landing = Files.createTempDirectory("graft-soak-land").toString
    val store = Files.createTempDirectory("graft-soak").toString + "/store"
    val ckpt = Files.createTempDirectory("graft-soak-ck").toString
    val hotDir = new java.io.File(store, "__pred=urn%3Ap%2Fhot")
    def hotFiles(): Int =
      if (!hotDir.isDirectory) 0
      else hotDir.listFiles.count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))

    def pad(i: Long) = f"$i%09d"
    val tickSec = new Array[Double](nTicks)
    val compactions = new StringBuilder
    for (t <- 0 until nTicks) {
      // 1000 fresh rows per tick: 800 on the hot predicate, 200 spread
      // over 4 cold ones — every tick touches the same 5 directories
      val base = t * 1000L
      val lines = (0 until 1000).map { i =>
        val id = pad(base + i)
        val p = if (i < 800) "urn:p/hot" else s"urn:p/cold${i % 4}"
        s"<urn:s/$id> <$p> <urn:o/$id> ."
      }.mkString("", "\n", "\n")
      Files.writeString(java.nio.file.Paths.get(landing, s"t$t.nt"), lines)
      val t0 = System.nanoTime()
      GraphStore.startNtIngest(spark, landing, store, s"soak$t",
        checkpointDir = Some(ckpt),
        compactWhenFilesExceed = if (auto) Some(24) else None)
        .awaitTermination()
      tickSec(t) = (System.nanoTime() - t0) / 1e9
      if (!auto && (t == nTicks / 2 || t == (3 * nTicks) / 4)) {
        val before = hotFiles()
        val c0 = System.nanoTime()
        val done = GraphStore.compact(spark, store)
        val sec = (System.nanoTime() - c0) / 1e9
        if (compactions.nonEmpty) compactions.append(", ")
        compactions.append(s"""{"at_tick": $t, "dirs": $done, """ +
          s""""hot_files_before": $before, "hot_files_after": ${hotFiles()}, """ +
          s""""sec": $sec}""")
      }
    }

    val window = 25
    val windows = tickSec.grouped(window).zipWithIndex.map { case (w, i) =>
      val s = w.sorted
      s"""{"ticks": "${i * window}-${i * window + w.length - 1}", """ +
        s""""median_sec": ${s(s.length / 2)}, "max_sec": ${s.last}}"""
    }.mkString("[", ", ", "]")
    val total = GraphStore.load(spark, store).size
    val note =
      if (auto) "AvailableNow ticks, 1000 fresh rows each (800 hot); NO " +
        "operator-scheduled compact — compactWhenFilesExceed=24 " +
        "self-maintains; flat window medians = the stream needs no " +
        "external compaction cadence"
      else "AvailableNow ticks, 1000 fresh rows each (800 hot); compact " +
        "between ticks at the 1/2 and 3/4 marks; flat window medians " +
        "after compaction = sliver growth contained"
    val json = s"""{"ticks": $nTicks, "mode": "${
        if (auto) "auto" else "manual"}", "rows_ingested": $total, """ +
      s""""final_hot_files": ${hotFiles()}, """ +
      s""""windows": $windows, "compactions": [$compactions], """ +
      s""""note": "$note"}"""
    Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
