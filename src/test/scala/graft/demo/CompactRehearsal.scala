package graft.demo

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.GraphStore

/** Scale rehearsal for the incremental (bin-packing) [[GraphStore.compact]]:
  * the r16 verdict's top task — on a directory holding one large
  * previously-compacted file plus a tail of ingest slivers, a
  * compaction cycle must cost ~the SLIVER bytes, not re-read and
  * re-write the directory's full history.
  *
  * Builds a hot directory with one ~large file (a bulk ingest compacted
  * once) plus `nSlivers` micro-batch slivers, then times
  *   (a) the incremental path (targetBytes sized so the large file is
  *       carried by rename), and
  *   (b) the r16-equivalent whole-directory rewrite (targetBytes sized
  *       so every file, including the large one, is merged),
  * recording wall time and the bytes actually rewritten (files whose
  * (name, length, mtime) changed). merkleHash must be identical after
  * both. The artifact's claim: rewritten bytes ≈ sliver bytes on (a),
  * ≈ directory bytes on (b), with wall time following suit.
  *
  * Usage: Test/runMain graft.demo.CompactRehearsal [outJson] [bulkRows] [nSlivers]
  */
object CompactRehearsal {

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("/root/repo/COMPACT_r17.json")
    val bulkRows = args.lift(1).map(_.toInt).getOrElse(2000000)
    val nSlivers = args.lift(2).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    val landing = Files.createTempDirectory("graft-cr-land").toString
    val store = Files.createTempDirectory("graft-cr").toString + "/store"
    val ckpt = Files.createTempDirectory("graft-cr-ck").toString

    // bulk history: one big batch, compacted once into ~target files
    spark.range(bulkRows)
      .selectExpr(s"concat('<urn:s/', lpad(cast(id as string), 9, '0'), " +
        "'> <urn:p/hot> <urn:o/', id, '> .') as value")
      .coalesce(4).write.text(landing + "/bulk")
    GraphStore.startNtIngest(spark, landing + "/bulk", store, "crbulk",
      checkpointDir = Some(ckpt)).awaitTermination()
    GraphStore.compact(spark, store)

    // the sliver tail: one micro-batch per landed file
    val sliverLanding = Files.createTempDirectory("graft-cr-sl").toString
    val ckpt2 = Files.createTempDirectory("graft-cr-ck2").toString
    for (t <- 0 until nSlivers) {
      Files.writeString(java.nio.file.Paths.get(sliverLanding, s"s$t.nt"),
        (0 until 5000).map { i =>
          val id = bulkRows + t * 10000 + i
          s"<urn:s/z$id> <urn:p/hot> <urn:o/$id> ."
        }.mkString("", "\n", "\n"))
      GraphStore.startNtIngest(spark, sliverLanding, store, s"crs$t",
        checkpointDir = Some(ckpt2)).awaitTermination()
    }

    val hotDir = new java.io.File(store, "__pred=urn%3Ap%2Fhot")
    def files() = hotDir.listFiles.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    def bytes(fs: Set[(String, Long, Long)]) = fs.toSeq.map(_._2).sum
    val before = files()
    val bigLen = before.map(_._2).max
    val dirBytes = bytes(before)
    val sliverBytes = dirBytes - bigLen
    val h0 = GraphStore.load(spark, store).merkleHash()

    // (a) incremental: big file carried (>= targetBytes/2), slivers merged
    val t0 = System.nanoTime()
    val doneInc = GraphStore.compact(spark, store, targetBytes = 2 * bigLen)
    val incSec = (System.nanoTime() - t0) / 1e9
    val afterInc = files()
    val rewrittenInc = bytes(afterInc -- before)
    val carried = afterInc.contains(before.maxBy(_._2))
    val hInc = GraphStore.load(spark, store).merkleHash()

    // (b) r16-equivalent whole-directory rewrite: huge target makes
    // every file (the big one included) a merge input
    val mid = files()
    val t1 = System.nanoTime()
    val doneFull = GraphStore.compact(spark, store,
      targetBytes = 64L << 30, minFiles = 1)
    val fullSec = (System.nanoTime() - t1) / 1e9
    val rewrittenFull = bytes(files() -- mid)
    val hFull = GraphStore.load(spark, store).merkleHash()

    val json = s"""{"bulk_rows": $bulkRows, "n_slivers": $nSlivers, """ +
      s""""dir_bytes": $dirBytes, "sliver_bytes": $sliverBytes, """ +
      s""""incremental": {"dirs": $doneInc, "sec": $incSec, """ +
      s""""bytes_rewritten": $rewrittenInc, "big_file_carried": $carried, """ +
      s""""merkle_equal": ${hInc == h0}}, """ +
      s""""full_rewrite": {"dirs": $doneFull, "sec": $fullSec, """ +
      s""""bytes_rewritten": $rewrittenFull, "merkle_equal": ${hFull == h0}}, """ +
      s""""note": "incremental compaction must rewrite ~sliver bytes and carry the big file by rename; the full-rewrite row is the r16-equivalent whole-directory cost on the same store"}"""
    Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}
