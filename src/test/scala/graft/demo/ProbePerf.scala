package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.SparkEntry

/** Scratch perf probe for the heaviest sf1 query (q_dedup_ngram):
  * times the full query at sf0.1 and (if the replication exists)
  * /tmp/sf1, best of 2, and A/Bs the retired pair-regroup verify shape
  * against the joined two-pointer one. Not part of any driver
  * contract.
  *
  * r12 findings at /tmp/sf1 (10x docs, every doc ~10 identical
  * copies → 978x more true pairs): prefix ranking through candidate
  * distinct costs ~3 s; the OLD verify (pair-keyed regroup shipping a
  * ~400-byte shingle array per candidate side through the shuffle,
  * then array_intersect + array_union per pair) cost ~14 s of the
  * 16.5 s query. The joined verify with per-document array_sort and
  * SortedIntersectCount brought the query to ~4.9 s. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      var n = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] $label%-40s $best%8.3f s  rows=$n")
    }

    val dirs = Seq("/root/testdata/sf0.1") ++
      (if (new java.io.File("/tmp/sf1/documents.parquet").exists)
        Seq("/tmp/sf1") else Nil)
    for (dir <- dirs) {
      println(s"=== $dir")
      spark.read.parquet(s"$dir/documents.parquet").count() // warm
      time("q_dedup_ngram")(
        SparkEntry.queries("q_dedup_ngram")(spark, dir).count())
      time("q_cdc_dedup")(
        SparkEntry.queries("q_cdc_dedup")(spark, dir).count())
      time("q_dedup_minhash")(
        SparkEntry.queries("q_dedup_minhash")(spark, dir).count())
    }
    spark.stop()
  }
}
