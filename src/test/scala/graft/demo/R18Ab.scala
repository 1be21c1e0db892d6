package graft.demo

import org.apache.spark.sql.SparkSession

/** Interleaved A/B benchmark (VERDICT r17 "Next round" item 2; guide §1):
  * runs each named query alternating between condition A (a session conf
  * set to "false" — the kill-switch of the change under test) and
  * condition B (the conf set to "true"), WITHIN ONE JVM, and reports
  * per-query paired statistics. Alternation cancels the box's slow drift
  * (this machine swings 35-70% between identical runs); pairing makes a
  * <10% driver-side delta detectable where back-to-back whole-bench runs
  * cannot.
  *
  * Calibration mode: pass conf name "none" — A and B run IDENTICAL code,
  * so the reported |delta| is the harness noise floor. A real change is
  * credible only when its delta clears the same-build floor.
  *
  * args: <confKey|none> [queries|bench] [pairs] [sfDir]
  * output: one line per query with median/best seconds per condition and
  * the median of the per-pair deltas (B-A)/A (negative = B faster).
  */
object R18Ab {
  def main(args: Array[String]): Unit = {
    val confKey = if (args.nonEmpty) args(0) else "none"
    val qarg = if (args.length > 1) args(1) else "bench"
    val pairs = if (args.length > 2) args(2).toInt else 7
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.SparkEntry.queries("q_filter_in")(spark, sfDir).count()
    graft.SparkEntry.queries("q_groupby_count")(spark, sfDir).count()
    graft.SparkEntry.warmGraphs(spark, sfDir)
    graft.pipeline.Dedup.minhashDedupPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
      "doc_id", "text", threshold = 0.8, k = 3, numHashes = 32, bands = 8).count()

    val names: Seq[String] =
      if (qarg != "bench") qarg.split(',').toSeq
      else graft.SparkEntry.benchQueries

    def setCond(on: Boolean): Unit =
      if (confKey != "none") spark.conf.set(confKey, on.toString)

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    println(s"conf=$confKey pairs=$pairs sf=$sfDir cpus=$cpus")
    println(f"${"query"}%-22s ${"A_med"}%7s ${"B_med"}%7s ${"A_best"}%7s " +
      f"${"B_best"}%7s ${"pairedΔ"}%8s ${"minΔ"}%7s ${"B<A"}%5s")
    for (name <- names) {
      // one untimed warm rep per condition so first-plan costs are paid
      // before any timed pair
      setCond(false); time(name)
      setCond(true); time(name)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val deltas = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (i <- 0 until pairs) {
        // alternate within-pair order (ABBA...) so a monotone drift
        // cancels in the pair deltas instead of biasing one condition
        val aFirst = i % 2 == 0
        var a = 0.0; var b = 0.0
        if (aFirst) {
          setCond(false); a = time(name)
          setCond(true); b = time(name)
        } else {
          setCond(true); b = time(name)
          setCond(false); a = time(name)
        }
        as += a; bs += b; deltas += (b - a) / a
      }
      // three views, because this box's per-run jitter is huge:
      //  pairedΔ — median of per-pair relative deltas (robust to drift);
      //  minΔ    — delta of per-condition minima (noise is one-sided
      //            additive, so minima estimate each condition's floor);
      //  B<A     — sign-test wins for B out of `pairs`.
      val wins = deltas.count(_ < 0)
      println(f"$name%-22s ${median(as.toSeq)}%7.3f ${median(bs.toSeq)}%7.3f " +
        f"${as.min}%7.3f ${bs.min}%7.3f ${median(deltas.toSeq) * 100}%+7.1f%% " +
        f"${(bs.min - as.min) / as.min * 100}%+6.1f%% $wins%3d/$pairs%d")
    }
    spark.stop()
  }
}
