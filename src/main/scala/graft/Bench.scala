package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SparkEntry.benchQueries) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Times are end-to-end per query (plan + execute + count), after one
  * session-warmup action so JVM/codegen startup isn't billed to q1. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // fact⋈dim joins: dim vertical relations (orders/customer refs) are
      // tens of MB at sf0.1 — broadcast them instead of shuffling the fact
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // FATAL: a late task from an early-terminated job (limit/top-k) can log
    // a benign "non-existent accumulator" ERROR after its job's accumulators
    // are GC'd; real failures still surface through the per-query catch
    // below as JSON "errors" entries. Keeping the log quiet keeps the one
    // JSON line the only thing this main prints.
    spark.sparkContext.setLogLevel("FATAL")
    // Warm up the session through the engine code path (file listing,
    // whole-stage codegen for term structs, shuffle exchange init) on the
    // smallest table so JVM startup isn't billed to the first timed query.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    SparkEntry.queries("q_filter_in")(spark, sfDir).count()
    SparkEntry.queries("q_groupby_count")(spark, sfDir).count()
    SparkEntry.warmGraphs(spark, sfDir)
    // warm the pipeline path (array/lambda codegen) on a 50-doc slice
    graft.pipeline.Dedup.minhashDedupPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
      "doc_id", "text", threshold = 0.8, k = 3, numHashes = 32, bands = 8).count()
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // Steady-state timing: each query runs `reps` times end-to-end
    // (plan + execute + count) and reports the MINIMUM — the runs share
    // nothing (no caching between reps), so min-of-N measures the code's
    // latency rather than co-tenant noise, matching the reference
    // baseline's steady-state numbers. A failing query must surface as an
    // error entry, never as a fast time: a benchmark that silently
    // converts crashes into good numbers is measuring nothing.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1,
      s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps — zero reps would " +
        "report Double.MaxValue as every query's time")
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
        times += (System.nanoTime() - t0) / 1e9
        r += 1
      }
      (name, times.toSeq, err)
    }
    println(renderJson(results, sfDir, reps))
    spark.stop()
  }

  /** Median of the recorded rep times (even count → mean of middle two). */
  private def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** The one-line result JSON: successful queries under "queries" with
    * their best-of-`reps` seconds PLUS a "medians" object with the
    * median-of-reps, so the artifact itself shows run-to-run variance
    * (this box swings ±35-70% between identical runs — a min that is
    * far below its median is noise, not a regression). Failed queries
    * land under "errors" with the exception — never as a time. */
  def renderJson(results: Seq[(String, Seq[Double], Option[String])],
      sfDir: String, reps: Int = 1): String = {
    val ok = results.filter(r => r._3.isEmpty && r._2.nonEmpty)
    val qs = ok.map { case (k, ts, _) => jstr(k) + f":${ts.min}%.3f" }
      .mkString("{", ",", "}")
    val meds = ok.map { case (k, ts, _) => jstr(k) + f":${median(ts)}%.3f" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2.min).sum
    val errs = results.collect { case (k, _, Some(m)) => jstr(k) + ":" + jstr(m) }
    val errField =
      if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,"queries":$qs,"medians":$meds$errField,"sf":${jstr(sfDir)}}"""
  }
}
