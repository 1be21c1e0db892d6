package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerJobStart}
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}

/** Round-18 measurement harness (guide §1): for each named query,
  * separates plan-build time from execution time (noop-equivalent count
  * action — same as the bench's timed action), counts jobs / tasks /
  * executor task time via a listener, censuses the Exchange nodes, and
  * dumps `explain("formatted")` to plans/r18/<q>_<tag>.txt.
  *
  * args: <tag> [sfDir] [comma-separated query names | "bench"]
  */
object R18Profile {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    val taskTime = new AtomicLong(0)
    val tasks = new AtomicInteger(0)
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        taskTime.addAndGet(e.taskMetrics match {
          case null => 0L
          case m => m.executorRunTime
        })
        tasks.incrementAndGet(); ()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    // same warmup as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.SparkEntry.queries("q_filter_in")(spark, sfDir).count()
    graft.SparkEntry.queries("q_groupby_count")(spark, sfDir).count()
    graft.SparkEntry.warmGraphs(spark, sfDir)
    graft.pipeline.Dedup.minhashDedupPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
      "doc_id", "text", threshold = 0.8, k = 3, numHashes = 32, bands = 8).count()

    val names: Seq[String] =
      if (args.length > 2 && args(2) != "bench") args(2).split(',').toSeq
      else graft.SparkEntry.benchQueries
    Files.createDirectories(Paths.get("plans/r18"))
    println(f"${"query"}%-22s ${"plan_s"}%7s ${"exec_s"}%7s ${"best_s"}%7s " +
      f"${"jobs"}%5s ${"tasks"}%6s ${"taskCPU_s"}%9s ${"exch"}%5s ${"aqe"}%4s")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // rep 0: untimed, capture plan text after execution (AQE final)
      val df0 = fn(spark, sfDir)
      df0.write.format("noop").mode("overwrite").save()
      val planTxt = df0.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val finalPlan = df0.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"plans/r18/${name}_$tag.txt"),
        planTxt + "\n\n===== AQE final plan =====\n" + finalPlan)
      val exch = "(?m)Exchange ".r.findAllIn(planTxt).length
      // timed reps: separate plan-build from execution
      var bestPlan, bestExec, bestTotal = Double.MaxValue
      var repJobs = 0; var repTasks = 0; var repCpu = 0.0
      for (_ <- 1 to 3) {
        spark.sparkContext.setJobDescription(s"r18:$name")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        jobs.set(0); tasks.set(0); taskTime.set(0)
        df.count()
        val t2 = System.nanoTime()
        val p = (t1 - t0) / 1e9; val x = (t2 - t1) / 1e9
        if (p + x < bestTotal) {
          bestTotal = p + x; bestPlan = p; bestExec = x
          repJobs = jobs.get; repTasks = tasks.get; repCpu = taskTime.get / 1e3
        }
      }
      println(f"$name%-22s $bestPlan%7.3f $bestExec%7.3f $bestTotal%7.3f " +
        f"$repJobs%5d $repTasks%6d $repCpu%9.3f $exch%5d " +
        (if (finalPlan.contains("AQEShuffleRead")) "  y" else "  n"))
    }
    spark.stop()
  }
}
