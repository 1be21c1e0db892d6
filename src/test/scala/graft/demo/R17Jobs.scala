package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Job-timeline profile (guide §7): for one query, prints each job's
  * [submit, end] relative to the action start plus the driver-side gaps
  * between jobs — separating task execution from AQE/codegen/scheduling
  * overhead. args: <queryName> [reps] */
object R17Jobs {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_path_seq"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.SparkEntry.warmGraphs(spark, sfDir)
    graft.pipeline.Dedup.minhashDedupPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
      "doc_id", "text", threshold = 0.8, k = 3, numHashes = 32, bands = 8).count()
    case class J(id: Int, submit: Long, var end: Long, var tasks: Int,
      var taskMs: Long)
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = J(e.jobId, e.time, 0, 0, 0) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          jobs.lastOption.foreach { case (_, j) =>
            j.tasks += 1
            if (e.taskMetrics != null) j.taskMs += e.taskMetrics.executorRunTime
          }
        }
    })
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    val cgTime = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    for (r <- 1 to reps) {
      val cg0 = (cgTime.getCount, cgTime.getSnapshot.getValues.sum)
      jobs.synchronized(jobs.clear())
      val t0n = System.nanoTime(); val t0 = System.currentTimeMillis()
      val df = fn(spark, sfDir)
      val t1 = System.currentTimeMillis()
      df.count()
      val t2 = System.currentTimeMillis()
      Thread.sleep(100)
      println(f"== $name rep $r: build=${t1 - t0}ms total=${t2 - t0}ms " +
        f"(wall ${(System.nanoTime() - t0n) / 1e6 - 100}%.0f ms incl sleep-adj) " +
        f"codegenCompiles=${cgTime.getCount - cg0._1}")
      var prevEnd = t1
      jobs.synchronized(jobs.values.toSeq).sortBy(_.submit).foreach { j =>
        println(f"   gap=${j.submit - prevEnd}%4d ms | job ${j.id}%3d " +
          f"run=${j.end - j.submit}%4d ms tasks=${j.tasks}%3d " +
          f"taskTime=${j.taskMs}%4d ms")
        prevEnd = j.end
      }
      println(f"   tail gap=${t2 - prevEnd} ms (last job end → action done)")
    }
    if (sys.env.contains("GRAFT_RULE_TIME")) {
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val df = fn(spark, sfDir); df.count()
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        .linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}
