package graft.demo

import org.apache.spark.sql.SparkSession

/** Focused profile of q_path_seq at sf0.1 vs the 10x sf1 replication
  * (VERDICT r12 watch item: 3.93x at 10x data). Prints per-run wall
  * times (3 reps each) and the sf1 physical plan after execution (AQE
  * final plan) so broadcast-vs-exchange decisions are visible. */
object PathSeqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(dir: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q_path_seq")(spark, dir)
      val n = df.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[$dir] rows=$n wall=$s%.3f s")
      s
    }
    for (r <- 1 to 3) time("/root/testdata/sf0.1")
    for (r <- 1 to 3) time("/tmp/sf1")
    println("===== sf1 final plan =====")
    val df = graft.SparkEntry.queries("q_path_seq")(spark, "/tmp/sf1")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
