package graft.demo

import org.apache.spark.sql.SparkSession

/** Core-count scaling runner (VERDICT r17 task 5): times a query subset
  * at `local[$SPARK_GRAFT_CPUS]` over a rehearsal directory and prints
  * one JSON line — run twice (SPARK_GRAFT_CPUS=8 / 32) and ratio the
  * results. Same timing discipline as Bench (min of reps, cold plans,
  * nothing cached between reps); queries and sfDir as args so the sweep
  * can pick the scan/agg-bound shapes with enough compute to show a
  * core-count effect.
  *
  * args: <sfDir> <comma-separated queries> [reps]
  */
object R18Scaling {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
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
    spark.sparkContext.setLogLevel("FATAL")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warmup
    graft.SparkEntry.queries("q_groupby_count")(spark, sfDir).count()
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"cpus":$cpus,"sf":"$sfDir","queries":{$qs}}""")
    spark.stop()
  }
}
