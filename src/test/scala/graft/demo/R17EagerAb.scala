package graft.demo

import org.apache.spark.sql.SparkSession

/** A/B of the eager COUNT(*) pushdown at the 10× scale (sf1), where the
  * engine's steering makes the path-chain joins shuffle-based and the
  * rule fires. Prints per-variant best/median of 5 and the fired plans. */
object R17EagerAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
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
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    for (q <- Seq("q_path_seq", "q_groupby_count", "q_path_inverse");
         on <- Seq("true", "false")) {
      spark.conf.set("spark.graft.eagerCountPushdown", on)
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warm
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val fired = fn(spark, dir).queryExecution.optimizedPlan.toString
        .contains("__graft_c0")
      println(f"$q%-18s pushdown=$on%-5s fired=$fired%-5s " +
        f"best=${t.min}%.3f med=${t.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
