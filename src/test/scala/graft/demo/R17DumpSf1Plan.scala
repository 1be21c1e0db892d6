package graft.demo

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps q_path_seq's formatted plan at sf1, where the engine steers the
  * chain joins to shuffle_hash and EagerCountPushdown fires — the plan
  * evidence for the rule's scale behavior. */
object R17DumpSf1Plan {
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
    for ((prop, tag) <- Seq(("true", "pushdown"), ("false", "nopushdown"))) {
      spark.conf.set("spark.graft.eagerCountPushdown", prop)
      val df = graft.SparkEntry.queries("q_path_seq")(spark, dir)
      df.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
        "\n\n===== AQE final plan =====\n" +
        df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"plans/r17/q_path_seq_sf1_$tag.txt"), txt)
      println(s"dumped $tag, fired=" +
        df.queryExecution.optimizedPlan.toString.contains("__graft_c0"))
    }
    spark.stop()
  }
}
