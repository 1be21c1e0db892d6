package graft.demo

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the headline queries for manual
  * plan-quality audit: PushedFilters reaching parquet, native-key join
  * conditions, WholeStageCodegen spans, broadcast choices. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_path_seq", "q_bgp_join", "q_filter_cmp", "q_agg_suite")
    names.foreach { n =>
      println(s"\n======================= $n =======================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
