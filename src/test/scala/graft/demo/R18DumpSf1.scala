package graft.demo

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** sf1 plan evidence for the round-18 scale work, where the engine
  * steers fact⋈dim joins to shuffle_hash and the eager-aggregation
  * pushdown arms:
  *  - q_path_seq (COUNT through the chain join): regression check that
  *    the widened rule still fires as in r17, now with the literal
  *    companion as the group key;
  *  - a SUM-over-join engine query (the q_agg_suite aggregate set over
  *    the lineitem⋈orders join): the SUM/MIN/MAX decomposition's plan
  *    dump — per-key partials below the join.
  * Each shape is dumped with the rule on and off.
  *
  * args: [sfDir]   (default /tmp/sf1)
  */
object R18DumpSf1 {
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
    Files.createDirectories(Paths.get("plans/r18"))
    val P = "PREFIX gp: <http://graft.dev/prop/> "
    val sumQ = P + """SELECT ?okey (SUM(?q) AS ?s) (MIN(?q) AS ?mn) {
        ?l gp:l_order_ref ?o . ?l gp:l_quantity ?q .
        ?o gp:o_orderkey ?okey } GROUP BY ?okey"""

    def dump(name: String, tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
        "\n\n===== AQE final plan =====\n" +
        df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(s"plans/r18/${name}_sf1_$tag.txt"), txt)
      val opt = df.queryExecution.optimizedPlan.toString
      println(s"$name $tag fired=" +
        (opt.contains("__graft_c0") || opt.contains("__graft_a")))
    }

    val e = graft.Engine.fromGraph(
      graft.Tables.graph(spark, dir, "lineitem", "orders"))
    for ((prop, tag) <- Seq(("true", "pushdown"), ("false", "nopushdown"))) {
      spark.conf.set("spark.graft.eagerCountPushdown", prop)
      dump("q_path_seq", tag, graft.SparkEntry.queries("q_path_seq")(spark, dir))
      dump("q_sum_join", tag, e.select(sumQ))
    }
    spark.stop()
  }
}
