package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.{Engine, Tables, SparkEntry}

/** Scratch profiler: times stages of one SparkEntry query and prints the
  * formatted plan. Not part of the library surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q_agg_suite"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fn = SparkEntry.queries(name)
    val df = time(s"$name plan")(fn(spark, sfDir))
    time(s"$name run1")(df.count())
    time(s"$name run2")(df.count())
    df.explain("formatted")

    // stage breakdown of the Engine path
    val g = time("Tables.graph")(Tables.graph(spark, sfDir, "lineitem"))
    val e = Engine.fromGraph(g)
    val q = """PREFIX gp: <urn:graft:p/>
      SELECT ?flag (SUM(?q) AS ?sum_qty) (AVG(?q) AS ?avg_qty)
             (MIN(?q) AS ?min_qty) (MAX(?q) AS ?max_qty) (COUNT(*) AS ?n) {
        ?l gp:l_returnflag ?flag . ?l gp:l_quantity ?q } GROUP BY ?flag"""
    val raw = time("selectRaw (plan)")(e.selectRaw(q))
    time("raw count (execute)")(raw.count())
    val disp = time("select incl display pass")(e.select(q))
    time("display count")(disp.count())
    spark.stop()
  }
}
