package graft.demo

import org.apache.spark.sql.SparkSession

/** Quantifies the display-projection overhead (guide §1: measure first):
  * select (with display projection) vs selectRaw (term structs) for two
  * headline queries, plan-build and count separately, best of 5. */
object R17Display {
  def main(args: Array[String]): Unit = {
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
    val P = "PREFIX gp: <urn:graft:p/>\n"
    val qs = Seq(
      ("path_seq", Seq("lineitem", "orders", "customer"),
        """SELECT ?cname (COUNT(*) AS ?cnt) {
             ?l gp:l_order_ref/gp:o_cust_ref/gp:c_name ?cname } GROUP BY ?cname"""),
      ("bgp_join", Seq("customer", "nation"),
        """SELECT ?cname ?nname {
             ?c gp:c_nation_ref ?n . ?c gp:c_name ?cname . ?n gp:n_name ?nname }"""))
    for ((nm, tables, q) <- qs) {
      val e = graft.Engine.fromGraph(graft.Tables.graph(spark, sfDir, tables: _*))
      // warm both paths once
      e.select(P + q).count(); e.selectRaw(P + q).count()
      def best(f: => Unit): Double =
        (1 to 5).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val tSelPlan = best { e.select(P + q) }
      val tSel = best { e.select(P + q).count() }
      val tRawPlan = best { e.selectRaw(P + q) }
      val tRaw = best { e.selectRaw(P + q).count() }
      // how long does Catalyst spend just (re)optimizing the display plan?
      val dfS = e.select(P + q)
      val tOpt = best { dfS.queryExecution.optimizedPlan }
      println(f"[$nm] select plan=$tSelPlan%.3f total=$tSel%.3f | " +
        f"raw plan=$tRawPlan%.3f total=$tRaw%.3f | optimize(once)=$tOpt%.3f")
    }
    spark.stop()
  }
}
