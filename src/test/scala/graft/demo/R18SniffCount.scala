package graft.demo

import org.apache.spark.sql.SparkSession

/** Census of display-sniff executions across the whole declared query
  * corpus (VERDICT r17 task 6): builds every SparkEntry query at the
  * given SF and reports how many took the sniffing fallback (each one
  * executes its query TWICE — once for the signature pass, once for the
  * caller), and which. The static-inference work exists to shrink this
  * list toward the queries whose sources genuinely carry no schema.
  *
  * args: [sfDir]
  */
object R18SniffCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")
    var sniffed = List.empty[String]
    var built = 0
    var failed = 0
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      val before = graft.Display.sniffCount.get()
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
        built += 1
        if (graft.Display.sniffCount.get() > before) sniffed ::= name
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"BUILD FAIL $name: ${e.getClass.getSimpleName}")
      }
    }
    println(s"built=$built failed=$failed sniffing=${sniffed.size}")
    sniffed.sorted.foreach(n => println(s"sniff $n"))
    spark.stop()
  }
}
