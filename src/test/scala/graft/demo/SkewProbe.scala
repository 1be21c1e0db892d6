package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}

/** Isolated repeat-measurement of BenchSf1's Zipf-skew shuffle-join
  * rehearsal — AQE skew-join on vs off, N alternating reps each, so a
  * single co-tenant spike can't brand either mode. Prints per-rep
  * times; no artifact. Usage: Test/runMain graft.demo.SkewProbe [reps]. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    def run(skewOn: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      val fact = spark.range(20000000L).select(
        (F.pow(F.rand(42), F.lit(8.0)) * 100000).cast("long").as("k"),
        (F.col("id") % 1000).as("v"))
      val dim = spark.range(100000L)
        .select(F.col("id").as("k"), (F.col("id") * 2).as("w"))
      val t0 = System.nanoTime()
      fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w"))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    run(skewOn = true) // warm
    val times = (1 to reps).flatMap { i =>
      val off = run(skewOn = false)
      val on = run(skewOn = true)
      println(f"[skew-probe] rep $i off=$off%.2f on=$on%.2f")
      Seq(("off", off), ("on", on))
    }
    def best(m: String) = times.collect { case (`m`, t) => t }.min
    println(f"[skew-probe] best off=${best("off")}%.2f on=${best("on")}%.2f")
    spark.stop()
  }
}
