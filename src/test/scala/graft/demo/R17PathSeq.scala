package graft.demo

import org.apache.spark.sql.{SparkSession, DataFrame, functions => F}

/** Candidate physical shapes for q_path_seq, hand-built (guide §1.1
  * first-principles): which change actually moves the wall time?
  *  A: engine's current shape (struct group key, broadcast chain)
  *  B: group by raw c_name string, wrap struct after (literal late
  *     materialization)
  *  C: A + repartition lineitem right after the single-row-group scan
  *  D: eager aggregation — count lineitem per order key first, then
  *     join + re-aggregate (Yan-Larson)
  */
object R17PathSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val or = spark.read.parquet(s"$sfDir/orders.parquet")
    val cu = spark.read.parquet(s"$sfDir/customer.parquet")
    li.count(); or.count(); cu.count()
    def struct(c: org.apache.spark.sql.Column) = F.struct(
      F.lit(2.toByte).as("kind"), c.as("value"),
      F.lit("http://www.w3.org/2001/XMLSchema#string").as("dt"),
      F.lit(null.asInstanceOf[String]).as("lang"))
    def a(): DataFrame = {
      val oc = or.select(F.col("o_orderkey"), F.col("o_custkey"))
        .join(F.broadcast(cu.select(F.col("c_custkey"),
          struct(F.col("c_name")).as("po2"))),
          F.col("o_custkey") === F.col("c_custkey"))
        .select("o_orderkey", "po2")
      li.select("l_orderkey").join(F.broadcast(oc),
        F.col("l_orderkey") === F.col("o_orderkey"))
        .groupBy("po2").agg(F.count(F.lit(1)).as("cnt"))
    }
    def b(): DataFrame = {
      val oc = or.select(F.col("o_orderkey"), F.col("o_custkey"))
        .join(F.broadcast(cu.select(F.col("c_custkey"), F.col("c_name"))),
          F.col("o_custkey") === F.col("c_custkey"))
        .select("o_orderkey", "c_name")
      li.select("l_orderkey").join(F.broadcast(oc),
        F.col("l_orderkey") === F.col("o_orderkey"))
        .groupBy("c_name").agg(F.count(F.lit(1)).as("cnt"))
        .select(struct(F.col("c_name")).as("po2"), F.col("cnt"))
    }
    def c(): DataFrame = {
      val oc = or.select(F.col("o_orderkey"), F.col("o_custkey"))
        .join(F.broadcast(cu.select(F.col("c_custkey"),
          struct(F.col("c_name")).as("po2"))),
          F.col("o_custkey") === F.col("c_custkey"))
        .select("o_orderkey", "po2")
      li.select("l_orderkey").repartition(32).join(F.broadcast(oc),
        F.col("l_orderkey") === F.col("o_orderkey"))
        .groupBy("po2").agg(F.count(F.lit(1)).as("cnt"))
    }
    def d(): DataFrame = {
      val perOrder = li.select("l_orderkey").groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).as("c0"))
      val oc = or.select(F.col("o_orderkey"), F.col("o_custkey"))
        .join(F.broadcast(cu.select(F.col("c_custkey"),
          struct(F.col("c_name")).as("po2"))),
          F.col("o_custkey") === F.col("c_custkey"))
        .select("o_orderkey", "po2")
      perOrder.join(F.broadcast(oc),
        F.col("l_orderkey") === F.col("o_orderkey"))
        .groupBy("po2").agg(F.sum("c0").as("cnt"))
    }
    def e(): DataFrame = {
      val oc = or.select(F.col("o_orderkey"), F.col("o_custkey"))
        .join(F.broadcast(cu.select(F.col("c_custkey"),
          struct(F.col("c_name")).as("po2"))),
          F.col("o_custkey") === F.col("c_custkey"))
        .select("o_orderkey", "po2")
      val j = li.select("l_orderkey").join(F.broadcast(oc),
        F.col("l_orderkey") === F.col("o_orderkey"))
      val g = j.groupBy(
          F.col("po2.kind").as("__k"), F.col("po2.value").as("__v"),
          F.col("po2.dt").as("__d"), F.col("po2.lang").as("__l"))
        .agg(F.count(F.lit(1)).as("cnt"))
      g.select(F.when(F.col("__k").isNull && F.col("__v").isNull &&
          F.col("__d").isNull && F.col("__l").isNull,
          F.lit(null).cast(g.schema("__k").dataType)).otherwise(F.col("__k"))
          .as("dead"), // placeholder so the shape matches; real rebuild below
        F.struct(F.col("__k").as("kind"), F.col("__v").as("value"),
          F.col("__d").as("dt"), F.col("__l").as("lang")).as("po2"),
        F.col("cnt")).drop("dead")
    }
    for ((nm, f) <- Seq[(String, () => DataFrame)](
        ("A-current", a _), ("B-rawkey", b _), ("C-repart", c _),
        ("D-eager", d _), ("E-fields", e _))) {
      f().count() // warm codegen
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$nm%-10s best=${t.min}%.3f med=${t.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
