package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Generalized scale-rehearsal generator: an N× key-shifted replication
  * of sf0.1 (each copy shifts every key/FK column by c·10⁸, so joins
  * stay copy-local and every distribution scales uniformly), split into
  * `parts` files per table so scans can parallelize past the file-count
  * floor (guide §6). Built for the c8-vs-c32 scaling demonstration:
  * sf1's per-query compute is still dominated by the per-query driver
  * floor, so core-count ratios only become visible at sf10+.
  *
  * Usage: Test/runMain graft.demo.MakeSfN <outDir> <copies> <parts>
  */
object MakeSfN {
  private val shiftCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val copies = args(1).toInt
    val parts = args(2).toInt
    require(copies <= 100, "key shift is c*10^8; sf0.1 keys stay below it")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    shiftCols.foreach { case (table, keys) =>
      val base = graft.Tables.read(spark, "/root/testdata/sf0.1", table)
      // one explode over a copy-index range beats a 100-way union plan
      val shifted = keys.foldLeft(
        base.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))))) {
        (df, k) => df.withColumn(k, F.col(k) + F.col("__c") * F.lit(100000000L))
      }.drop("__c")
      shifted.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[sfN] $table written x$copies in $parts parts")
    }
    spark.stop()
  }
}
