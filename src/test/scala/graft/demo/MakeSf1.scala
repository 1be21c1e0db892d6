package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Regenerates the sf1 scale-rehearsal dataset: a 10× key-shifted
  * replication of sf0.1 (each copy shifts every key/FK column by
  * c·10⁸, so joins stay copy-local and every distribution scales
  * uniformly). Usage: Test/runMain graft.demo.MakeSf1 [outDir]. */
object MakeSf1 {
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
    val out = args.headOption.getOrElse("/tmp/sf1")
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
      val copies: Seq[DataFrame] = (0 until 10).map { c =>
        keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, F.col(k) + F.lit(c * 100000000L))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[sf1] $table written")
    }
    spark.stop()
  }
}
