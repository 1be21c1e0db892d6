package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Regenerates the sf1 scale-rehearsal dataset: a 10× key-shifted
  * replication of sf0.1 (each copy shifts every key/FK column by
  * c·10⁸, so joins stay copy-local and every distribution scales
  * uniformly). Usage: Test/runMain graft.demo.MakeSf1 [outDir] [parts].
  *
  * `parts` (default: the 10 copies' natural partitioning) splits every
  * table into that many files — the c8-vs-c32 scaling sweep needs ≥32
  * splits per scan or the core-count ratio is capped by the file count
  * (row groups are the split floor; guide §6). */
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
      val all = copies.reduce(_ unionByName _)
      val parted = args.drop(1).headOption match {
        case Some(n) => all.repartition(n.toInt)
        case None => all
      }
      parted.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[sf1] $table written")
    }
    spark.stop()
  }
}
