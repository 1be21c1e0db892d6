package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}

/** Stage-level profile of q_dedup_ngram at sf0.1 vs sf1 (the worst
  * 10x ratio in the rehearsal): times shingling, the df aggregate, the
  * prefix-rank, the posting/candidate stage, and the verify join
  * separately by forcing each prefix with a count. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      for (rep <- 1 to 2) {
        val (tAll, nPairs) = time(
          graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            threshold = 0.8, k = 3).count())
        println(f"[$dir rep$rep] full=$tAll%.2f s pairs=$nPairs")
      }
      // stage split: shingle+explode / df / rank
      val sh = docs.select(F.col("doc_id").as("rid"),
        graft.pipeline.Dedup.shingleHashes(F.col("text"), 3).as("sh"))
      val (tSh, nSh) = time(sh.select(F.explode(F.col("sh"))).count())
      println(f"[$dir] shingle+explode=$tSh%.2f s elems=$nSh")
      val elems = sh.select(F.col("rid"), F.size(F.col("sh")).as("n"),
        F.explode(F.col("sh")).as("k"))
      val (tDf, nDf) = time(elems.groupBy("k")
        .agg(F.count(F.lit(1)).as("kf")).where(F.col("kf") >= 2).count())
      println(f"[$dir] df-aggregate=$tDf%.2f s shared=$nDf")
    }
    spark.stop()
  }
}
