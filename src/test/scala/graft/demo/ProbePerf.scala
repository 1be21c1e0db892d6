package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.SparkEntry

/** Scratch perf probe for the two sf1 outliers (q_dedup_ngram,
  * q_tfidf): times the full queries at sf0.1 and sf1 and breaks
  * q_tfidf into stages. Not part of any driver contract. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    for (dir <- Seq("/root/testdata/sf0.1")) {
      println(s"=== $dir")
      // warm
      spark.read.parquet(s"$dir/documents.parquet").count()
      SparkEntry.queries("q_tfidf")(spark, dir).explain("formatted")
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      println("[probe] docs partitions: " + docs0.rdd.getNumPartitions)
      time("q_tfidf")(SparkEntry.queries("q_tfidf")(spark, dir).count())
      time("q_tfidf repart32") {
        val df = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
        graft.pipeline.Relevance.tfidfVector(df, "doc_id", "text", 64)
          .select(F.col("doc_id"), F.posexplode(F.col("tfidf")))
          .where(F.col("col") =!= 0.0).count()
      }
      time("q_tfidf no-explode") {
        graft.pipeline.Relevance.tfidfVector(docs0, "doc_id", "text", 64)
          .select(F.col("doc_id"),
            F.size(F.filter(F.col("tfidf"), x => x =!= 0.0)).as("nnz"))
          .agg(F.sum("nnz")).count()
      }
      // tfidf stage breakdown
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      time("tfidf: docs.count")(docs.count())
      time("tfidf: df-bucket agg") {
        val toks = graft.pipeline.TextAnalysis.tokens(F.col("text"))
        docs.select(F.explode(F.array_distinct(
          F.transform(toks, t =>
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
              .cast(org.apache.spark.sql.types.LongType) % 64))).as("b"))
          .groupBy("b").count().count()
      }
      time("tfidf: full vector (no idf jobs)") {
        graft.pipeline.Relevance.tfidfVector(docs, "doc_id", "text", 64).count()
      }
    }
    spark.stop()
  }
}
