package graft.demo

import org.apache.spark.sql.{SparkSession, functions => F}

import graft.Tables
import graft.pipeline.{Dedup, Graphs, Relevance, Sketches, Similarity}

/** Scale probe for the round-10 operators: times each over a given
  * sfDir (run at sf0.1 and the 10× sf1 rehearsal to check nothing is
  * super-linear). Usage: Test/runMain graft.demo.ProbeR10 <sfDir>. */
object ProbeR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String) = Tables.read(spark, sfDir, t)
    def time(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-22s $sec%8.3f s  ($rows rows)")
    }

    val docs = read("documents")
    val toks = docs.select(F.explode(F.split(F.col("text"), " ")).as("tok"))
      .where(F.col("tok") =!= "")

    time("heavy_hitters") {
      Sketches.heavyHitters(toks, "tok", minCount = 100L).count()
    }
    time("cms_sketch") {
      Sketches.cmsSketch(toks, "tok").length.toLong
    }
    val emb = read("embeddings")
    val q = emb.where(F.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    time("binary_topk") {
      Similarity.binaryTopK(emb, "vec_id", "embedding", q, 10,
        rerank = 100).count()
    }
    time("maxsim_topk") {
      val docsV = emb.select(F.col("vec_id"), F.array(F.col("embedding"),
        F.transform(F.col("embedding"), x => -x)).as("vecs"))
      Similarity.maxSimTopK(docsV, "vec_id", "vecs", Seq(q), 10).count()
    }
    val pages = docs.select(F.col("doc_id"),
      F.concat(F.lit("http://h"), F.col("doc_id") % 97,
        F.lit(".example/p/"), F.col("doc_id")).as("url"),
      F.concat(F.lit("<a href=\"http://h"), (F.col("doc_id") + 1) % 97,
        F.lit(".example/x"), F.col("doc_id") % 1000,
        F.lit("\">n</a><a href=\"/p/"), F.col("doc_id"),
        F.lit("\">s</a>")).as("html"))
    time("host_edges+rank") {
      Graphs.pageRankHosts(Graphs.hostEdges(pages), iters = 3).count()
    }
    time("frontier") {
      Graphs.frontierUrls(pages,
        pages.limit(0).select(F.col("url"))).count()
    }
    time("rrf_fuse") {
      val a = docs.select(F.col("doc_id").as("id"),
        F.col("n_chars").cast("double").as("score"))
      val b = docs.select(F.col("doc_id").as("id"),
        ((F.col("doc_id") * 37) % 101).cast("double").as("score"))
      Relevance.rrfFuse(Seq(a, b), "id", "score", 20).count()
    }
    time("corpus_diff") {
      Dedup.corpusDiff(
        docs.where(F.col("doc_id") % 9 =!= 0),
        docs.where(F.col("doc_id") % 7 =!= 0)).count()
    }
    time("zorder_write") {
      val dir = java.nio.file.Files.createTempDirectory("probe-z").toString
      Tables.writeZordered(read("lineitem"),
        Seq("l_orderkey", "l_partkey"), s"$dir/z", numFiles = 32)
      spark.read.parquet(s"$dir/z").count()
    }
    spark.stop()
  }
}
