package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.Relevance

/** Persisted inverted text index ([[Relevance.TextIndex]]): bit-exact
  * BM25 parity with the corpus-scan path, save/load round trip with
  * partition-pruned query reads, and the bucket recipe contract. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 120L).map { i =>
    val words = Seq("spark", "query", "engine", "shuffle", "join",
      "scan", "index", "plan", "token", "corpus")
    (i, Seq.tabulate(8 + (i % 9).toInt)(j =>
      words(((i * 3 + j * j) % words.length).toInt)).mkString(" "))
  }.toDF("doc_id", "text")

  private val query = Seq("index", "shuffle", "plan")

  /** bm25's own top-k over positive-scoring docs — the truth search
    * must reproduce exactly. */
  private def truth(k: Int): Seq[(Long, Double)] =
    Relevance.bm25(docs, "text", query)
      .where(F.col("bm25") > 0)
      .orderBy(F.col("bm25").desc, F.col("doc_id").asc)
      .limit(k)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toSeq

  test("index search equals the corpus-scan bm25 top-k bit for bit") {
    val idx = Relevance.TextIndex.fit(docs, "doc_id", "text", buckets = 16)
    val got = idx.search(query, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == truth(10))
    assert(got.nonEmpty)
  }

  test("save/load round-trips and the probe read is partition-pruned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-text-index").toString
    Relevance.TextIndex.fit(docs, "doc_id", "text", buckets = 16).save(dir)
    val idx = Relevance.TextIndex.load(spark, dir)
    val got = idx.search(query, 10).as[(Long, Double)].collect().toSeq
    assert(got == truth(10))
    // the scan carries PartitionFilters on __bucket: a query touches
    // only its terms' buckets, not the whole posting store
    val plan = idx.search(query, 10).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("__bucket"), plan)
  }

  test("bucket recipe: driver-side bucketOf equals the stored column") {
    val idx = Relevance.TextIndex.fit(docs, "doc_id", "text", buckets = 16)
    val mismatch = idx.postings.where(F.col("__bucket") =!=
      F.udf((t: String) => Relevance.TextIndex.bucketOf(t, 16))
        .apply(F.col("term")))
    assert(mismatch.isEmpty)
  }

  test("deterministic results under any input partitioning") {
    val a = Relevance.TextIndex.fit(docs, "doc_id", "text", 16)
      .search(query, 10).as[(Long, Double)].collect().toSeq
    val b = Relevance.TextIndex.fit(docs.repartition(7), "doc_id", "text", 16)
      .search(query, 10).as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
