package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.{Dedup, Similarity}

/** Pipeline operators over the driver's documents/embeddings fixtures:
  * ANN variants agree with the exact baseline on easy queries; dedup
  * detects known exact duplicates. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.read(spark, dir, "embeddings")
  private lazy val docs = Tables.read(spark, dir, "documents")

  private lazy val qVec = emb.where(F.col("vec_id") === 0)
    .select("embedding").collect()(0).getSeq[Float](0)
  private lazy val corpus = emb.where(F.col("vec_id") =!= 0)

  test("brute-force top-k is sorted and sized") {
    val r = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qVec, 5)
      .collect()
    assert(r.length == 5)
    val cos = r.map(_.getDouble(1)).toSeq
    assert(cos == cos.sorted.reverse)
  }

  test("IVF top-k finds the exact top-1 with full probing") {
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qVec, 5)
      .collect().map(_.getLong(0)).toSeq
    // nprobe == nlist → IVF degenerates to exact search
    val all = Similarity.ivfTopK(corpus, "vec_id", "embedding", qVec, 5,
      nlist = 4, nprobe = 4).collect().map(_.getLong(0)).toSeq
    assert(all == exact)
    // partial probing returns k results with the right shape
    val part = Similarity.ivfTopK(corpus, "vec_id", "embedding", qVec, 5,
      nlist = 4, nprobe = 2).collect()
    assert(part.length == 5)
  }

  test("LSH top-k with full multi-probe overlaps the exact result") {
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qVec, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(corpus, "vec_id", "embedding", qVec, 10,
      planes = 4, probes = 2).collect().map(_.getLong(0)).toSet
    assert((exact intersect lsh).nonEmpty)
  }

  test("exact dedup groups detect duplicated documents") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    val dupGroups = groups.where(F.col("n") > 1).count()
    val total = docs.count()
    val distinctTexts = docs.select("text").distinct().count()
    assert(groups.count() == distinctTexts)
    assert((dupGroups > 0) == (distinctTexts < total))
  }

  test("minhash near-dup pairs include exact duplicates") {
    val dupPair = docs.groupBy("text").agg(
        F.min("doc_id").as("a"), F.max("doc_id").as("b"), F.count(F.lit(1)).as("n"))
      .where(F.col("n") > 1).limit(1).collect()
    if (dupPair.nonEmpty) {
      val (a, b) = (dupPair(0).getLong(0), dupPair(0).getLong(1))
      val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text",
        threshold = 0.99, k = 3, numHashes = 32, bands = 8)
        .where(F.col("id1") === a && F.col("id2") === b)
      assert(pairs.count() == 1)
    }
  }
}
