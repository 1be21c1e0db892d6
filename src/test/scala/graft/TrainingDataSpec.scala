package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.{Bpe, TrainingData}

/** End-to-end training-data preparation ([[TrainingData]]): token
  * conservation across the whole chain, partitioning-independent
  * determinism, the packing budget contract, the shard-deal shape, and
  * the write/reload round trip. */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs of plain repeated-vocabulary text: all pass the gates, every
  // run hits curation, BPE training, packing, and the shard deal
  private def docs = (0L until 40L).map { i =>
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "and", "lazy", "dog", "runs", "home", "again")
    (i, Seq.tabulate(30 + (i % 7).toInt)(k =>
      words(((i + k) % words.length).toInt)).mkString(" "))
  }.toDF("doc_id", "text")

  private def prep(df: org.apache.spark.sql.DataFrame) =
    TrainingData.prepare(df, "doc_id", "text",
      minQuality = 0.0, chunkSize = 16, chunkStride = 16,
      numMerges = 16, bpeSampleFraction = 1.0, maxTokens = 48,
      numShards = 4, seed = 7L)

  test("every chunk lands in exactly one sequence; tokens conserve") {
    val p = prep(docs)
    val shards = p.shards.cache()
    val keys = shards.select(F.explode(F.col("chunk_keys")).as("k"))
    // no chunk lost, none duplicated across sequences
    assert(keys.count() == keys.distinct().count())
    val nChunks = graft.pipeline.Curation.curate(docs, "doc_id", "text",
      minQuality = 0.0, chunkSize = 16, chunkStride = 16,
      normalize = true).count()
    assert(keys.count() == nChunks)
    // the packed totals equal the recounted per-chunk BPE totals
    val totalPacked = shards.agg(F.sum("total_tokens")).as[Long].head()
    val chunks = graft.pipeline.Curation.curate(docs, "doc_id", "text",
      minQuality = 0.0, chunkSize = 16, chunkStride = 16, normalize = true)
    val totalCounted = chunks.select(
        Bpe.tokenCount(F.col("chunk_text"), p.tokenizer).cast("long").as("n"))
      .agg(F.sum("n")).as[Long].head()
    assert(totalPacked == totalCounted)
    shards.unpersist()
  }

  test("packing respects the budget except documented singleton overflow") {
    val p = prep(docs)
    val bad = p.shards
      .where(F.col("total_tokens") > 48 && F.size(F.col("chunk_keys")) > 1)
    assert(bad.isEmpty)
  }

  test("byte-identical output regardless of input partitioning") {
    def dump(df: org.apache.spark.sql.DataFrame) =
      prep(df).shards
        .select(F.col("shard"), F.col("pos"), F.col("seq_id"),
          F.to_json(F.col("chunk_keys")).as("ks"), F.col("total_tokens"))
        .collect().map(_.toString).sorted.toSeq
    val a = dump(docs)
    val b = dump(docs.repartition(7))
    val c = dump(docs.orderBy(F.col("doc_id").desc))
    assert(a == b)
    assert(a == c)
    assert(a.nonEmpty)
  }

  test("shard deal: dense positions per shard, every sequence placed") {
    val p = prep(docs)
    val perShard = p.shards.groupBy("shard")
      .agg(F.count(F.lit(1)).as("n"), F.min("pos").as("lo"),
        F.max("pos").as("hi"))
      .collect()
    assert(perShard.nonEmpty && perShard.length <= 4)
    perShard.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    assert(p.shards.select("seq_id").distinct().count() ==
      p.shards.count())
  }

  test("prepareAndWrite lays out per-shard parquet a loader can stream") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val model = TrainingData.prepareAndWrite(docs, "doc_id", "text", dir,
      numShards = 3, seed = 7L, maxTokens = 48, numMerges = 16)
    assert(model.merges.nonEmpty)
    val back = spark.read.parquet(dir)
    assert(back.select("shard").distinct().count() <= 3)
    assert(back.count() > 0)
    // the partition layout really is one directory per shard
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    // the tokenizer persisted alongside, reloads identically, and its
    // underscore dir does NOT leak into the shard read above
    val reloaded = Bpe.load(spark, s"$dir/_tokenizer")
    assert(reloaded == model)
    assert(new java.io.File(s"$dir/_tokenizer").exists)
    assert(back.columns.toSet ==
      Set("shard", "pos", "seq_id", "chunk_keys", "total_tokens"))
  }

  test("non-integral or out-of-range doc ids fail loudly, never alias") {
    import spark.implicits._
    val uuidDocs = Seq(("a-uuid-not-a-number",
        "the quick brown fox jumps over the lazy dog and runs home"))
      .toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      TrainingData.prepare(uuidDocs, "doc_id", "text", minQuality = 0.0,
        chunkSize = 8, chunkStride = 8, numMerges = 4,
        bpeSampleFraction = 1.0, maxTokens = 16, numShards = 1).shards
        .collect()
    }
    assert(e1.getMessage.contains("integral doc id"))
    val hugeId = Seq(((1L << 43) + 5L,
        "the quick brown fox jumps over the lazy dog and runs home"))
      .toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      TrainingData.prepare(hugeId, "doc_id", "text", minQuality = 0.0,
        chunkSize = 8, chunkStride = 8, numMerges = 4,
        bpeSampleFraction = 1.0, maxTokens = 16, numShards = 1).shards
        .collect()
    }
    assert(e2.getMessage.contains("integral doc id"))
  }

  test("sampled tokenizer training still encodes the full corpus") {
    val p = TrainingData.prepare(docs, "doc_id", "text",
      minQuality = 0.0, chunkSize = 16, chunkStride = 16,
      numMerges = 8, bpeSampleFraction = 0.3, maxTokens = 48,
      numShards = 2, seed = 11L)
    assert(p.tokenizer.merges.nonEmpty)
    // BPE falls back to characters, so a sampled vocabulary still
    // tokenizes every chunk to a positive count
    assert(p.shards.where(F.col("total_tokens") <= 0).isEmpty)
  }
}
