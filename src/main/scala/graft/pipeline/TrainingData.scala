package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._

/** The END-TO-END training-data preparation flagship: raw documents in,
  * shuffled fixed-token-budget training sequences out, as one composed
  * Spark pipeline —
  *
  *   curate (gates → dedup → decontaminate → chunk)
  *     → train a BPE tokenizer on a SAMPLE of the surviving chunks
  *     → exact per-chunk subword counts (narrow, codegen'd)
  *     → greedy first-fit packing into `maxTokens` sequences
  *     → deterministic md5-keyed shuffle into `numShards` shards.
  *
  * This is the composition a pretraining run actually executes, and the
  * stages keep their individual scale shapes: curation contributes ONE
  * digest exchange (+ its optional stages), tokenizer training reads
  * only a sample (one word-count aggregate over `bpeSampleFraction` of
  * the corpus — the standard practice; a tokenizer doesn't need every
  * byte), counting is a narrow map over the chunk scan, packing is one
  * hash repartition + a per-partition streaming fold, and the final
  * shuffle is one exchange keyed by reproducible md5. Nothing in the
  * chain materializes the corpus on the driver; the only collect is the
  * vocabulary-capped BPE word table ([[Bpe.train]]).
  *
  * Determinism end to end: every stage is order- and
  * partitioning-independent (curation keeps min ids, the tokenizer
  * sample is seeded `sample(false, f, seed)` — re-evaluation-stable for
  * a given input file set — packing sorts within hash partitions,
  * the shard deal is md5-keyed), so a rerun over the same files
  * produces byte-identical shards.
  */
object TrainingData {

  /** Chunks keyed for packing: doc id and chunk id fold into one long
    * (id · 2²⁰ + chunk_id), invertible for lineage as long as no doc
    * chunks more than 2²⁰ times — enforced, not assumed. */
  private val MaxChunksPerDoc = 1 << 20

  final case class Prepared(shards: DataFrame, tokenizer: Bpe.Model)

  /** Prepare training shards from raw documents. Returns the shard
    * frame — (shard, pos, seq_id, chunk_keys, total_tokens) with
    * `chunk_key = doc_id · 2²⁰ + chunk_id` — plus the trained
    * tokenizer (needed again at training time to encode the text).
    *
    * Curation knobs are the common subset; callers needing the full
    * gate set can run [[Curation.curate]] themselves and hand the
    * chunks to [[prepareFromChunks]]. */
  def prepare(docs: DataFrame, id: String, text: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      benchmark: Option[(DataFrame, String)] = None,
      chunkSize: Int = 1024, chunkStride: Int = 1024,
      htmlInput: Boolean = false,
      normalize: Boolean = true,
      nearDupJaccard: Option[Double] = None,
      numMerges: Int = 256,
      bpeSampleFraction: Double = 0.1,
      maxTokens: Long = 2048,
      numShards: Int = 64,
      seed: Long = 0L,
      packPartitions: Int = 0): Prepared = {
    val chunks = Curation.curate(docs, id, text,
      minQuality = minQuality, langs = langs, benchmark = benchmark,
      chunkSize = chunkSize, chunkStride = chunkStride,
      htmlInput = htmlInput, normalize = normalize,
      nearDupJaccard = nearDupJaccard)
    prepareFromChunks(chunks, id, "chunk_id", "chunk_text",
      numMerges, bpeSampleFraction, maxTokens, numShards, seed,
      packPartitions)
  }

  /** The post-curation half: tokenize, pack, and shuffle existing
    * chunks (any frame with a doc id, a chunk ordinal, and text). */
  def prepareFromChunks(chunks: DataFrame, id: String, chunkId: String,
      text: String, numMerges: Int = 256,
      bpeSampleFraction: Double = 0.1, maxTokens: Long = 2048,
      numShards: Int = 64, seed: Long = 0L,
      packPartitions: Int = 0): Prepared = {
    require(bpeSampleFraction > 0 && bpeSampleFraction <= 1,
      s"bpeSampleFraction must be in (0, 1], got $bpeSampleFraction")
    // the chain reads `chunks` twice (tokenizer aggregate + the count
    // scan); checkpoint so curation's gates and dedup run once
    val pinned = chunks.localCheckpoint(false)
    val model = Bpe.train(
      if (bpeSampleFraction < 1)
        pinned.sample(withReplacement = false, bpeSampleFraction, seed)
      else pinned,
      text, numMerges)
    // the key's invariants fail loudly IN the scan (no extra validation
    // job), never alias silently: chunk ordinal < 2²⁰, and the doc id
    // must be a non-null integral in [0, 2⁴³) so id·2²⁰ cannot
    // overflow or collide (a string/UUID id casts to NULL and lands
    // here too, instead of an opaque NPE later in packing)
    val idL = F.col(id).cast(LongType)
    val chkL = F.col(chunkId).cast(LongType)
    val chunkKey = F.when(
        idL.isNotNull && idL >= 0 && idL < (1L << 43) &&
          chkL.isNotNull && chkL >= 0 && chkL < MaxChunksPerDoc,
        idL * MaxChunksPerDoc + chkL)
      .otherwise(F.raise_error(F.lit(
        s"chunk_key needs an integral doc id in [0, 2^43) and a chunk " +
          s"ordinal in [0, $MaxChunksPerDoc); got a row outside that " +
          "domain (string/UUID ids: map them to longs first)")))
    val counted = pinned.select(chunkKey.as("chunk_key"),
      Bpe.tokenCount(F.col(text), model).cast(LongType).as("n_bpe_tokens"))
    // an explicit packPartitions makes the packing layout part of the
    // caller's contract (reproducible across sessions AND restatable
    // by a SQL oracle); 0 keeps the session's shuffle parallelism
    val packed = Packing.packSequences(
      counted, "chunk_key", "n_bpe_tokens", maxTokens,
      partitions = packPartitions)
    val shards = TextAnalysis.shuffleShards(
        packed.withColumnRenamed("doc_ids", "chunk_keys"),
        "seq_id", numShards, seed)
      .select("shard", "pos", "seq_id", "chunk_keys", "total_tokens")
    Prepared(shards, model)
  }

  /** [[prepare]] + write: one parquet directory per shard
    * (`partitionBy(shard)`, rows sorted by pos within each), the layout
    * a training loader reads sequentially, plus the tokenizer persisted
    * at `path/_tokenizer` ([[Bpe.save]] — the underscore prefix keeps
    * Spark's file listing from mixing it into the shard read). Returns
    * the tokenizer. */
  def prepareAndWrite(docs: DataFrame, id: String, text: String,
      path: String, numShards: Int = 64, seed: Long = 0L,
      maxTokens: Long = 2048, numMerges: Int = 256): Bpe.Model = {
    val prepared = prepare(docs, id, text, numShards = numShards,
      seed = seed, maxTokens = maxTokens, numMerges = numMerges)
    prepared.shards
      .repartition(numShards, F.col("shard"))
      .sortWithinPartitions(F.col("shard"), F.col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    Bpe.save(prepared.tokenizer, docs.sparkSession, s"$path/_tokenizer")
    prepared.tokenizer
  }
}
