package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** End-to-end training-corpus curation: the canonical composition of the
  * pipeline stages a pretraining data run applies before tokenization —
  *
  *   0. (optional) HTML main-content extraction
  *      ([[TextAnalysis.htmlText]]) — narrow, shuffle-free, so raw
  *      crawl pages feed the same pipeline as plain text;
  *   1. quality + language gate  ([[TextAnalysis.qualityScore]],
  *      [[TextAnalysis.langId]]) — narrow, shuffle-free;
  *   2. exact dedup keeping the smallest id ([[Dedup.exactDedup]] over an
  *      md5 digest, so the one shuffle keys on 32 hex chars, never the
  *      document body);
  *   3. (optional) FUZZY near-dup removal ([[Dedup.minhashDedupPairs]]
  *      at a Jaccard threshold → [[Dedup.dedupGroups]] connected
  *      components → keep each group's min id) — what a real
  *      pretraining run does after exact dedup;
  *   4. benchmark decontamination ([[Dedup.contamination]] 13-gram
  *      overlap, broadcast benchmark shingles, anti-join);
  *   5. context-window chunking ([[TextAnalysis.chunk]]) — narrow.
  *
  * One composed plan: Catalyst sees the whole flow, so the quality/lang
  * filters are evaluated in the first scan stage and only survivors reach
  * the dedup shuffle. Total cost at any scale = one digest-keyed shuffle
  * + one broadcast semi-join (+ with the fuzzy stage: one capped
  * posting-list shuffle, the verify join, and the O(log n)
  * pointer-doubling rounds over just the PAIRS — pairs are a tiny
  * fraction of the corpus, so the added cost is dominated by the
  * signature scan); everything else stays in the scan's
  * whole-stage-codegen span.
  *
  * Stage ORDER is part of the contract (and of the `q_curate` /
  * `q_curate_fuzzy` oracles): dedup sees only gate survivors, the fuzzy
  * stage only exact-dedup survivors, contamination only fuzzy survivors,
  * and the benchmark side is the caller's frame, unfiltered.
  */
object Curation {

  /** Curate `docs` into training chunks. Returns
    * (id, chunk_id, chunk_text, n_chunk_tokens) for the surviving corpus.
    *
    * @param minQuality  keep docs with [[TextAnalysis.qualityScore]] ≥ this
    *                    (the score is rounded to 6 decimals on both the
    *                    engine and oracle side, so the comparison is exact)
    * @param langs       keep docs whose [[TextAnalysis.langId]] is in this set
    * @param benchmark   optional (frame, textCol) to decontaminate against;
    *                    docs sharing ≥1 `contaminationK`-gram are dropped
    * @param htmlInput   when true, the text column holds raw HTML and is
    *                    run through [[TextAnalysis.htmlText]] first — every
    *                    later stage (gate, digest, shingles, chunking)
    *                    sees the extracted text
    * @param maxMojibake when set, drop docs whose
    *                    [[TextAnalysis.mojibakeRatio]] exceeds it (the
    *                    standard crawl encoding filter; stays in the
    *                    same narrow scan stage as the quality gate)
    * @param nearDupJaccard when set, remove FUZZY near-duplicates after
    *                    exact dedup: MinHash-LSH candidate pairs at this
    *                    Jaccard threshold (`nearDupK`-token shingles)
    *                    collapse into connected components and only each
    *                    group's smallest id survives
    * @param nearDupK    shingle width for the fuzzy stage
    */
  def curate(docs: DataFrame, id: String, text: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      benchmark: Option[(DataFrame, String)] = None,
      contaminationK: Int = 13,
      chunkSize: Int = 64, chunkStride: Int = 48,
      htmlInput: Boolean = false,
      maxMojibake: Option[Double] = None,
      nearDupJaccard: Option[Double] = None,
      nearDupK: Int = 3): DataFrame = {
    require(!docs.columns.contains("__digest"),
      "docs must not contain the internal marker column __digest")
    val input =
      if (htmlInput) docs.withColumn(text, TextAnalysis.htmlText(F.col(text)))
      else docs
    val encodingOk = maxMojibake match {
      case Some(t) => TextAnalysis.mojibakeRatio(F.col(text)) <= t
      case None => F.lit(true)
    }
    val gated = input.where(encodingOk &&
      TextAnalysis.qualityScore(F.col(text)) >= minQuality &&
        TextAnalysis.langId(F.col(text)).isInCollection(langs))
    val deduped = Dedup
      .exactDedup(gated.withColumn("__digest", F.md5(F.col(text))),
        id, "__digest")
      .drop("__digest")
    val fuzzy = nearDupJaccard match {
      case Some(t) =>
        // near-dup groups among the exact-dedup survivors; each group's
        // min id is the keeper, every other member anti-joins away
        val pairs = Dedup.minhashDedupPairs(deduped, id, text,
          threshold = t, k = nearDupK)
        val losers = Dedup.dedupGroups(pairs)
          .where(F.col("grp") =!= F.col("rid"))
          .select(F.col("rid").as(id))
        deduped.join(losers, Seq(id), "left_anti")
      case None => deduped
    }
    val clean = benchmark match {
      case Some((bench, btext)) =>
        val hits = Dedup.contamination(fuzzy, id, text, bench, btext,
          k = contaminationK)
        fuzzy.join(hits.select(F.col("rid").as(id)), Seq(id), "left_anti")
      case None => fuzzy
    }
    TextAnalysis.chunk(clean, id, text, chunkSize, chunkStride)
  }
}
