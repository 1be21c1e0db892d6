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
  *   3. benchmark decontamination ([[Dedup.contamination]] 13-gram
  *      overlap, broadcast benchmark shingles, anti-join);
  *   4. context-window chunking ([[TextAnalysis.chunk]]) — narrow.
  *
  * One composed plan: Catalyst sees the whole flow, so the quality/lang
  * filters are evaluated in the first scan stage and only survivors reach
  * the dedup shuffle. Total cost at any scale = one digest-keyed shuffle
  * + one broadcast semi-join; everything else stays in the scan's
  * whole-stage-codegen span.
  *
  * Stage ORDER is part of the contract (and of the `q_curate` oracle):
  * dedup sees only gate survivors, contamination sees only dedup
  * survivors, and the benchmark side is the caller's frame, unfiltered.
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
    */
  def curate(docs: DataFrame, id: String, text: String,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      benchmark: Option[(DataFrame, String)] = None,
      contaminationK: Int = 13,
      chunkSize: Int = 64, chunkStride: Int = 48,
      htmlInput: Boolean = false,
      maxMojibake: Option[Double] = None): DataFrame = {
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
    val clean = benchmark match {
      case Some((bench, btext)) =>
        val hits = Dedup.contamination(deduped, id, text, bench, btext,
          k = contaminationK)
        deduped.join(hits.select(F.col("rid").as(id)), Seq(id), "left_anti")
      case None => deduped
    }
    TextAnalysis.chunk(clean, id, text, chunkSize, chunkStride)
  }
}
