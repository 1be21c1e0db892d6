package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.types._

import graft.sources.Warc

/** The end-to-end crawl flagship: one call from raw WARC files to the
  * three artifacts a crawl round produces —
  *
  *  1. a curated text corpus (HTML-extracted, gated, deduped, chunked
  *     — [[Curation.curate]]),
  *  2. the crawl FRONTIER (new URLs to fetch next —
  *     [[Graphs.frontierUrls]]),
  *  3. host PageRank quality priors ([[Graphs.pageRankHosts]]).
  *
  * Composition, not new machinery: every stage is an operator this
  * library already verifies one by one; this object pins the glue —
  * response filtering, content-encoding unwrap, charset decode, the
  * deterministic document id — so a user gets the whole crawl round as
  * one tested call.
  *
  * Scale posture: ingestion is the constant-memory streamed WARC reader
  * (one task per file), page prep is narrow (status/mime gates, per-row
  * gunzip, UTF-8 decode, html_text inside curate), and the only
  * corpus-wide exchanges are the ones the component operators already
  * budget (curation's digest shuffle, the frontier/host-edge
  * distincts, PageRank's host-sized iterations). */
object Crawl {

  /** The three outputs of one crawl round. */
  final case class Round(
      documents: DataFrame,
      frontier: DataFrame,
      hostRanks: DataFrame)

  /** HTML pages of the crawl: `response` records with a 200 status and
    * an HTML content type, bodies gunzipped when Content-Encoding says
    * so and decoded as UTF-8 (the de facto crawl default; mojibake
    * gating downstream catches mislabeled charsets). Returns
    * (url, html), with a deterministic 64-bit `doc_id` = xxhash64(url)
    * — re-runs and engines agree on ids without coordination. */
  def htmlPages(records: DataFrame): DataFrame = {
    val pages = Warc.pages(records)
    val body = F.when(F.lower(F.col("content_encoding")) === "gzip",
      Multimodal.gunzip(F.col("body"))).otherwise(F.col("body"))
    pages
      .where(F.col("status") === 200 &&
        F.col("url").isNotNull &&
        F.lower(F.col("mime")).startsWith("text/html"))
      .select(F.xxhash64(F.col("url")).as("doc_id"), F.col("url"),
        F.decode(body, "UTF-8").as("html"))
      .where(F.col("html").isNotNull)
  }

  /** One crawl round over a WARC directory: read (streamed, constant
    * memory per task) → [[htmlPages]] → curate + frontier + host ranks.
    * `seenUrls` is the already-fetched URL set (one string column named
    * `url`); when absent the frontier is every resolved outlink the
    * batch itself doesn't host. Curation knobs pass through to
    * [[Curation.curate]] with `htmlInput = true`. */
  def round(spark: SparkSession, warcPath: String,
      seenUrls: Option[DataFrame] = None,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      chunkSize: Int = 64, chunkStride: Int = 48,
      maxMojibake: Option[Double] = Some(0.05),
      pageRankIters: Int = 5): Round = {
    val pages = htmlPages(Warc.readStreamed(spark, warcPath))
    roundFromPages(spark, pages, seenUrls, minQuality, langs, chunkSize,
      chunkStride, maxMojibake, pageRankIters)
  }

  /** [[round]] starting from an already-materialized (doc_id, url,
    * html) frame — the entry point when pages come from a non-WARC
    * source or a test fixture. */
  def roundFromPages(spark: SparkSession, pages: DataFrame,
      seenUrls: Option[DataFrame] = None,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),
      chunkSize: Int = 64, chunkStride: Int = 48,
      maxMojibake: Option[Double] = Some(0.05),
      pageRankIters: Int = 5): Round = {
    val docs = Curation.curate(
      pages.select(F.col("doc_id"), F.col("html").as("text")),
      "doc_id", "text",
      minQuality = minQuality, langs = langs,
      chunkSize = chunkSize, chunkStride = chunkStride,
      htmlInput = true, maxMojibake = maxMojibake)
    val seen = seenUrls.getOrElse {
      import spark.implicits._
      Seq.empty[String].toDF("url")
    }
    val frontier = Graphs.frontierUrls(pages, seen)
    val ranks = Graphs.pageRankHosts(Graphs.hostEdges(pages),
      iters = pageRankIters)
    Round(docs, frontier, ranks)
  }
}
