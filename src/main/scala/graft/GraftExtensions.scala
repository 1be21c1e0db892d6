package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}
import graft.expressions.{AudioEmbedding, AudioFeatures, AudioHash, AudioHeaderMeta, CmsAgg, CosineSim, DecodeImage, DeflateSize, Gunzip, HashedTf, HtmlLinks, HtmlText, HttpMessage, ImageEmbedding, ImageFeatures, ImageHash, ImageHeaderMeta, NormalizeText, MinHashSig, ResizeImage, ResolveUrl, ShingleHashes, SimHash64, SpanHashes, Unlz4, Unsnappy, Unzstd, Utf8Lossy, VideoFeatures, VideoHeaderMeta, WarcRecords}

/** Session extensions registering the engine's native expressions as SQL
  * functions, so `spark.sql` users get the same codegen'd hot loops the
  * DataFrame pipeline uses:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions   // session config
  *   SELECT simhash64(split(text, ' ')) FROM docs
  *   SELECT shingle_hashes(split(text, ' '), 3) FROM docs
  *   SELECT minhash_sig(shingle_hashes(split(text, ' '), 3), 32) FROM docs
  * }}}
  *
  * This is the standard `SparkSessionExtensions` injection path — the
  * mechanism production sessions already use for custom rules/strategies,
  * so no internal registry access is needed. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  private def litInt(e: Expression, what: String): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // eager COUNT(*) pushdown through inner equi-joins (guide §2.3
    // "aggregate before you shuffle") — see the rule's scaladoc
    ext.injectOptimizerRule(_ => graft.optimizer.EagerCountPushdown)
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info(classOf[SimHash64], "simhash64",
        "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens) takes 1 argument")
        SimHash64(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info(classOf[ShingleHashes], "shingle_hashes",
        "shingle_hashes(tokens, k) - hashes of the k-token shingle set"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes(tokens, k) takes 2 arguments")
        ShingleHashes(args.head, litInt(args(1), "shingle size k"))
      }))
    ext.injectFunction((FunctionIdentifier("span_hashes"),
      info(classOf[SpanHashes], "span_hashes",
        "span_hashes(tokens, k) - positional k-token window hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "span_hashes(tokens, k) takes 2 arguments")
        SpanHashes(args.head, litInt(args(1), "span window size k"))
      }))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig",
        "minhash_sig(hashes, n) - n-minima MinHash signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(hashes, n) takes 2 arguments")
        MinHashSig(args.head, litInt(args(1), "signature size n"))
      }))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSim], "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes 2 arguments")
        CosineSim(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("image_header_meta"),
      info(classOf[ImageHeaderMeta], "image_header_meta",
        "image_header_meta(bytes) - (mime, width, height) from PNG/GIF/JPEG headers"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "image_header_meta(bytes) takes 1 argument")
        ImageHeaderMeta(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("audio_header_meta"),
      info(classOf[AudioHeaderMeta], "audio_header_meta",
        "audio_header_meta(bytes) - (mime, channels, sample_rate, " +
          "bits_per_sample, duration_ms) from WAV/FLAC headers"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "audio_header_meta(bytes) takes 1 argument")
        AudioHeaderMeta(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("audio_features"),
      info(classOf[AudioFeatures], "audio_features",
        "audio_features(bytes) - (n_samples, rms, peak, zcr) decoded " +
          "from PCM WAV samples"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "audio_features(bytes) takes 1 argument")
        AudioFeatures(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("video_header_meta"),
      info(classOf[VideoHeaderMeta], "video_header_meta",
        "video_header_meta(bytes) - (mime, width, height, n_frames, " +
          "duration_ms) from AVI headers"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "video_header_meta(bytes) takes 1 argument")
        VideoHeaderMeta(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("image_decode"),
      info(classOf[DecodeImage], "image_decode",
        "image_decode(bytes) - REAL pixel decode (PNG/JPEG/GIF/BMP/TIFF " +
          "via JDK codecs): (mime, width, height, mean_r, mean_g, mean_b)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "image_decode(bytes) takes 1 argument")
        DecodeImage(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("resize_image"),
      info(classOf[ResizeImage], "resize_image",
        "resize_image(bytes, maxSide) - decode, bilinear-scale the long " +
          "side to maxSide (never upscale), re-encode as PNG"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "resize_image(bytes, maxSide) takes 2 arguments")
        ResizeImage(args.head, litInt(args(1), "maxSide"))
      }))
    ext.injectFunction((FunctionIdentifier("audio_embedding"),
      info(classOf[AudioEmbedding], "audio_embedding",
        "audio_embedding(bytes, bands) - L1-normalized Goertzel band " +
          "energies (array<float>, DC..Nyquist) over the decoded samples"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "audio_embedding(bytes, bands) takes 2 arguments")
        AudioEmbedding(args.head, litInt(args(1), "bands"))
      }))
    ext.injectFunction((FunctionIdentifier("image_embedding"),
      info(classOf[ImageEmbedding], "image_embedding",
        "image_embedding(bytes, bins) - L1-normalized per-channel color " +
          "histogram (array<float> of 3*bins) over the decoded pixels"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "image_embedding(bytes, bins) takes 2 arguments")
        ImageEmbedding(args.head, litInt(args(1), "bins"))
      }))
    ext.injectFunction((FunctionIdentifier("video_features"),
      info(classOf[VideoFeatures], "video_features",
        "video_features(bytes) - decode uncompressed AVI frames: " +
          "(n_frames, width, height, mean_r, mean_g, mean_b, motion)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "video_features(bytes) takes 1 argument")
        VideoFeatures(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("html_text"),
      info(classOf[HtmlText], "html_text",
        "html_text(html) - main-content extraction: strip tags/script/" +
          "style, decode entities, collapse whitespace"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "html_text(html) takes 1 argument")
        HtmlText(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("html_links"),
      info(classOf[HtmlLinks], "html_links",
        "html_links(html) - outlink hrefs of a page (array<string>, " +
          "document order, entities decoded, fragment-only/javascript/" +
          "mailto refs dropped)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "html_links(html[, skipNofollow]) takes 1-2 arguments")
        val skip = if (args.length < 2) false else args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            b: java.lang.Boolean, _) => b.booleanValue()
          case other => throw new IllegalArgumentException(
            s"skipNofollow must be a boolean literal, got $other")
        }
        HtmlLinks(args.head, skip)
      }))
    ext.injectFunction((FunctionIdentifier("html_anchors"),
      info(classOf[graft.expressions.HtmlAnchors], "html_anchors",
        "html_anchors(html) - anchors with their link text: array of " +
          "(href, text) structs, href semantics matching html_links, " +
          "text rendered like html_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "html_anchors(html) takes 1 argument")
        graft.expressions.HtmlAnchors(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("html_base"),
      info(classOf[graft.expressions.HtmlBase], "html_base",
        "html_base(html) - the page's first <base href> (comment/" +
          "script-aware scan), or NULL; resolve against the page URL " +
          "before use"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "html_base(html) takes 1 argument")
        graft.expressions.HtmlBase(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("resolve_url"),
      info(classOf[ResolveUrl], "resolve_url",
        "resolve_url(base, ref) - RFC 3986 reference resolution of an " +
          "href against its page URL; fragment dropped"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "resolve_url(base, ref) takes 2 arguments")
        ResolveUrl(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("cdc_chunks"),
      info(classOf[graft.expressions.CdcChunks], "cdc_chunks",
        "cdc_chunks(bytes, avgBits) - FastCDC content-defined chunking: " +
          "array of (offset, length, hash) structs, expected chunk size " +
          "2^avgBits; edits only move nearby boundaries"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "cdc_chunks(bytes, avgBits) takes 2 arguments")
        graft.expressions.CdcChunks(args.head, litInt(args(1), "avgBits"))
      }))
    ext.injectFunction((FunctionIdentifier("cms_agg"),
      info(classOf[CmsAgg], "cms_agg",
        "cms_agg(tok, depth, width) - Count-Min sketch aggregate: " +
          "row-major depth*width counter matrix (array<bigint>); merge " +
          "is element-wise addition, estimates never under-count"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "cms_agg(tok, depth, width) takes 3 arguments")
        CmsAgg(args.head, litInt(args(1), "depth"), litInt(args(2), "width"))
      }))
    ext.injectFunction((FunctionIdentifier("deflate_size"),
      info(classOf[DeflateSize], "deflate_size",
        "deflate_size(x) - DEFLATE-compressed byte count of a string/" +
          "binary (zlib level 6); compression-ratio quality gates"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_size(x) takes 1 argument")
        DeflateSize(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("hashed_tf"),
      info(classOf[HashedTf], "hashed_tf",
        "hashed_tf(tokens, dim) - hashing-trick term-frequency vector " +
          "(array<double> of dim md5-bucket counts)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_tf(tokens, dim) takes 2 arguments")
        HashedTf(args.head, litInt(args(1), "dim"))
      }))
    ext.injectFunction((FunctionIdentifier("gunzip"),
      info(classOf[Gunzip], "gunzip",
        "gunzip(bytes) - decompress a gzip member (bomb-capped; " +
          "corrupt input -> NULL)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "gunzip(bytes) takes 1 argument")
        Gunzip(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("utf8_lossy"),
      info(classOf[Utf8Lossy], "utf8_lossy",
        "utf8_lossy(bytes) - decode UTF-8 with U+FFFD replacement for " +
          "ill-formed sequences (never errors, unlike ANSI decode)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "utf8_lossy(bytes) takes 1 argument")
        Utf8Lossy(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("unzstd"),
      info(classOf[Unzstd], "unzstd",
        "unzstd(bytes) - decompress a zstd frame sequence (bomb-capped; " +
          "corrupt input -> NULL)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "unzstd(bytes) takes 1 argument")
        Unzstd(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("robots_allowed"),
      info(classOf[graft.expressions.RobotsAllowed], "robots_allowed",
        "robots_allowed(robotsTxt, path, userAgent) - RFC 9309: may " +
          "this crawler fetch path? longest-pattern-wins, */$ " +
          "supported, NULL body allowed"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "robots_allowed(robotsTxt, path, userAgent) takes 3 arguments")
        val ua = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
              if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"userAgent must be a string literal, got $other")
        }
        graft.expressions.RobotsAllowed(args.head, args(1), ua.toLowerCase)
      }))
    ext.injectFunction((FunctionIdentifier("max_sim"),
      info(classOf[graft.expressions.MaxSim], "max_sim",
        "max_sim(docVecs, queryVecs) - ColBERT-style late interaction: " +
          "sum over query vectors of the best cosine over the doc's " +
          "vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "max_sim(docVecs, queryVecs) takes 2 arguments")
        graft.expressions.MaxSim(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("binary_sign"),
      info(classOf[graft.expressions.BinarySign], "binary_sign",
        "binary_sign(vec) - 1-bit embedding quantization: ceil(d/64) " +
          "longs, bit i set iff vec[i] > 0; Hamming distance between " +
          "codes approximates angular distance"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "binary_sign(vec) takes 1 argument")
        graft.expressions.BinarySign(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("zorder_key"),
      info(classOf[graft.expressions.ZorderKey], "zorder_key",
        "zorder_key(c1, ..., ck) - Morton-interleaved long over 2-4 " +
          "non-negative integral columns (64/k low bits each); sort or " +
          "range-partition by it for multi-column data skipping"),
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.length <= 4,
          "zorder_key takes 2-4 columns")
        graft.expressions.ZorderKey(args)
      }))
    ext.injectFunction((FunctionIdentifier("unlz4"),
      info(classOf[Unlz4], "unlz4",
        "unlz4(bytes) - decompress an LZ4 frame stream (bomb-capped; " +
          "corrupt input -> NULL)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "unlz4(bytes) takes 1 argument")
        Unlz4(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("unsnappy"),
      info(classOf[Unsnappy], "unsnappy",
        "unsnappy(bytes) - decompress a raw snappy block (declared " +
          "length bomb-checked pre-alloc; corrupt input -> NULL)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "unsnappy(bytes) takes 1 argument")
        Unsnappy(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info(classOf[NormalizeText], "normalize_text",
        "normalize_text(s) - NFC + control/unicode-space -> ' ', " +
          "collapse space runs, trim"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "normalize_text(s) takes 1 argument")
        NormalizeText(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("image_hash"),
      info(classOf[ImageHash], "image_hash",
        "image_hash(bytes, kind) - 64-bit perceptual hash ('ahash' 8x8 " +
          "mean-threshold or 'dhash' 9x8 gradient signs) of a decodable " +
          "image; NULL for undecodable or sub-grid input"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "image_hash(bytes, kind) takes 2 arguments")
        val kind = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
              if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"image_hash kind must be a string literal, got $other")
        }
        require(kind == "ahash" || kind == "dhash",
          s"image_hash kind must be 'ahash' or 'dhash', got '$kind'")
        ImageHash(args.head, kind == "dhash")
      }))
    ext.injectFunction((FunctionIdentifier("audio_hash"),
      info(classOf[AudioHash], "audio_hash",
        "audio_hash(bytes) - 64-bit perceptual hash of a decodable " +
          "clip (loudness-envelope gradient signs over 65 windows); " +
          "NULL for undecodable or sub-65-sample input"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "audio_hash(bytes) takes 1 argument")
        AudioHash(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("zip_entries"),
      info(classOf[graft.expressions.ZipEntries], "zip_entries",
        "zip_entries(bytes) - ZIP central directory (located via the " +
          "end-of-central-directory record): array of (name, method, " +
          "compressed, size); NULL for non-ZIP bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "zip_entries(bytes) takes 1 argument")
        graft.expressions.ZipEntries(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("zip_entry"),
      info(classOf[graft.expressions.ZipEntryBytes], "zip_entry",
        "zip_entry(bytes, name) - extract one entry (stored/deflate, " +
          "bomb-capped); missing or corrupt -> NULL"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "zip_entry(bytes, name) takes 2 arguments")
        graft.expressions.ZipEntryBytes(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("pdf_meta"),
      info(classOf[graft.expressions.PdfMeta], "pdf_meta",
        "pdf_meta(bytes) - (version, n_pages, encrypted) PDF triage; " +
          "n_pages counts /Type /Page entries (object-stream pages " +
          "undercount); NULL for non-PDF bytes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "pdf_meta(bytes) takes 1 argument")
        graft.expressions.PdfMeta(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("video_hash"),
      info(classOf[graft.expressions.VideoHash], "video_hash",
        "video_hash(bytes) - 64-bit perceptual hash of a decodable " +
          "clip (dHash of the temporally averaged frame); NULL for " +
          "undecodable or sub-9x8 input"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "video_hash(bytes) takes 1 argument")
        graft.expressions.VideoHash(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("warc_records"),
      info(classOf[WarcRecords], "warc_records",
        "warc_records(bytes) - split an uncompressed WARC segment into " +
          "record structs (warc_type, target_uri, date, record_id, " +
          "content_type, payload)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "warc_records(bytes) takes 1 argument")
        WarcRecords(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("http_message"),
      info(classOf[HttpMessage], "http_message",
        "http_message(bytes) - parse an HTTP/1.x response: (status, " +
          "content_type, content_encoding, body); chunked bodies " +
          "de-chunked"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "http_message(bytes) takes 1 argument")
        HttpMessage(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("image_features"),
      info(classOf[ImageFeatures], "image_features",
        "image_features(bytes) - (width, height, mean_r, mean_g, mean_b) " +
          "decoded from 24-bit BMP pixels"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "image_features(bytes) takes 1 argument")
        ImageFeatures(args.head)
      }))
  }
}
