package graft.demo

import org.apache.spark.sql.SparkSession
import graft._
import graft.rdf._

/** Manual drive of the public API (what a user of the library does) —
  * used by /verify-style runtime checks: `sbt "Test/runMain graft.demo.Drive"`. */
object Drive {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .appName("graft-drive")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val engine = Engine.inline(
      """
        @prefix : <http://example.com/> .
        :New_York_City :boro :Manhattan , :Brooklyn , :The_Bronx , :Queens , :Staten_Island .
        :Manhattan :pop 1628706 . :Brooklyn :pop 2576771 .
        :Queens :pop 2270976 . :The_Bronx :pop 1418207 . :Staten_Island :pop 476143 .
      """)
    engine.bindNamespace("", "http://example.com/")

    println("=== graph size: " + engine.graph.size)

    println("=== boroughs by population desc:")
    engine.select(
      """SELECT ?boro ?pop {
           :New_York_City :boro ?boro . ?boro :pop ?pop
         } ORDER BY DESC(?pop)""").show(false)

    println("=== total population (agg):")
    engine.select(
      "SELECT (SUM(?pop) AS ?total) (COUNT(*) AS ?n) { ?b :pop ?pop }").show(false)

    println("=== r12 spec fixes: AVG over empty group is 0; CONCAT() is \"\";")
    println("    CONTAINS on a non-string literal errors (row dropped / unbound):")
    engine.select(
      """SELECT (AVG(?nope) AS ?avg_empty) (COUNT(?nope) AS ?n) {
           ?x :noSuchProp ?nope
         }""").show(false)
    engine.select(
      """SELECT (CONCAT() AS ?empty_cat) (STRLEN(CONCAT()) AS ?len) {
         } LIMIT 1""").show(false)
    engine.select(
      """SELECT ?b ?bad ?ok {
           ?b :pop ?pop
           BIND(CONTAINS(?pop, "1") AS ?bad)
           BIND(CONTAINS(STR(?pop), "1") AS ?ok)
         } ORDER BY ?b LIMIT 3""").show(false)

    println("=== r12: Turtle-star with a labeled bnode inside a quoted triple:")
    val starE = Engine.inline(
      """@prefix : <http://example.com/> .
        << _:b :p 1 >> :q 2 .
        _:b :name "node b" .
      """)
    starE.select(
      """SELECT ?n ?c {
           << ?bn <http://example.com/p> 1 >> <http://example.com/q> ?c .
           ?bn <http://example.com/name> ?n
         }""").show(false)

    println("=== INSERT WHERE (forward chaining) then re-query:")
    engine.update(
      "INSERT { ?b a :BigBoro } WHERE { ?b :pop ?p FILTER(?p > 2000000) }")
    engine.select("SELECT ?b { ?b a :BigBoro } ORDER BY ?b").show(false)

    println("=== ttl round-trip:")
    println(engine.ttl().take(400))

    println("=== probe: parse error rendering:")
    try engine.select("SELECT ?x { ?x :boro ")
    catch { case e: GraftException => println(e.getMessage) }

    println("=== display round-trip: paste a shortened QName back in:")
    val displayed = Engine.one(engine.select(
      "SELECT ?b { ?b :pop ?p } ORDER BY DESC(?p) LIMIT 1")).toString
    println(s"displayed value: $displayed")
    engine.select("SELECT ?p { ?_b :pop ?p }", Map("b" -> displayed)).show(false)

    println("=== compatible join: UNION-padded var still joins:")
    engine.select(
      """SELECT ?b ?pop {
           { ?b :pop ?pop } UNION { :New_York_City :boro ?b }
           ?b :pop ?pop
         } ORDER BY DESC(?pop) LIMIT 3""").show(false)

    println("=== DESCRIBE <iri> (concise bounded description):")
    println(Engine.fromGraph(engine.describe(
      "DESCRIBE <http://example.com/Manhattan>")).ttl())

    println("=== DESCRIBE ?x WHERE (targets bound by pattern):")
    println("describe size = " + engine.describe(
      "DESCRIBE ?x WHERE { ?x a :BigBoro }").size)

    println("=== UPDATE LOAD from an N-Triples file:")
    val tmp = java.nio.file.Files.createTempFile("drive", ".nt")
    java.nio.file.Files.writeString(tmp,
      "<http://example.com/Hoboken> <http://example.com/pop> \"60419\"^^<http://www.w3.org/2001/XMLSchema#integer> .\n")
    engine.update(s"LOAD <file://$tmp>")
    engine.select("SELECT ?b ?pop { ?b :pop ?pop } ORDER BY ?pop LIMIT 2").show(false)

    println("=== native expressions registered as SQL functions:")
    spark.sql(
      """SELECT cosine_sim(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS cos,
                simhash64(split('the quick brown fox', ' ')) AS sh,
                image_header_meta(unhex(concat(
                  '89504E470D0A1A0A0000000D49484452',
                  '0000000200000003', '0806000000'))) AS png,
                audio_header_meta(unhex(concat(
                  '52494646', '24000000', '57415645',
                  '666D7420', '10000000', '0100', '0100', '401F0000',
                  '401F0000', '0100', '0800', '64617461', '401F0000'))) AS wav,
                video_header_meta(unhex(concat(
                  '52494646', '50000000', '41564920',
                  '4C495354', '44000000', '6864726C', '61766968', '38000000',
                  '409C0000', '00000000', '00000000', '00000000', 'FA000000',
                  '00000000', '01000000', '00000000', '40010000', 'F0000000',
                  repeat('00', 16)))) AS avi
      """).show(false)

    println("=== REAL compressed-image decode (JDK codecs, no library):")
    spark.sql(
      """SELECT image_decode(unhex(concat(
           '89504E470D0A1A0A', '0000000D',
           '494844520000000100000001', '0802000000', '907753DE',
           '0000000F', '49444154', '7801', '010400FBFF', '000A141E',
           '0068003D', 'E80CBB83', '0000000049454E44AE426082'))) AS png_pixels
      """).show(false)

    println("=== MJPEG AVI frame decode (JDK JPEG reader, no library):")
    locally {
      def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      val jpegs = (0 until 3).map { f =>
        val img = new java.awt.image.BufferedImage(8, 6,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(60 + 40 * f, 100, 180))
        g.fillRect(0, 0, 8, 6); g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", baos)
        baos.toByteArray
      }
      val avih = "avih".getBytes("US-ASCII") ++ le32(56) ++ le32(40000) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(jpegs.length) ++ le32(0) ++
        le32(1) ++ le32(0) ++ le32(8) ++ le32(6) ++ Array.fill[Byte](16)(0)
      val hdrl = "LIST".getBytes("US-ASCII") ++ le32(4 + avih.length) ++
        "hdrl".getBytes("US-ASCII") ++ avih
      val chunks = jpegs.flatMap(j =>
        "00dc".getBytes("US-ASCII") ++ le32(j.length) ++ j ++
          (if (j.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)).toArray
      val movi = "LIST".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
        "movi".getBytes("US-ASCII") ++ chunks
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
      import spark.implicits._
      Seq((1L, avi)).toDF("id", "content")
        .select($"id",
          graft.pipeline.Multimodal.videoFeatures($"content").as("f"))
        .select("id", "f.n_frames", "f.width", "f.height",
          "f.mean_r", "f.mean_g", "f.mean_b", "f.motion")
        .show(false)
    }

    println("=== curate raw HTML pages (extract -> gate -> dedup -> chunk):")
    locally {
      import spark.implicits._
      val prose = "the cat sat on the mat and it was happy with that " +
        "state of affairs for the rest of the day in the sun by the window"
      val pages = Seq(
        (1L, s"<html><head><script>var a = 1 < 2;</script></head>" +
          s"<body><p>$prose</p></body></html>"),
        (2L, s"<html><body><p>$prose</p></body></html>"), // dup of 1
        (3L, "<html><body><p>tiny</p></body></html>"))    // gated out
        .toDF("doc_id", "text")
      graft.pipeline.Curation.curate(pages, "doc_id", "text",
        minQuality = 0.7, chunkSize = 8, chunkStride = 4,
        htmlInput = true).show(5, false)
    }

    println("=== dedup pairs -> canonical groups:")
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("id1", "id2")
    graft.pipeline.Dedup.dedupGroups(pairs).orderBy("rid").show(false)

    println("=== corpus ops: line dedup, URL dedup, BM25, unigram NLL, mixture:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val crawl = Seq(
        (1L, "unique headline one\ncookie banner text\nreal article body",
          "HTTP://WWW.News.COM:80/a/1/?utm_source=rss"),
        (2L, "unique headline two\ncookie banner text\nmore real prose here",
          "http://news.com/a/1"), // same page as doc 1 after canon
        (3L, "spark join window article about query engines",
          "https://news.com/a/3")).toDF("doc_id", "text", "url")
      graft.pipeline.TextAnalysis.dedupLines(crawl, "doc_id", "text")
        .select("doc_id", "clean_text").orderBy("doc_id").show(false)
      graft.pipeline.TextAnalysis.urlDedup(crawl, "doc_id", "url")
        .select("doc_id", "url_canon", "keep_id").orderBy("doc_id").show(false)
      graft.pipeline.Relevance.bm25(crawl, "text", Seq("spark", "query"))
        .select("doc_id", "bm25").orderBy("doc_id").show(false)
      graft.pipeline.Relevance.unigramNll(crawl, "doc_id", "text", vocabSize = 8)
        .orderBy("doc_id").show(false)
      val sources = (1 to 40).map(i => (i.toLong,
        if (i % 4 == 0) "curated" else "crawl")).toDF("doc_id", "source")
      graft.pipeline.TextAnalysis.resampleToMixture(sources, "doc_id",
        "source", Map("curated" -> 0.5, "crawl" -> 0.5))
        .groupBy("source").agg(F.count(F.lit(1)).as("n"))
        .orderBy("source").show(false)
    }

    println("=== round-9 ops: BPE, TF-IDF + k-means + SemDeDup, PageRank, gates:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox leaps over the lazy dog"),  // near-dup of 1
        (3L, "sparse matrix kernels on distributed accelerators"),
        (4L, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa") // boilerplate
      ).toDF("doc_id", "text")
      val bpe = graft.pipeline.Bpe.train(corpus, "text", numMerges = 20)
      println(s"BPE merges: ${bpe.merges.take(8).mkString(" ")}")
      corpus.select(F.col("doc_id"),
        graft.pipeline.Bpe.tokenCount(F.col("text"), bpe).as("n_bpe"),
        graft.pipeline.TextAnalysis.compressionRatio(F.col("text")).as("deflate"))
        .orderBy("doc_id").show(false)
      val emb = graft.pipeline.Relevance.tfidfEmbedding(
        corpus, "doc_id", "text", dim = 32)
      graft.pipeline.Clustering.kmeans(emb, "doc_id", "tfidf", k = 2, iters = 2)
        .orderBy("doc_id").show(false)
      graft.pipeline.Dedup.semanticDedup(emb, "doc_id", "tfidf",
        k = 2, threshold = 0.8)
        .select("doc_id").orderBy("doc_id").show(false)
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
      graft.pipeline.Graphs.pageRank(edges, iters = 5)
        .orderBy(F.col("rank").desc).show(false)
      val withUrls = corpus.withColumn("url",
        F.when(F.col("doc_id") === 3L, F.lit("https://spam.bad.example/x"))
          .otherwise(F.concat(F.lit("https://ok.example/"), F.col("doc_id"))))
      graft.pipeline.TextAnalysis.filterByDomainBlocklist(
        withUrls, "url", Seq("bad.example"))
        .select("doc_id", "url").orderBy("doc_id").show(false)
    }

    println("=== round-9 ops: WARC chain, PQ / IVF-PQ, incremental dedup, shuffle-shard:")
    locally {
      import org.apache.spark.sql.{functions => F}
      // WARC → http → html_text: the crawl front door, in one plan
      def rec(uri: String, body: String): Array[Byte] = {
        val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n$body"
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
          s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n").getBytes("UTF-8")
      }
      val seg = rec("http://ex.org/a", "<html><body><h1>A</h1><p>alpha page</p></body></html>") ++
        rec("http://ex.org/b", "<html><body><p>beta &amp; gamma</p></body></html>")
      val records = Seq(Tuple1(seg)).toDF("content")
        .select(F.lit("seg-0").as("file"),
          F.explode(graft.sources.Warc.records(F.col("content"))).as("r"))
        .select(F.col("file"), F.col("r.warc_type").as("warc_type"),
          F.col("r.target_uri").as("target_uri"), F.col("r.date").as("date"),
          F.col("r.record_id").as("record_id"),
          F.col("r.content_type").as("content_type"),
          F.col("r.payload").as("payload"))
      graft.sources.Warc.pages(records)
        .select(F.col("url"), F.col("status"),
          graft.pipeline.TextAnalysis.htmlText(
            F.decode(F.col("body"), "UTF-8")).as("text"))
        .show(false)
      // PQ + IVF-PQ over toy embeddings
      val vecs = (0L until 40L).map(i => (i,
        Seq.tabulate(16)(d => ((i % 4) * 2 - 3) * 0.1f + d * 0.001f)))
        .toDF("id", "vec")
      val pq = graft.pipeline.Pq.fit(vecs, "id", "vec", m = 4, k = 4, iters = 2)
      val codes = vecs.select(F.col("id"),
        graft.pipeline.Pq.encode(pq, F.col("vec")).as("code"))
      val q0 = Seq.tabulate(16)(d => -0.3f + d * 0.001f)
      graft.pipeline.Pq.topK(pq, codes, "id", "code", q0, 5).show(false)
      val ivfpq = graft.pipeline.IvfPq.fit(vecs, "id", "vec",
        nlist = 4, m = 4, k = 4)
      graft.pipeline.IvfPq.topKRefined(ivfpq, vecs, "vec", q0, 5,
        nprobe = 2).show(false)
      // incremental dedup: exact (bloom) + fuzzy (cross-corpus minhash)
      val seen = Seq((100L, "the cat sat on the mat today and yesterday " +
        "while the dog watched from the door")).toDF("doc_id", "text")
      val incoming = Seq(
        (1L, "the cat sat on the mat today and yesterday while the dog " +
          "watched from the door"),            // exact dup of seen
        (2L, "the cat sat on the mat today and yesterday while the dog " +
          "watched from the window"),          // near-dup of seen
        (3L, "completely new content about distributed query planning " +
          "and shuffle-free aggregation")).toDF("doc_id", "text")
      graft.pipeline.Dedup.dedupAgainstSeen(incoming, seen, "text")
        .select("doc_id").orderBy("doc_id").show(false)
      graft.pipeline.Dedup.fuzzyDedupAgainstSeen(
          graft.pipeline.Dedup.dedupAgainstSeen(incoming, seen, "text"),
          seen, "doc_id", "text", threshold = 0.7)
        .select("doc_id").orderBy("doc_id").show(false)
      // deterministic shuffle + shard assignment
      graft.pipeline.TextAnalysis.shuffleShards(
          (0L until 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
          "doc_id", numShards = 3, seed = 7)
        .orderBy("shard", "pos").show(false)
    }

    println("=== normalize, corpus report, interval join, training prep:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog and runs far away"),
        (2L, "the  quick\tbrown fox jumps over the lazy dog and runs far away"),
        (3L, "a completely different document about distributed joins " +
          "and shuffle-free aggregation plans")).toDF("doc_id", "text")
      docs.select(F.col("doc_id"),
        graft.pipeline.TextAnalysis.normalizeText(F.col("text")).as("norm"))
        .show(false)
      graft.pipeline.TextAnalysis.corpusReport(docs, "text").show(false)
      val points = Seq((1L, 1L, 10L), (2L, 1L, 25L), (3L, 2L, 10L))
        .toDF("event_id", "k", "t")
      val windows = Seq((100L, 1L, 5L, 15L), (200L, 1L, 20L, 30L))
        .toDF("iv_id", "k", "ivs", "ive")
      graft.pipeline.AsOf.intervalJoin(points, windows, "k", "t",
        "ivs", "ive", Seq("iv_id"), bucket = 8L).show(false)
      val prep = graft.pipeline.TrainingData.prepare(docs, "doc_id", "text",
        minQuality = 0.0, chunkSize = 8, chunkStride = 8, numMerges = 8,
        bpeSampleFraction = 1.0, maxTokens = 16, numShards = 2, seed = 3L)
      prep.shards.orderBy("shard", "pos").show(false)
    }

    println("=== persisted indexes: BM25 text search, MinHash seen-corpus:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val corpus = Seq(
        (1L, "spark shuffle join plan optimizer"),
        (2L, "spark scan pushdown parquet reader"),
        (3L, "index probe partition pruning fast"),
        (4L, "cooking pasta with garlic and basil")).toDF("doc_id", "text")
      val tix = graft.pipeline.Relevance.TextIndex.fit(
        corpus, "doc_id", "text", buckets = 8)
      tix.search(Seq("spark", "index"), 3).show(false)
      val seen = Seq((10L, "the quick brown fox jumps over the lazy " +
        "dog and runs far away into the deep dark forest")).toDF("doc_id", "text")
      val incoming = Seq(
        (1L, "the quick brown fox jumps over the lazy dog and runs " +
          "far away into the deep dark woods"),
        (2L, "entirely new content about distributed aggregation")
      ).toDF("doc_id", "text")
      val midx = graft.pipeline.Dedup.MinHashSeenIndex.fit(
        seen, "doc_id", "text")
      graft.pipeline.Dedup.minhashPairsAgainstIndex(midx, incoming,
        "doc_id", "text", threshold = 0.7).show(false)
    }

    println("=== perceptual image hash + image near-dup pairs:")
    locally {
      import org.apache.spark.sql.{functions => F}
      // two re-colored copies of one pattern + one unrelated image
      def bmp(seed: Int, tweak: Int): Array[Byte] = {
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        val rnd = new scala.util.Random(seed)
        val pix = Array.tabulate(12 * 12 * 3) { i =>
          ((rnd.nextInt(256) + (if (i < 9) tweak else 0)) % 256).toByte }
        "BM".getBytes("US-ASCII") ++ le32(54 + pix.length) ++ le32(0) ++
          le32(54) ++ le32(40) ++ le32(12) ++ le32(12) ++ le16(1) ++
          le16(24) ++ le32(0) ++ le32(pix.length) ++ le32(0) ++ le32(0) ++
          le32(0) ++ le32(0) ++ pix
      }
      val imgs = Seq((1L, bmp(5, 0)), (2L, bmp(5, 35)), (3L, bmp(99, 0)))
        .toDF("doc_id", "media")
      imgs.select(F.col("doc_id"),
        graft.pipeline.Multimodal.imageHash(F.col("media"), "ahash").as("ahash"),
        graft.pipeline.Multimodal.imageHash(F.col("media"), "dhash").as("dhash"))
        .show(false)
      graft.pipeline.Dedup.imageNearDupPairs(imgs, "doc_id", "media",
        "dhash", maxBits = 8).show(false)
      // audio: two volume-scaled copies of one clip + one unrelated
      def wav(seed: Int, scale: Int): Array[Byte] = {
        def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
          (v >> 16).toByte, (v >> 24).toByte)
        val r = new scala.util.Random(seed)
        val data = Array.tabulate(260)(i =>
          ((math.sin(i * 0.05 + seed) * 8000).toInt + r.nextInt(300))
            / scale).flatMap(le16)
        val body = "WAVE".getBytes("US-ASCII") ++
          "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
          "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
        "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
      }
      val clips = Seq((1L, wav(3, 1)), (2L, wav(3, 2)), (3L, wav(44, 1)))
        .toDF("doc_id", "media")
      graft.pipeline.Dedup.audioNearDupPairs(clips, "doc_id", "media",
        maxBits = 3).show(false)
    }

    println("=== crawl round: WARC -> curated corpus + frontier + host ranks:")
    locally {
      import org.apache.spark.sql.{functions => F}
      def rec(uri: String, payload: Array[Byte]): Array[Byte] =
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
          "WARC-Date: 2024-01-02T03:04:05Z\r\nWARC-Record-ID: <u:1>\r\n" +
          "Content-Type: application/http;msgtype=response\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
          payload ++ "\r\n\r\n".getBytes("UTF-8")
      def http(body: String): Array[Byte] =
        (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: " +
          s"${body.getBytes("UTF-8").length}\r\n\r\n" + body).getBytes("UTF-8")
      val seg =
        rec("http://a.example/", http("<html><body><p>Spark rows columns " +
          "tables joins and data quality text for the gate.</p>" +
          "<a href=\"http://b.example/\">b</a>" +
          "<a href=\"http://c.example/new\">c</a></body></html>")) ++
        rec("http://b.example/", http("<html><body><p>Another page about " +
          "plans shuffles and partitions in plain words.</p>" +
          "<a href=\"http://a.example/\">a</a></body></html>"))
      val dir = java.nio.file.Files.createTempDirectory("drive-crawl")
      java.nio.file.Files.write(dir.resolve("seg.warc"), seg)
      val round = graft.pipeline.Crawl.round(spark, dir.toString,
        minQuality = 0.0, chunkSize = 16, chunkStride = 16)
      round.documents.show(false)
      round.frontier.show(false)
      round.hostRanks.orderBy(F.desc("rank")).show(false)
      // politeness: robots gate + per-host budget on the frontier
      val robots = Seq(("c.example", "User-agent: *\nDisallow: /new"))
        .toDF("host", "robots_txt")
      graft.pipeline.Crawl.schedule(
        graft.pipeline.Crawl.filterByRobots(round.frontier, robots,
          "graftbot"), maxPerHost = 5).show(false)
      println("(c.example/new was frontier but robots disallow it)")
    }

    println("=== document routing: zip/docx chain, pdf triage, anchors, HITS:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      z.write("<w:p>Annual plan for the data team</w:p>".getBytes("UTF-8"))
      z.closeEntry(); z.close()
      val docx = bos.toByteArray
      val pdf = "%PDF-1.6\n<</Type /Page>> <</Type /Page>>\n%%EOF"
        .getBytes("UTF-8")
      Seq((1L, docx), (2L, pdf)).toDF("doc_id", "payload")
        .select(F.col("doc_id"),
          F.element_at(graft.pipeline.Multimodal.zipEntries(
            F.col("payload")), 1).getField("name").as("zip_entry0"),
          graft.pipeline.Multimodal.pdfMeta(F.col("payload")).as("pdf"),
          graft.pipeline.TextAnalysis.htmlText(F.decode(
            graft.pipeline.Multimodal.zipEntry(F.col("payload"),
              F.lit("word/document.xml")), "UTF-8")).as("docx_text"))
        .show(false)
      Seq(Tuple1("""<a href="/r1">Quarterly report</a>
          <a href="http://peer.example/x" rel="nofollow">ad</a>"""))
        .toDF("html")
        .select(F.explode(graft.pipeline.TextAnalysis.htmlAnchors(
          F.col("html"))).as("a")).select("a.href", "a.text").show(false)
      graft.pipeline.Graphs.hitsHosts(Seq(
        ("a.example", "hub.example"), ("hub.example", "auth.example"),
        ("b.example", "auth.example")).toDF("src_host", "dst_host"))
        .orderBy(F.desc("auth")).show(false)
    }

    println("=== TriG: named-graph parse -> GRAPH query -> serialize:")
    locally {
      val store = graft.sources.Trig.parse(
        """@prefix ex: <http://example.org/> .
           ex:meta ex:label "catalog" .
           GRAPH ex:facts { ex:a ex:knows ex:b . }
           ex:drafts { ex:c ex:name "Carol" }""", spark)
      Engine.fromGraph(store)
        .select("SELECT ?g ?s ?p WHERE { GRAPH ?g { ?s ?p ?o } } ORDER BY ?g")
        .show(false)
      println(graft.sources.Trig.serialize(store))
    }

    println("=== Count-Min sketch: exact heavy hitters via sketch prefilter:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val toks = (Seq.fill(40)("the") ++ Seq.fill(25)("spark") ++
        Seq.fill(3)("rare") ++ (0 until 60).map(i => s"u$i"))
        .toDF("tok").repartition(5)
      val sk = graft.pipeline.Sketches.cmsSketch(toks, "tok",
        depth = 4, width = 256)
      println(s"sketch cells=${sk.length} mass=${sk.sum} (= 4 x rows)")
      toks.distinct().limit(3).select(F.col("tok"),
        graft.pipeline.Sketches.cmsEstimate(F.col("tok"), sk, 4, 256)
          .as("estimate")).show(false)
      graft.pipeline.Sketches.heavyHitters(toks, "tok", minCount = 20L)
        .orderBy(F.desc("cnt")).show(false)
    }

    println("=== RDF/XML parse -> SPARQL query (typed nodes, parseType):")
    locally {
      val g = graft.sources.RdfXml.parse(
        """<?xml version="1.0"?>
          |<!DOCTYPE rdf:RDF [<!ENTITY ex "http://example.org/">]>
          |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
          |         xmlns:ex="&ex;" xml:base="http://example.org/doc">
          |  <ex:City rdf:about="&ex;oz" ex:motto="emerald">
          |    <ex:pop rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:pop>
          |    <ex:mayor rdf:parseType="Resource">
          |      <ex:name>Wizard</ex:name>
          |    </ex:mayor>
          |  </ex:City>
          |</rdf:RDF>""".stripMargin, spark)
      Engine.fromGraph(g).select(
        """PREFIX ex: <http://example.org/>
          |SELECT ?city ?pop ?motto ?mayor {
          |  ?city a ex:City ; ex:pop ?pop ; ex:motto ?motto ;
          |        ex:mayor/ex:name ?mayor }""".stripMargin).show(false)

      // SPARQL UPDATE LOAD picks the RDF/XML reader by extension
      val rdfFile = java.nio.file.Files.createTempFile("drive", ".rdf")
      java.nio.file.Files.writeString(rdfFile,
        """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
          |         xmlns:ex="http://example.org/">
          |  <rdf:Description rdf:about="http://example.org/km">
          |    <ex:pop>9</ex:pop>
          |  </rdf:Description>
          |</rdf:RDF>""".stripMargin)
      val le = Engine.fromGraph(g)
      le.update(s"LOAD <file://$rdfFile>")
      println(s"after LOAD <...drive.rdf>: graph size = ${le.graph.size}")

      // write side: serialize the engine graph back to RDF/XML and an
      // INSERT-star template (quoted triple built per solution)
      le.update(
        """PREFIX ex: <http://example.org/>
          |INSERT { << ?c ex:pop ?p >> ex:checked true }
          |WHERE { ?c ex:pop ?p }""".stripMargin)
      println(s"after INSERT-star: graph size = ${le.graph.size}")
      println(graft.sources.RdfXml.serialize(
        Engine.inline(
          """@prefix ex: <http://example.org/> .
            |ex:a ex:name "x" ; ex:n 7 ; ex:tag "oui"@fr .
            |""".stripMargin).graph))
    }

    println("=== SPARQL results formats (CSV/TSV/JSON/XML) over selectRaw:")
    locally {
      val raw = engine.selectRaw(
        """SELECT ?boro ?pop {
             :New_York_City :boro ?boro . ?boro :pop ?pop
           } ORDER BY DESC(?pop) LIMIT 2""")
      print(graft.sources.SparqlResults.csv(raw))
      print(graft.sources.SparqlResults.tsv(raw))
      println(graft.sources.SparqlResults.json(raw))
      println(graft.sources.SparqlResults.xml(raw))
      val dir = java.nio.file.Files.createTempDirectory("drive_res").toString
      graft.sources.SparqlResults.writeJson(raw.repartition(2), s"$dir/j")
      val parts = new java.io.File(s"$dir/j").listFiles()
        .filter(_.getName.startsWith("part-"))
      println(s"writeJson parts=${parts.length} " +
        s"bytes=${parts.map(_.length).sum}")
      println("read back from the written directory (format sniffed):")
      graft.sources.SparqlResults.read(spark, s"$dir/j", Seq("boro", "pop"))
        .show(false)

      // read side: serve the XML form from a local stub and decode it
      // back through spark.read.format("sparql") (content negotiation)
      val xmlDoc = graft.sources.SparqlResults.xml(raw)
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/sparql",
        (ex: com.sun.net.httpserver.HttpExchange) => {
          val out = xmlDoc.getBytes("UTF-8")
          ex.getResponseHeaders.add(
            "Content-Type", "application/sparql-results+xml")
          ex.sendResponseHeaders(200, out.length)
          ex.getResponseBody.write(out)
          ex.close()
        })
      server.start()
      try {
        println("decoded back from an XML-only endpoint:")
        spark.read.format("sparql")
          .option("url",
            s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
          .option("query", "SELECT ?boro ?pop { ?b ?p ?o }")
          .option("vars", "boro,pop")
          .load().show(false)
      } finally server.stop(0)
    }

    println("=== crawl link graph: html_links -> resolve_url -> host PageRank:")
    locally {
      import org.apache.spark.sql.{functions => F}
      val pages = Seq(
        ("http://www.alpha.example/idx",
          """<a href="/a">self</a><a href="http://beta.example/x">b</a>
             <a href="gamma.html">rel-self</a>
             <a href="//delta.example/y?z=1&amp;w=2">d</a>"""),
        ("http://beta.example/p/q",
          """<a href="../up">self</a><a href="http://alpha.example/z">a</a>
             <a href="#top">skip</a><a href="mailto:x@y">skip</a>"""),
        ("http://delta.example/",
          """<a href="http://alpha.example/back">a</a>"""))
        .toDF("url", "html")
      pages.select(F.col("url"),
        F.explode(graft.pipeline.TextAnalysis.htmlLinks(F.col("html")))
          .as("ref"))
        .withColumn("resolved", graft.pipeline.TextAnalysis.resolveUrl(
          F.col("url"), F.col("ref")))
        .show(false)
      val edges = graft.pipeline.Graphs.hostEdges(pages)
      edges.show(false)
      graft.pipeline.Graphs.pageRankHosts(edges, iters = 5)
        .orderBy(F.desc("rank")).show(false)
    }

    println("=== r12: JSON-LD round trip and RDFC-1.0 canonicalization:")
    locally {
      // the "ex" prefix arrives via an OFFLINE remote-context document
      val remoteCtx = Map("https://ctx.graft.example/base" ->
        """{"@context": {"ex": "http://example.com/"}}""")
      val doc = """{
        "@context": ["https://ctx.graft.example/base",
                    {"knows": {"@id": "ex:knows", "@type": "@id"},
                     "post": {"@id": "ex:post", "@container": "@id",
                              "@context": {"body": "ex:body"}},
                     "Person": {"@id": "ex:Person",
                                "@context": {"name": "ex:personName"}}}],
        "@type": "Person",
        "@id": "ex:alice", "name": "Alice", "ex:age": 31,
        "knows": {"@id": "_:b"},
        "ex:motto": {"@value": "forward", "@language": "en", "@direction": "ltr"},
        "post": {"ex:p1": {"body": "hello"}},
        "@nest": {"ex:nested": "grouped"},
        "ex:tags": {"@list": ["x", "y"]},
        "ex:meta2": {"@value": {"k": [1, true]}, "@type": "@json"}
      }"""
      val g = graft.sources.JsonLd.parse(doc, spark, contexts = remoteCtx)
      println("--- parsed JSON-LD, size " + g.size)
      Engine.fromGraph(g).select(
        """PREFIX ex: <http://example.com/>
           SELECT ?p ?o { ex:alice ?p ?o } ORDER BY ?p""").show(false)
      println("--- compacted serialization (prefix context):")
      println(graft.sources.JsonLd.serialize(g))
      println("--- compacted under a USER context (coercing terms):")
      println(graft.sources.JsonLd.compact(g, """{
        "ex": "http://example.com/",
        "knows": {"@id": "ex:knows", "@type": "@id"},
        "age": {"@id": "ex:age",
                "@type": "http://www.w3.org/2001/XMLSchema#integer"}
      }"""))
      println("--- canonical N-Quads (c14n labels, sorted):")
      println(g.canonicalNQuads())
      val renamed = graft.sources.JsonLd.parse(
        doc.replace("_:b", "_:completelyDifferent"), spark,
        contexts = remoteCtx)
      println("--- isomorphic under relabel: " + g.isomorphic(renamed) +
        "; datasetHash " + g.datasetHash().take(16) + "… == " +
        renamed.datasetHash().take(16) + "…")
      println("--- distributed sorted-fold hash (no driver materialization)" +
        " equals it: " +
        (g.datasetHashDistributed() == g.datasetHash()))
    }

    // ---- r13: SUM/AVG(DISTINCT) dedupe by RDF term (§18.5.1), not by
    //      numeric value: {1, 1.0, "01"^^xsd:integer, 1} → SUM 3.0
    {
      println("=== r13: SUM(DISTINCT)/AVG(DISTINCT) term-level dedup")
      Engine.inline(
        """@prefix : <http://example.com/> .
           @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
           :a :p 1 . :b :p 1.0 . :c :p "01"^^xsd:integer . :d :p 1 .
        """).select(
        """PREFIX : <http://example.com/>
           SELECT (SUM(DISTINCT ?v) AS ?s) (AVG(DISTINCT ?v) AS ?a)
                  (SUM(?v) AS ?plain) { ?x :p ?v }""").show(false)
    }

    // ---- r13: named-graph UPDATE (GRAPH templates, WITH/USING, graph
    //      management, LOAD INTO GRAPH honoring its target)
    {
      println("=== r13: named-graph UPDATE surface")
      val EX = "http://example.com/"
      val store = Engine.fromGraph(RdfGraph.fromQuads(spark, Seq(
        (Iri(EX + "s1"), Iri(EX + "p"), Lit.plain("default"), None),
        (Iri(EX + "raw1"), Iri(EX + "p"), Lit.plain("crawl-a"),
          Some(Iri(EX + "staging"))),
        (Iri(EX + "raw2"), Iri(EX + "p"), Lit.plain("crawl-b"),
          Some(Iri(EX + "staging")))),
        Map("ex" -> EX)))
      def show(label: String): Unit = {
        println(s"--- $label:")
        store.select(
          """PREFIX ex: <http://example.com/>
             SELECT ?g ?s ?o {
               { GRAPH ?g { ?s ex:p ?o } } UNION { ?s ex:p ?o }
             } ORDER BY ?g ?s""").show(false)
      }
      show("initial dataset (default + staging graph)")
      store.update(
        """PREFIX ex: <http://example.com/>
           WITH <http://example.com/staging>
           DELETE { ?s ex:p ?o } INSERT { ?s ex:p ?o ; ex:vetted true }
           WHERE { ?s ex:p ?o } ;
           COPY GRAPH <http://example.com/staging> TO GRAPH <http://example.com/prod> ;
           DROP GRAPH <http://example.com/staging>""")
      show("after WITH-modify + COPY staging→prod + DROP staging")
      store.update(
        """PREFIX ex: <http://example.com/>
           INSERT { GRAPH ?g { ex:summary ex:count "tagged" } }
           WHERE { GRAPH ?g { ?s ex:vetted true } }""")
      show("after INSERT { GRAPH ?g … } with a variable graph slot")
      val err = try { store.update("CLEAR GRAPH <http://example.com/nope>"); "NO ERROR (bad)" }
        catch { case e: GraftException => "GraftException: " + e.getMessage }
      println("--- CLEAR GRAPH on a missing graph errors loudly: " + err)
      val tripleOnly = Engine.inline(s"<${EX}a> <${EX}p> 'x' .")
      val err2 = try { tripleOnly.update(
          s"INSERT DATA { GRAPH <${EX}g> { <${EX}a> <${EX}p> 'y' } }"); "NO ERROR (bad)" }
        catch { case e: GraftException => "GraftException: " + e.getMessage }
      println("--- GRAPH template on a triples-only store errors loudly: " + err2)
    }

    {
      println("=== r13: RDFS closure + owl:sameAs smushing (Reasoner)")
      val g = Engine.inline(
        """
          @prefix : <http://example.com/> .
          @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
          @prefix owl: <http://www.w3.org/2002/07/owl#> .
          :Borough rdfs:subClassOf :Region . :Region rdfs:subClassOf :Place .
          :borough rdfs:subPropertyOf :partOf .
          :partOf rdfs:domain :Place ; rdfs:range :Place .
          :Manhattan a :Borough . :NYC :borough :Manhattan .
          :Manhattan owl:sameAs :New_York_County .
          :New_York_County :pop 1628706 .
        """).graph
      val closed = graft.rdf.Reasoner.rdfsClosure(g)
      val e2 = Engine.fromGraph(closed)
      e2.bindNamespace("", "http://example.com/")
      println("--- rdf:type after closure (expect Borough+Region+Place for " +
        "Manhattan, Place for NYC via domain-through-subproperty):")
      e2.select(
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?s ?c { ?s rdf:type ?c } ORDER BY ?s ?c""").show(false)
      val smushed = Engine.fromGraph(graft.rdf.Reasoner.smushSameAs(closed))
      smushed.bindNamespace("", "http://example.com/")
      println("--- after smushing (County facts fold into :Manhattan, " +
        "sameAs gone):")
      smushed.select(
        """PREFIX ex: <http://example.com/>
           SELECT ?p ?o { ex:Manhattan ?p ?o } ORDER BY ?p ?o""").show(false)
    }

    println("=== r14: language-tag case survives JSON-LD; \\r survives RDF/XML:")
    locally {
      val e = Engine.inline(
        """@prefix : <http://example.com/> .
          :s :label "Hello"@en-US ; :note "line1\r\nline2" .
        """)
      val viaJsonLd = graft.sources.JsonLd.parse(
        graft.sources.JsonLd.serialize(e.graph), spark)
      val viaRdfXml = graft.sources.RdfXml.parse(
        graft.sources.RdfXml.serialize(e.graph), spark)
      println("--- original canonical:\n" + e.graph.canonicalNQuads())
      println("--- via JSON-LD isomorphic: " + e.graph.isomorphic(viaJsonLd))
      println("--- via RDF/XML isomorphic: " + e.graph.isomorphic(viaRdfXml))
      Engine.fromGraph(viaJsonLd).select(
        """SELECT ?l (LANG(?v) AS ?tag)
             (langMatches(LANG(?v), "EN-us") AS ?matches) {
             ?s <http://example.com/label> ?v BIND(STR(?v) AS ?l)
           }""").show(false)
      println("--- merkleHash (parallel address): " + e.graph.merkleHash())
      println("--- merkleHash after repartition(5): " +
        e.graph.copy(triples = e.graph.triples.repartition(5)).merkleHash())
      println("--- datasetHash (document address, different space): " +
        e.graph.datasetHash())
    }

    println("=== r14: SERVICE federation over a live endpoint, incl. the")
    println("    filter-scope shape the renderer used to flatten:")
    locally {
      import java.nio.charset.StandardCharsets.UTF_8
      val remoteData =
        """@prefix : <http://example.com/> .
          :Manhattan :onIsland true . :Brooklyn :onIsland true .
        """
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/sparql", (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val q = body.split("&").collectFirst {
          case p if p.startsWith("query=") =>
            java.net.URLDecoder.decode(p.substring(6), "UTF-8")
        }.getOrElse("")
        val json = graft.sources.SparqlResults.json(
          Engine.inline(remoteData).selectRaw(q)).getBytes(UTF_8)
        ex.getResponseHeaders.add("Content-Type",
          "application/sparql-results+json")
        ex.sendResponseHeaders(200, json.length)
        ex.getResponseBody.write(json); ex.close()
      })
      server.start()
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
      try {
        println("--- local pop join remote onIsland (bound-join injection):")
        engine.select(
          s"""SELECT ?b ?pop {
               ?b :pop ?pop .
               SERVICE <$url> { ?b :onIsland true }
             } ORDER BY DESC(?pop)""").show(false)
        println("--- a left-group FILTER must NOT see the OPTIONAL's bindings")
        println("    (renderer braces the filtered group on the wire; 0 rows):")
        engine.select(
          s"""SELECT ?b ?i {
               SERVICE <$url> {
                 { ?b :onIsland true . FILTER(BOUND(?other)) }
                 OPTIONAL { ?other :onIsland ?i }
               }
             }""").show(false)
      } finally server.stop(0)
    }

    println("=== r14: results-XML wire round trip (char-ref'd \\r and the")
    println("    SPARQL 1.2 <triple> extension survive a reparse):")
    locally {
      import java.nio.charset.StandardCharsets.UTF_8
      val e = Engine.inline(
        """@prefix : <http://example.com/> .
          << :s :p 1 >> :conf "hi\rthere" .
        """)
      val res = e.selectRaw(
        "SELECT ?t ?c { ?t <http://example.com/conf> ?c }")
      val doc = graft.sources.SparqlResults.xml(res)
      println("--- emitted XML: " + doc.replace("\r", "\\r"))
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/sparql", (ex: com.sun.net.httpserver.HttpExchange) => {
        val out = doc.getBytes(UTF_8)
        ex.getResponseHeaders.add("Content-Type",
          "application/sparql-results+xml")
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out); ex.close()
      })
      server.start()
      try {
        val back = spark.read.format("sparql")
          .option("url",
            s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
          .option("query", "SELECT * { ?s ?p ?o }")
          .option("vars", "t,c").load()
        println("--- decoded rows equal the original: " +
          (back.collect().toSeq.sortBy(_.toString) ==
            res.collect().toSeq.sortBy(_.toString)))
      } finally server.stop(0)
    }

    println("=== r14: C4 + Gopher filter family over a toy corpus:")
    locally {
      import org.apache.spark.sql.{functions => F}
      import graft.pipeline.TextAnalysis
      import spark.implicits._
      val docs = Seq(
        (1L, "This page is a fine piece of writing that survives the gates.\n" +
          "Please enable javascript to continue reading this page.\n" +
          "A second well formed sentence keeps the page alive.\n" +
          "And a third proper sentence closes the argument here."),
        (2L, "data data data data data data data data data data"),
        (3L, "short page")).toDF("id", "text")
      println("--- c4Filter keeps:")
      TextAnalysis.c4Filter(docs, "id", "text").show(false)
      println("--- gopherQuality + gopherRepetition + finewebQuality verdicts:")
      docs.select(F.col("id"),
        TextAnalysis.gopherQuality(F.col("text")).getField("passes")
          .as("quality_ok"),
        TextAnalysis.gopherRepetition(F.col("text")).getField("passes")
          .as("repetition_ok"),
        TextAnalysis.gopherRepetition(F.col("text"))
          .getField("top_2gram_char_frac").as("top2"),
        TextAnalysis.finewebQuality(F.col("text")).getField("passes")
          .as("fineweb_ok")).show(false)
      println("--- c4SpanDedup (3-line span, corpus-wide first keeps):")
      val spanDocs = Seq(
        (1L, "a unique head\ncommon one\ncommon two\ncommon three"),
        (2L, "b unique head\ncommon one\ncommon two\ncommon three"))
        .toDF("id", "text")
      TextAnalysis.c4SpanDedup(spanDocs, "id", "text").show(false)
      println("--- sentences() + sentence-granular span dedup:")
      val sentDocs = Seq(
        (1L, "Opening one. Shared alpha. Shared beta! Shared gamma? End one."),
        (2L, "Opening two. Shared alpha. Shared beta! Shared gamma? End two."))
        .toDF("id", "text")
      sentDocs.select(F.col("id"),
        TextAnalysis.sentences(F.col("text")).as("sentences")).show(false)
      TextAnalysis.c4SpanDedupSentences(sentDocs, "id", "text").show(false)
    }

    println("=== r14: strict N-Triples/N-Quads grammar (the distributed ingest boundary):")
    locally {
      val dir = java.nio.file.Files.createTempDirectory("graft-ntdrive")
      val good = dir.resolve("good.nt")
      // UCHAR escapes in an IRI (the DBpedia-dump shape), a tight dot
      // after a LANGTAG, and a tight dot after a bnode label
      java.nio.file.Files.writeString(good,
        "<http://example.com/datatype/C\\u00F3rdoba> <http://example.com/label> \"C\\u00F3rdoba\"@en.\n" +
          "<http://example.com/s> <http://example.com/knows> _:b.\n")
      val g = sources.NTriples.read(spark, good.toString)
      println("--- UCHAR-escaped IRI unescapes; @en. / _:b. terminate correctly:")
      Engine.fromGraph(g).select(
        "SELECT ?s ?p ?o { ?s ?p ?o } ORDER BY ?p").show(false)
      val bad = dir.resolve("bad.nt")
      java.nio.file.Files.writeString(bad,
        "<http://example.com/s> <http://example.com/p> <http://example.com/o> <http://example.com/g> .\n" +
          "<http://example.com/s> <http://example.com/p> \"ok\" .\n")
      println("--- strict read rejects a quad in a .nt file (policy boundary):")
      try { sources.NTriples.read(spark, bad.toString).size; println("BUG: accepted") }
      catch { case e: Throwable =>
        println("rejected: " + String.valueOf(e.getMessage).linesIterator.next()) }
      println("--- lenient read skips it: " +
        sources.NTriples.read(spark, bad.toString, lenient = true).size + " triple(s)")

      println("--- streaming ingest: new .nt files landing in a directory:")
      val landing = java.nio.file.Files.createTempDirectory("graft-ntland")
      java.nio.file.Files.writeString(landing.resolve("batch1.nt"),
        "<http://example.com/s> <http://example.com/p> \"first batch\" .\n")
      val q = sources.NTriples.readStream(spark, landing.toString)
        .writeStream.outputMode("append").format("memory")
        .queryName("drive_ntstream").start()
      q.processAllAvailable()
      java.nio.file.Files.writeString(landing.resolve("batch2.nt"),
        "<http://example.com/s2> <http://example.com/p> \"landed later\"@en.\n")
      q.processAllAvailable()
      q.stop()
      spark.table("drive_ntstream").show(false)

      println("--- continuous ingest INTO a persisted graph store (set semantics):")
      val land2 = java.nio.file.Files.createTempDirectory("graft-ingestland")
      val store = java.nio.file.Files.createTempDirectory("graft-ingeststore")
        .toString + "/store"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ingestckpt")
      java.nio.file.Files.writeString(land2.resolve("a.nt"),
        "<http://example.com/s1> <http://example.com/knows> <http://example.com/s2> .\n")
      sources.GraphStore.startNtIngest(spark, land2.toString, store,
        "drive_ingest1", checkpointDir = Some(ckpt.toString)).awaitTermination()
      java.nio.file.Files.writeString(land2.resolve("b.nt"),
        "<http://example.com/s1> <http://example.com/knows> <http://example.com/s2> .\n" +
          "<http://example.com/s2> <http://example.com/knows> <http://example.com/s3> .\n")
      sources.GraphStore.startNtIngest(spark, land2.toString, store,
        "drive_ingest2", checkpointDir = Some(ckpt.toString)).awaitTermination()
      val merged = sources.GraphStore.load(spark, store)
      println(s"store after two ingest runs (dup line anti-joined away): " +
        s"${merged.size} triples; predCounts=${merged.predCounts}")
      Engine.fromGraph(merged).select(
        "SELECT ?a ?b { ?a <http://example.com/knows> ?b } ORDER BY ?a")
        .show(false)

      println("--- quad-store continuous ingest (.nq landing dir, named graphs):")
      val land3 = java.nio.file.Files.createTempDirectory("graft-nqland")
      val qstore = java.nio.file.Files.createTempDirectory("graft-nqstore")
        .toString + "/store"
      val qckpt = java.nio.file.Files.createTempDirectory("graft-nqckpt")
      java.nio.file.Files.writeString(land3.resolve("a.nq"),
        "<http://example.com/s1> <http://example.com/p> \"default graph\" .\n" +
          "<http://example.com/s1> <http://example.com/p> \"in g1\" <http://example.com/g1> .\n")
      sources.GraphStore.startNqIngest(spark, land3.toString, qstore,
        "drive_nq1", checkpointDir = Some(qckpt.toString)).awaitTermination()
      java.nio.file.Files.writeString(land3.resolve("b.nq"),
        "<http://example.com/s1> <http://example.com/p> \"in g1\" <http://example.com/g1> .\n" +
          "<http://example.com/s2> <http://example.com/p> \"in g2\" <http://example.com/g2> .\n")
      sources.GraphStore.startNqIngest(spark, land3.toString, qstore,
        "drive_nq2", checkpointDir = Some(qckpt.toString)).awaitTermination()
      val qmerged = sources.GraphStore.load(spark, qstore)
      println(s"quad store after two runs (replayed quad anti-joined away): " +
        s"${qmerged.size} quads across graph dirs " +
        new java.io.File(qstore).listFiles.map(_.getName)
          .filter(_.startsWith("__g=")).sorted.mkString("[", ", ", "]"))
      Engine.fromGraph(qmerged).select(
        "SELECT ?g ?o { GRAPH ?g { ?s <http://example.com/p> ?o } } ORDER BY ?g")
        .show(false)

      println("--- bloom prefilter + compaction (r16 ingest hardening):")
      val knowsDir =
        new java.io.File(store, "__pred=http%3A%2F%2Fexample.com%2Fknows")
      println(s"bloom sidecar after ingest: " +
        new java.io.File(knowsDir, "_bloom.bin").isFile)
      // a few more ticks to accumulate sliver files, then compact
      for (t <- 0 until 4) {
        java.nio.file.Files.writeString(land2.resolve(s"c$t.nt"),
          s"<http://example.com/x$t> <http://example.com/knows> <http://example.com/y$t> .\n")
        sources.GraphStore.startNtIngest(spark, land2.toString, store,
          s"drive_ingest_c$t", checkpointDir = Some(ckpt.toString))
          .awaitTermination()
      }
      def files() = knowsDir.listFiles.count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      val nBefore = files()
      val compacted = sources.GraphStore.compact(spark, store)
      println(s"compact: $nBefore part files -> ${files()} " +
        s"($compacted dir rewritten); store still answers:")
      Engine.fromGraph(sources.GraphStore.load(spark, store)).select(
        "SELECT (COUNT(*) AS ?n) { ?a <http://example.com/knows> ?b }")
        .show(false)
    }

    spark.stop()
  }
}
