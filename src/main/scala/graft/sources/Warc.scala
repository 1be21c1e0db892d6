package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import graft.expressions.{ColumnBridge, Gunzip, HttpMessage, WarcRecords}

/** Web-archive (WARC, ISO 28500) ingestion — the front door of a crawl
  * corpus. Two read shapes, one record schema:
  *
  *  - [[read]]: `binaryFile` source → per-row [[gunzip]] → [[records]]
  *    explode. Whole files materialize as rows, so it suits segments
  *    below the gunzip bomb cap (256 MiB decompressed) — re-sharded
  *    archives, test fixtures, targeted fetches.
  *  - [[readStreamed]]: the 100 TB path. One task per file streams
  *    records off the (optionally gzipped) byte stream with CONSTANT
  *    memory — no whole-file row ever exists, so 1 GB+ Common Crawl
  *    segments read fine. Parallelism = number of files (a crawl ships
  *    tens of thousands), which is the natural WARC split unit: gzipped
  *    members are not byte-range splittable.
  *
  * Both return one row per record: (file, warc_type, target_uri, date,
  * record_id, content_type, payload). Downstream composes columnar:
  * [[httpMessage]] unwraps response payloads (de-chunked), [[Gunzip]]
  * undoes `Content-Encoding: gzip`, `TextAnalysis.htmlText` extracts
  * text, and `Curation.curate` takes it from there — the whole chain
  * stays in one Catalyst plan (narrow, shuffle-free) per file split. */
object Warc {

  /** `warc_records(bytes)` — see [[graft.expressions.WarcRecords]]. */
  def records(bytes: Column): Column =
    ColumnBridge.column(WarcRecords(ColumnBridge.expression(bytes)))

  /** `http_message(bytes)` — see [[graft.expressions.HttpMessage]]. */
  def httpMessage(bytes: Column): Column =
    ColumnBridge.column(HttpMessage(ColumnBridge.expression(bytes)))

  /** `gunzip(bytes)` (re-exported for chain building). */
  def gunzip(bytes: Column): Column =
    ColumnBridge.column(Gunzip(ColumnBridge.expression(bytes)))

  private val recordCols = Seq(
    F.col("file"),
    F.col("r.warc_type").as("warc_type"),
    F.col("r.target_uri").as("target_uri"),
    F.col("r.date").as("date"),
    F.col("r.record_id").as("record_id"),
    F.col("r.content_type").as("content_type"),
    F.col("r.payload").as("payload"))

  /** Expression-based reader over Spark's `binaryFile` source: each
    * matched file becomes one row, `.gz`/`.warc.gz` rows inflate
    * through the bomb-capped [[Gunzip]], and [[records]] explodes.
    * Suited to segments whose DECOMPRESSED size is under the gunzip
    * cap; beyond that use [[readStreamed]]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
    val bytes = F.when(F.col("path").endsWith(".gz"),
      gunzip(F.col("content"))).otherwise(F.col("content"))
    bin.select(F.col("path").as("file"),
        F.explode(records(bytes)).as("r"))
      .select(recordCols: _*)
  }

  /** One streamed record as a plain tuple (a private case class here
    * would break the Dataset encoder's generated code, which needs
    * public accessors): (file, warc_type, target_uri, date, record_id,
    * content_type, payload) — strings nullable, not every record type
    * carries a target URI. */
  private type Rec = (String, String, String, String, String, String,
      Array[Byte])

  /** Constant-memory streamed reader: lists `path` through the Hadoop
    * filesystem (so the same call works on HDFS/S3A in a real
    * deployment), one task per file, each task walking its stream
    * record by record. Per-record payloads above `maxPayload` are
    * skipped (streamed past, not buffered) — the same
    * degrade-don't-die contract as the media decoders; a corrupt or
    * truncated record ends that FILE's iteration (matching
    * [[graft.expressions.WarcRecords]] truncation semantics) without
    * failing the task. */
  def readStreamed(spark: SparkSession, path: String,
      maxPayload: Int = 64 << 20): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    val files: Seq[String] = {
      // glob first (handles dir/*.warc.gz); a match that is itself a
      // directory expands one level, so a plain directory path works too
      val globbed = Option(fs.globStatus(p)).getOrElse(Array.empty).toSeq
      globbed.flatMap { st =>
        if (st.isFile) Seq(st)
        else fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      }.map(_.getPath.toString).sorted
    }
    val nPart = math.max(1, files.size)
    spark.createDataset(files).repartition(nPart)
      .mapPartitions { paths =>
        paths.flatMap { file =>
          val fp = new org.apache.hadoop.fs.Path(file)
          val raw = fp.getFileSystem(conf.value).open(fp)
          val in: java.io.InputStream =
            if (file.endsWith(".gz"))
              new java.util.zip.GZIPInputStream(
                new java.io.BufferedInputStream(raw, 1 << 16), 1 << 16)
            else new java.io.BufferedInputStream(raw, 1 << 16)
          streamRecords(file, in, maxPayload)
        }
      }
      .toDF("file", "warc_type", "target_uri", "date", "record_id",
        "content_type", "payload")
  }

  /** Iterator over the records of one WARC stream; closes `in` at the
    * end. Bounded state: a 64 KiB header block + one payload (≤
    * `maxPayload`) at a time. */
  private def streamRecords(file: String, in: java.io.InputStream,
      maxPayload: Int): Iterator[Rec] = new Iterator[Rec] {
    private val din = new java.io.DataInputStream(in)
    private var nextRec: Rec = null
    private var finished = false

    private def readLine(): String = {
      // reads through LF; returns content without CR/LF, null on EOF
      // or when a line overruns the header cap (corruption marker)
      val buf = new java.io.ByteArrayOutputStream(128)
      var c = din.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n' && buf.size < WarcRecords.MaxHeaderBytes) {
        buf.write(c); c = din.read()
      }
      if (c != '\n') return null // EOF mid-line / oversized line
      val bytes = buf.toByteArray
      val len = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
        bytes.length - 1 else bytes.length
      new String(bytes, 0, len, java.nio.charset.StandardCharsets.UTF_8)
    }

    /** Parse records until one fits (< maxPayload) or the stream ends;
      * oversized payloads are skipped without buffering. */
    private def advance(): Unit = {
      try {
        while (nextRec == null && !finished) {
          // skip inter-record CRLFs to the version line
          var line = readLine()
          while (line != null && line.isEmpty) line = readLine()
          if (line == null || !line.startsWith("WARC/")) { finished = true }
          else {
            val hs = new graft.expressions.WarcRecords.Headers
            var total = line.length
            var h = readLine()
            while (h != null && h.nonEmpty &&
                total < WarcRecords.MaxHeaderBytes) {
              hs.line(h); total += h.length
              h = readLine()
            }
            if (h == null || h.nonEmpty || hs.contentLength < 0) {
              finished = true // corrupt header block ends this file
            } else if (hs.contentLength > maxPayload) {
              var toSkip = hs.contentLength // degrade: stream past it
              while (toSkip > 0 && !finished) {
                val k = din.skip(toSkip)
                if (k <= 0) finished = true else toSkip -= k
              }
            } else {
              val payload = new Array[Byte](hs.contentLength.toInt)
              din.readFully(payload)
              nextRec = (file, hs.warcType, hs.targetUri, hs.date,
                hs.recordId, hs.contentType, payload)
            }
          }
        }
      } catch {
        case _: java.io.IOException => finished = true // truncated stream
      }
      if (finished) try din.close() catch { case _: Exception => }
    }

    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): Rec = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      advance()
      r
    }
  }

  /** Crawl pages: `response` records unwrapped to
    * (file, url, date, status, mime, content_encoding, body) — the
    * frame `Curation.curate(htmlInput = true)` consumes after an
    * optional [[gunzip]] of gzip-encoded bodies. Narrow end to end. */
  def pages(records: DataFrame): DataFrame = {
    val msg = httpMessage(F.col("payload"))
    records
      .where(F.col("warc_type") === "response")
      .withColumn("m", msg)
      .where(F.col("m").isNotNull)
      .select(F.col("file"), F.col("target_uri").as("url"), F.col("date"),
        F.col("m.status").as("status"),
        F.col("m.content_type").as("mime"),
        F.col("m.content_encoding").as("content_encoding"),
        F.col("m.body").as("body"))
  }
}
