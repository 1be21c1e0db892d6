package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * The data model: media is an opaque `binary` column plus typed metadata
  * (mime, width/height/duration, …). Decode / feature-extract / resize /
  * frame-sample run as *batched* per-partition functions (the Scala
  * equivalent of `mapInPandas`): rows are processed in fixed-size batches
  * inside `mapPartitions` so a real codec would amortize model/codec init
  * per batch, exactly like an Arrow-batched UDF.
  *
  * What is REAL here, parsed/decoded straight from the bytes:
  *  - header metadata for PNG/GIF/JPEG/BMP ([[headerImageMeta]]) and
  *    WAV/FLAC ([[headerAudioMeta]]) — format, dimensions, channels,
  *    sample rate, duration;
  *  - FULL sample/pixel decode for the uncompressed containers:
  *    PCM WAV → signal features ([[audioFeatures]]: rms/peak/zcr over
  *    every decoded sample) and 24-bit BMP → channel statistics
  *    ([[imageFeatures]]: per-channel means over every pixel). No codec
  *    library needed precisely because these formats are uncompressed.
  *
  * STUB NOTICE: COMPRESSED codecs (JPEG/PNG pixel decode, FLAC/MP3
  * samples, video) are not available in this container, so unrecognized
  * formats fall back to `fakeDecode` — a DETERMINISTIC FAKE
  * (hash-derived dimensions). The Spark-side plumbing — schema,
  * batching, partitioning, null handling — is real and tested; swap
  * `fakeDecode` for a real codec call to productionize.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("ok", BooleanType)))

  /** Synthesize an opaque media binary from any string column (test
    * fixture: deterministic bytes). */
  def syntheticMedia(seed: Column): Column =
    F.sha2(seed.cast(StringType).cast(BinaryType), 256).cast(BinaryType)

  /** DETERMINISTIC FAKE decode of one media blob — stands in for a real
    * codec (PIL/ffmpeg equivalent). Pure function of the bytes. */
  private def fakeDecode(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) Row(null, null, null, null, false)
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val frames = 1 + math.floorMod(h >> 20, 64).toInt
      Row("image/x-fake", w, ht, frames, true)
    }
  }

  /** Batched decode: binary column → metadata struct, processed in
    * `batchSize` chunks per partition (mapInPandas-shaped plumbing).
    * Recognized image containers (PNG/GIF/JPEG) take the REAL header
    * path — format + pixel dimensions parsed from the bytes, no codec,
    * still images reported as one frame; only unrecognized formats fall
    * back to the deterministic fake (the stubbed pixel-codec stand-in). */
  def withDecodedMeta(df: DataFrame, binCol: String, out: String = "meta",
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(out, mediaMetaType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real impl would init the codec once per batch here
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val meta =
            graft.expressions.ImageHeaderMeta.parseDims(bytes) match {
              case (mime, w, h) => Row(mime, w, h, 1, true)
              case null => fakeDecode(bytes)
            }
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }(enc)
  }

  /** Frame sampling: n evenly-spaced frame indexes from the decoded frame
    * count (metadata-only op — columnar, no stub needed). */
  def sampleFrameIndexes(meta: Column, n: Int): Column =
    F.when(meta.getField("n_frames").isNotNull && meta.getField("n_frames") > 0,
      F.transform(F.sequence(F.lit(0), F.lit(n - 1)),
        i => (i * meta.getField("n_frames") / n).cast(IntegerType)))

  /** "Resize" planning: target dims preserving aspect ratio (pure
    * arithmetic on metadata; the pixel op itself is the stubbed part). */
  def resizePlan(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast(DoubleType)
    val h = meta.getField("height").cast(DoubleType)
    val scale = F.least(F.lit(maxSide) / F.greatest(w, h), F.lit(1.0))
    F.struct(
      F.round(w * scale).cast(IntegerType).as("width"),
      F.round(h * scale).cast(IntegerType).as("height"))
  }

  /** Feature extraction stub: binary → fixed-dim embedding, derived
    * deterministically (stands in for a vision encoder). Columnar. */
  def fakeEmbedding(bin: Column, dim: Int = 16): Column =
    F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
      i => (F.pmod(F.xxhash64(bin, i), F.lit(1000L)).cast(DoubleType) / 500.0) - 1.0)

  /** REAL (not stubbed) header-level image metadata: container format
    * and pixel dimensions parsed from the leading bytes — PNG (IHDR),
    * GIF87a/89a (logical screen descriptor) and JPEG (segment walk to
    * the first SOFn frame header, whose file position varies). No codec
    * needed: one native codegen'd expression
    * ([[graft.expressions.ImageHeaderMeta]]), so a 100 TB media scan
    * gets sizes/filtering without decoding a single pixel (how real
    * lakehouse media pipelines triage before the GPU stage). Returns
    * struct(mime, width, height); null for unrecognized formats. */
  def headerImageMeta(bin: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.ImageHeaderMeta(
        graft.expressions.ColumnBridge.expression(bin)))

  /** Header-level AUDIO metadata from the raw leading bytes of a binary
    * column — the audio sibling of [[headerImageMeta]]: WAV (RIFF chunk
    * walk to `fmt `/`data`) and FLAC (STREAMINFO bit-field). Returns
    * struct(mime, channels, sample_rate, bits_per_sample, duration_ms);
    * null for unrecognized formats, null duration when the header doesn't
    * pin it (FLAC total_samples = 0). Native codegen'd expression
    * ([[graft.expressions.AudioHeaderMeta]]) — rate/length triage at scan
    * speed, no decode. */
  def headerAudioMeta(bin: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.AudioHeaderMeta(
        graft.expressions.ColumnBridge.expression(bin)))

  /** Header-level VIDEO metadata from the raw leading bytes — the third
    * triage leg after [[headerImageMeta]] and [[headerAudioMeta]]: AVI
    * (RIFF chunk walk to the `LIST hdrl` → `avih` main header). Returns
    * struct(mime, width, height, n_frames, duration_ms); null for
    * unrecognized formats, null duration when the header doesn't pin it.
    * Native codegen'd ([[graft.expressions.VideoHeaderMeta]]). */
  def headerVideoMeta(bin: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.VideoHeaderMeta(
        graft.expressions.ColumnBridge.expression(bin)))

  /** REAL sample decode + signal features for uncompressed PCM WAV:
    * struct(n_samples, rms, peak, zcr) computed from every decoded
    * sample ([[graft.expressions.AudioFeatures]] — 8/16-bit PCM needs no
    * codec). Null for compressed/unrecognized audio (that's the stubbed
    * codec stage's job). Narrow, codegen'd — the features fold inside
    * the decode loop, no sample array in the row. */
  def audioFeatures(bin: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.AudioFeatures(
        graft.expressions.ColumnBridge.expression(bin)))

  /** REAL pixel decode + channel statistics for uncompressed 24-bit BMP:
    * struct(width, height, mean_r, mean_g, mean_b) from every pixel
    * ([[graft.expressions.ImageFeatures]]). Null for compressed formats.
    * Same narrow/codegen posture as [[audioFeatures]]. */
  def imageFeatures(bin: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.ImageFeatures(
        graft.expressions.ColumnBridge.expression(bin)))

  /** The `functions._`-composed PNG/GIF-only reference form of
    * [[headerImageMeta]] — kept for the native-vs-composed parity test
    * (JPEG needs a segment walk that fixed-offset column arithmetic
    * can't express, which is why the pipeline path is native). */
  private[graft] def headerImageMetaComposed(bin: Column): Column = {
    def be(start: Int, len: Int): Column =
      F.conv(F.hex(F.substring(bin, start, len)), 16, 10).cast(IntegerType)
    // little-endian 16-bit: swap the two bytes before the hex decode
    def le16(start: Int): Column =
      F.conv(F.hex(F.concat(F.substring(bin, start + 1, 1),
        F.substring(bin, start, 1))), 16, 10).cast(IntegerType)
    val isPng = F.hex(F.substring(bin, 1, 8)) === "89504E470D0A1A0A"
    val isGif = F.substring(bin, 1, 6).cast(StringType)
      .isin("GIF87a", "GIF89a")
    F.when(isPng, F.struct(F.lit("image/png").as("mime"),
        be(17, 4).as("width"), be(21, 4).as("height")))
      .when(isGif, F.struct(F.lit("image/gif").as("mime"),
        le16(7).as("width"), le16(9).as("height")))
      .otherwise(F.lit(null).cast(StructType(Seq(
        StructField("mime", StringType), StructField("width", IntegerType),
        StructField("height", IntegerType)))))
  }
}
