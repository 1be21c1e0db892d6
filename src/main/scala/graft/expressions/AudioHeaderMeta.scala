package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for header-level audio metadata: container
  * format, channel count, sample rate, bit depth, and duration parsed from
  * the raw leading bytes of a binary column — NO codec, the audio sibling
  * of [[ImageHeaderMeta]].
  *
  *  - WAV:  RIFF/WAVE container; chunk walk to `fmt ` (channels LE16,
  *    sample rate LE32, byte rate LE32, bits LE16) and `data` (payload
  *    size → duration = size·1000/byteRate). Chunks are word-aligned, so
  *    odd sizes advance one pad byte.
  *  - FLAC: `fLaC` magic, then the mandatory first STREAMINFO metadata
  *    block: a packed bit-field at offset +10 of the block body holds
  *    sample rate (20 bits), channels−1 (3 bits), bits-per-sample−1
  *    (5 bits), total samples (36 bits → duration; 0 = unknown → NULL
  *    duration).
  *  - MP3: optional ID3v2 tag (sync-safe length) skipped, then the
  *    MPEG audio frame header at the stream start — version/layer →
  *    bitrate and sample-rate tables, channel mode; duration from the
  *    Xing/Info VBR tag's frame count when present (exact), else the
  *    CBR estimate payloadBytes·8/kbps (a trailing ID3v1 tag is
  *    excluded), NULL for free-format bitrate without a VBR tag.
  *  - Ogg Vorbis: `OggS` BOS page whose first packet is the vorbis
  *    identification header (channels, rate); duration from the last
  *    page's granule position (total PCM samples), found by a bounded
  *    backward scan of the final 64 KiB.
  *  - Ogg Opus: same container, first packet `OpusHead` (channels,
  *    pre-skip, input sample rate); duration from the last granule
  *    position MINUS pre-skip, in the 48 kHz units Opus granules use.
  *  - AAC (ADTS): 0xFFF sync with layer 00, sampling-frequency-index
  *    and channel-configuration tables from the fixed header; duration
  *    by walking the 13-bit frame lengths (1024 samples per raw data
  *    block). Like the MP3 path, sync alone is too weak a signature —
  *    the frame walk must consume the input exactly (a truncated tail
  *    or trailing ID3v1 tag excepted) or the bytes are not ADTS.
  *
  * Returns struct(mime, channels, sample_rate, bits_per_sample,
  * duration_ms); bits_per_sample is 0 for the perceptual formats
  * (MP3/AAC/Ogg — no fixed linear bit depth); NULL for anything that
  * isn't a recognizable audio header. Same 100 TB role as the image
  * path: format/rate/length triage at full scan speed inside
  * whole-stage codegen, long before any decode stage. */
case class AudioHeaderMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_header_meta needs binary, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioHeaderMeta.metaType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_header_meta"

  override def nullSafeEval(input: Any): Any =
    AudioHeaderMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.AudioHeaderMeta.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioHeaderMeta =
    copy(child = newChild)
}

object AudioHeaderMeta {
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = true)))

  private val MimeWav = UTF8String.fromString("audio/wav")
  private val MimeFlac = UTF8String.fromString("audio/flac")
  private val MimeMp3 = UTF8String.fromString("audio/mpeg")
  private val MimeOgg = UTF8String.fromString("audio/ogg")
  private val MimeAac = UTF8String.fromString("audio/aac")
  private val MimeOpus = UTF8String.fromString("audio/opus")

  /** ADTS sampling_frequency_index table (ISO/IEC 14496-3). */
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  // MPEG audio bitrate (kbps) and sample-rate tables, indexed by
  // [version group][layer]: v1 = MPEG1, v2 = MPEG2/2.5
  private val BitrateV1 = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // L2
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))     // L3
  private val BitrateV2 = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),    // L1
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),         // L2
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))         // L3
  private val RateMpeg1 = Array(44100, 48000, 32000)
  private val RateMpeg2 = Array(22050, 24000, 16000)
  private val RateMpeg25 = Array(11025, 12000, 8000)

  /** (mime, channels, sampleRate, bits, durationMs or -1) of a recognized
    * audio header, else null. */
  def parseFields(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null) return null
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) |
        (u(i + 3).toLong << 24)) & 0xffffffffL
    def be24(i: Int): Int = (u(i) << 16) | (u(i + 1) << 8) | u(i + 2)
    // WAV: RIFF....WAVE, then a chunk walk for fmt  + data
    if (n >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'A' && u(10) == 'V' && u(11) == 'E') {
      var channels = -1; var rate = -1; var bits = -1
      var byteRate = 0L; var dataSize = -1L
      var badFmt = false
      // shared Riff walk: Long offsets, so crafted chunk sizes end the
      // loop instead of overflowing into a negative index — poison rows
      // degrade to NULL, they don't throw
      Riff.eachChunk(b, 12, n.toLong) { (i, size) =>
        if (u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' &&
            u(i + 3) == ' ') {
          if (size < 16 || i + 8 + 16 > n) { badFmt = true }
          else {
            channels = le16(i + 10)
            rate = le32(i + 12).toInt
            byteRate = le32(i + 16)
            bits = le16(i + 22)
          }
        } else if (u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' &&
            u(i + 3) == 'a') {
          dataSize = size
        }
        !badFmt && (channels < 0 || dataSize < 0)
      }
      if (badFmt || channels <= 0 || rate <= 0) return null
      val dur =
        if (dataSize >= 0 && byteRate > 0) dataSize * 1000L / byteRate
        else -1L
      return ("audio/wav", channels, rate, bits, dur)
    }
    // FLAC: fLaC magic + mandatory leading STREAMINFO block
    if (n >= 4 + 4 + 34 && u(0) == 'f' && u(1) == 'L' && u(2) == 'a' &&
        u(3) == 'C' && (u(4) & 0x7f) == 0) { // block type 0 = STREAMINFO
      val blockLen = be24(5)
      if (blockLen < 34) return null
      val s = 8 // STREAMINFO body start
      // +10: packed — 20 bits sample rate, 3 bits channels-1,
      // 5 bits bits-1, 36 bits total samples
      val rate = (u(s + 10) << 12) | (u(s + 11) << 4) | (u(s + 12) >> 4)
      val channels = ((u(s + 12) >> 1) & 0x07) + 1
      val bits = (((u(s + 12) & 0x01) << 4) | (u(s + 13) >> 4)) + 1
      val totalSamples = ((u(s + 13) & 0x0f).toLong << 32) |
        (u(s + 14).toLong << 24) | (u(s + 15) << 16) |
        (u(s + 16) << 8) | u(s + 17)
      if (rate <= 0) return null
      val dur =
        if (totalSamples > 0) totalSamples * 1000L / rate else -1L
      return ("audio/flac", channels, rate, bits, dur)
    }
    // MP3: optional ID3v2 tag, then an MPEG audio frame header at the
    // stream start (no mid-stream scan — triage reads file heads, and a
    // sync search over arbitrary bytes invites false positives)
    locally {
      var p = 0
      if (n >= 10 && u(0) == 'I' && u(1) == 'D' && u(2) == '3') {
        // ID3v2 size is 4 sync-safe (7-bit) bytes after version+flags;
        // the v2.4 footer flag adds a trailing 10-byte copy
        val tagLen = (u(6) << 21) | (u(7) << 14) | (u(8) << 7) | u(9)
        val skip = 10L + tagLen + (if ((u(5) & 0x10) != 0) 10L else 0L)
        if (skip < n) p = skip.toInt else return null
      }
      if (p + 4 <= n && u(p) == 0xff && (u(p + 1) & 0xe0) == 0xe0) {
        val versionBits = (u(p + 1) >> 3) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (u(p + 1) >> 1) & 3   // 3=L1, 2=L2, 1=L3
        val crcPresent = (u(p + 1) & 1) == 0  // protection bit 0 = CRC-16
        val brIdx = (u(p + 2) >> 4) & 15
        val srIdx = (u(p + 2) >> 2) & 3
        val padBit = (u(p + 2) >> 1) & 1
        val channels = if (((u(p + 3) >> 6) & 3) == 3) 1 else 2
        if (versionBits != 1 && layerBits != 0 && brIdx != 15 && srIdx != 3) {
          val layer = 3 - layerBits // 0-based L1/L2/L3
          val kbps =
            (if (versionBits == 3) BitrateV1 else BitrateV2)(layer)(brIdx)
          val rate = (versionBits match {
            case 3 => RateMpeg1
            case 2 => RateMpeg2
            case _ => RateMpeg25
          })(srIdx)
          val mono = channels == 1
          // a VBR file carries a Xing/Info tag in the first frame, at a
          // fixed offset past the (optional CRC and) side info; its
          // frame count gives the exact duration where the CBR byte
          // estimate would be wrong
          val xingOff = p + 4 + (if (crcPresent) 2 else 0) +
            (if (versionBits == 3) { if (mono) 17 else 32 }
            else { if (mono) 9 else 17 })
          var xing = false
          var dur = -1L
          if (xingOff + 12 <= n &&
              ((u(xingOff) == 'X' && u(xingOff + 1) == 'i' &&
                u(xingOff + 2) == 'n' && u(xingOff + 3) == 'g') ||
               (u(xingOff) == 'I' && u(xingOff + 1) == 'n' &&
                u(xingOff + 2) == 'f' && u(xingOff + 3) == 'o'))) {
            xing = true
            if ((u(xingOff + 7) & 1) == 1) { // frames-field-present flag
              val frames = ((u(xingOff + 8) << 24) | (u(xingOff + 9) << 16) |
                (u(xingOff + 10) << 8) | u(xingOff + 11)).toLong & 0xffffffffL
              val samplesPerFrame =
                if (layer == 0) 384
                else if (layer == 1) 1152
                else if (versionBits == 3) 1152
                else 576 // Layer III halves for MPEG2/2.5
              if (frames > 0) dur = frames * samplesPerFrame * 1000L / rate
            }
          }
          // 11 sync bits alone misfire on ordinary binary text (a
          // UTF-16LE BOM is FF FE): unless a VBR tag vouches for the
          // stream, require the NEXT frame's sync at the computed frame
          // boundary whenever enough bytes exist to check
          val frameLen =
            if (kbps <= 0) -1 // free format: length not computable
            else if (layer == 0) (12000 * kbps / rate + padBit) * 4
            else {
              val spf = if (layer == 1 || versionBits == 3) 144000 else 72000
              spf * kbps / rate + padBit
            }
          val secondSyncOk =
            xing || frameLen <= 0 || p + frameLen + 2 > n ||
              (u(p + frameLen) == 0xff &&
                (u(p + frameLen + 1) & 0xe0) == 0xe0)
          if (secondSyncOk) {
            if (dur < 0 && kbps > 0) {
              // CBR estimate over the audio payload; drop a trailing
              // ID3v1 tag ("TAG", 128 bytes) from the byte count
              val payloadEnd =
                if (n >= p + 128 + 4 && u(n - 128) == 'T' &&
                  u(n - 127) == 'A' && u(n - 126) == 'G') n - 128
                else n
              dur = (payloadEnd - p).toLong * 8L / kbps
            }
            return ("audio/mpeg", channels, rate, 0, dur)
          }
        }
      }
    }
    // AAC in ADTS framing: optional ID3v2 tag, then the 12-bit 0xFFF
    // sync with layer 00 (which the MP3 branch above rejects, so the
    // two framings never shadow each other)
    locally {
      var p = 0
      if (n >= 10 && u(0) == 'I' && u(1) == 'D' && u(2) == '3') {
        val tagLen = (u(6) << 21) | (u(7) << 14) | (u(8) << 7) | u(9)
        val skip = 10L + tagLen + (if ((u(5) & 0x10) != 0) 10L else 0L)
        if (skip < n) p = skip.toInt else return null
      }
      if (p + 7 <= n && u(p) == 0xff && (u(p + 1) & 0xf0) == 0xf0 &&
          ((u(p + 1) >> 1) & 3) == 0) {
        val srIdx = (u(p + 2) >> 2) & 0x0f
        val chanCfg = ((u(p + 2) & 1) << 2) | ((u(p + 3) >> 6) & 3)
        if (srIdx < AdtsRates.length && chanCfg > 0) {
          val rate = AdtsRates(srIdx)
          val channels = if (chanCfg == 7) 8 else chanCfg
          // frame walk: each frame's 13-bit length chains to the next
          // sync; raw-data-block count accumulates 1024-sample blocks
          var q = p
          var blocks = 0L
          var frames = 0
          var bad = false
          while (!bad && q + 7 <= n && u(q) == 0xff &&
              (u(q + 1) & 0xf0) == 0xf0 && ((u(q + 1) >> 1) & 3) == 0) {
            val flen = ((u(q + 3) & 3) << 11) | (u(q + 4) << 3) | (u(q + 5) >> 5)
            if (flen < 7) bad = true
            else {
              blocks += (u(q + 6) & 3) + 1
              frames += 1
              q += flen
            }
          }
          // the walk must land exactly at the end (or a truncated final
          // frame past it, or a trailing ID3v1 tag) — bare sync bits on
          // arbitrary bytes are not ADTS
          val tailOk = q >= n ||
            (q + 3 <= n && u(q) == 'T' && u(q + 1) == 'A' && u(q + 2) == 'G')
          if (!bad && frames > 0 && tailOk) {
            val dur = blocks * 1024L * 1000L / rate
            return ("audio/aac", channels, rate, 0, dur)
          }
        }
      }
    }
    // Ogg container: BOS page whose first packet identifies the codec —
    // vorbis identification header or OpusHead; duration from the LAST
    // page's granule position, found by a bounded backward scan
    if (n >= 27 + 1 + 19 && u(0) == 'O' && u(1) == 'g' && u(2) == 'g' &&
        u(3) == 'S' && u(4) == 0) {
      val nsegs = u(26)
      val pk = 27 + nsegs // first packet of the first page
      // last granule position in the final 64 KiB (total samples)
      def lastGranule(): Long = {
        var granule = -1L
        var q = n - 27 // last possible page header start
        val stop = math.max(0, n - 65536)
        while (granule < 0 && q > stop) {
          if (u(q) == 'O' && u(q + 1) == 'g' && u(q + 2) == 'g' &&
              u(q + 3) == 'S' && u(q + 4) == 0 && q != 0) {
            var g = 0L
            var i = 7
            while (i >= 0) { g = (g << 8) | u(q + 6 + i); i -= 1 }
            if (g > 0) granule = g
          }
          q -= 1
        }
        granule
      }
      if (pk + 30 <= n && u(pk) == 1 && u(pk + 1) == 'v' &&
          u(pk + 2) == 'o' && u(pk + 3) == 'r' && u(pk + 4) == 'b' &&
          u(pk + 5) == 'i' && u(pk + 6) == 's') {
        val channels = u(pk + 11)
        val rate = le32(pk + 12).toInt
        if (channels > 0 && rate > 0) {
          val granule = lastGranule()
          // crafted huge granules would overflow ·1000 — degrade
          val dur =
            if (granule > 0 && granule < Long.MaxValue / 1000)
              granule * 1000L / rate
            else -1L
          return ("audio/ogg", channels, rate, 0, dur)
        }
      }
      // OpusHead: magic(8) version(1) channels(1) preskip LE16
      // inputRate LE32 gain LE16 mapping(1) = 19 bytes. Opus granules
      // tick at 48 kHz regardless of the input rate; playback length
      // excludes the pre-skip samples (RFC 7845 §4).
      if (pk + 19 <= n && u(pk) == 'O' && u(pk + 1) == 'p' &&
          u(pk + 2) == 'u' && u(pk + 3) == 's' && u(pk + 4) == 'H' &&
          u(pk + 5) == 'e' && u(pk + 6) == 'a' && u(pk + 7) == 'd' &&
          (u(pk + 8) >> 4) == 0) { // major version 0 (value 1 = v0.1)
        val channels = u(pk + 9)
        val preSkip = le16(pk + 10)
        val inputRate = le32(pk + 12).toInt // informational; 0 = unknown
        if (channels > 0) {
          val granule = lastGranule()
          val dur =
            if (granule > preSkip && granule < Long.MaxValue / 1000)
              (granule - preSkip) * 1000L / 48000L
            else -1L
          return ("audio/opus", channels,
            if (inputRate > 0) inputRate else 48000, 0, dur)
        }
      }
    }
    null
  }

  /** InternalRow form for expression eval/codegen; -1 duration → NULL. */
  def parse(b: Array[Byte]): InternalRow = parseFields(b) match {
    case null => null
    case (mime, ch, rate, bits, dur) =>
      val m = mime match {
        case "audio/wav" => MimeWav
        case "audio/flac" => MimeFlac
        case "audio/mpeg" => MimeMp3
        case "audio/aac" => MimeAac
        case "audio/opus" => MimeOpus
        case _ => MimeOgg
      }
      InternalRow(m, ch, rate, bits,
        if (dur < 0) null else java.lang.Long.valueOf(dur))
  }
}
