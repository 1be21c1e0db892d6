package graft.expressions

/** Shared, validated audio sample walk for the audio expressions — ONE
  * copy of the container dispatch (WAV here, FLAC in [[Flac]]) and
  * per-sample decode, parameterized by a sink (a trait, not Function1,
  * so the per-sample call stays unboxed). [[AudioFeatures]] folds
  * rms/peak/zcr through it, [[AudioEmbedding]] folds Goertzel band
  * energies.
  *
  * Coverage by WAV fmt code: 1 (PCM — 8-bit unsigned, 16/24/32-bit
  * signed LE), 3 (IEEE float32/float64, non-finite samples degraded to
  * silence), the ITU-T G.711 companded codecs 7 (µ-law) / 6 (A-law)
  * expanded via 256-entry tables built once per JVM, 0x11 (mono
  * IMA/DVI ADPCM — true block compression, decoded with the standard
  * step/index adaption), and 0xFFFE (WAVE_FORMAT_EXTENSIBLE, unwrapped
  * to the real code from the GUID). Samples are normalized to
  * [-1, 1). */
private[graft] object Samples {

  trait Sink { def accept(x: Double): Unit }

  /** Container dispatch: WAV ([[walkWav]]) else FLAC ([[Flac.walk]] — a
    * full lossless decoder, every subframe type). Both walks validate
    * before the first sink call, so trying them in sequence never feeds
    * a sink from a rejected container. Returns the decoded (downmixed)
    * frame count, or -1 when neither container recognizes the bytes. */
  def walkAudio(b: Array[Byte], sink: Sink): Long = {
    val w = walkWav(b, sink)
    if (w >= 0) w else Flac.walk(b, sink)
  }

  // ITU-T G.711 expansion to 16-bit linear, normalized to [-1, 1).
  // µ-law: mag = 132·(2^e − 1) + m·2^(e+3) over the complemented byte.
  private val UlawTable: Array[Double] = Array.tabulate(256) { v =>
    val u = ~v & 0xff
    val e = (u >> 4) & 7
    val m = u & 0x0f
    val mag = 132 * ((1 << e) - 1) + (m << (e + 3))
    (if ((u & 0x80) != 0) -mag else mag) / 32768.0
  }

  // A-law: seg 0 → 16m+8, else (16m+264)·2^(seg−1), over the 0x55-xored
  // byte; bit 7 set = positive.
  private val AlawTable: Array[Double] = Array.tabulate(256) { v =>
    val a = v ^ 0x55
    val m = a & 0x0f
    val seg = (a >> 4) & 7
    val t = if (seg == 0) (m << 4) + 8 else ((m << 4) + 264) << (seg - 1)
    (if ((a & 0x80) != 0) t else -t) / 32768.0
  }

  // IMA/DVI ADPCM quantizer step sizes (89 entries) and index adaption.
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode every sample of a supported WAV into `sink`; returns the
    * sample count (0 for an empty data chunk — nothing fed), or -1 when
    * the bytes are not a supported WAV. All validation happens before
    * the first sink call. */
  def walkWav(b: Array[Byte], sink: Sink): Long = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32i(i: Int): Int =
      u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    def le64(i: Int): Long =
      (le32i(i) & 0xffffffffL) | (le32i(i + 4).toLong << 32)
    if (n < 12 || u(0) != 'R' || u(1) != 'I' || u(2) != 'F' || u(3) != 'F' ||
        u(8) != 'W' || u(9) != 'A' || u(10) != 'V' || u(11) != 'E') return -1L
    var fmtCode = -1; var bits = -1
    var channels = -1; var blockAlign = -1
    var spbExt = -1 // fmt extension: ADPCM samples per block
    var dataOff = -1; var dataLen = -1
    var badFmt = false
    // shared Riff walk: Long offsets, so a crafted 32-bit chunk size
    // ends the loop instead of overflowing into a negative index —
    // poison rows degrade to NULL, they don't throw
    Riff.eachChunk(b, 12, n.toLong) { (i, size) =>
      if (u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' && u(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > n) { badFmt = true }
        else {
          fmtCode = le16(i + 8)
          channels = le16(i + 10)
          blockAlign = le16(i + 20)
          bits = le16(i + 22)
          // the extension is only present when cbSize says so — junk
          // trailing bytes must not be misread as a sample cap
          if (size >= 20 && i + 8 + 20 <= n && le16(i + 24) >= 2)
            spbExt = le16(i + 26)
          // WAVE_FORMAT_EXTENSIBLE wraps the real format code in the
          // first two GUID bytes of the 22-byte extension — the usual
          // container for >16-bit PCM and float WAVs
          if (fmtCode == 0xfffe && size >= 40 && i + 8 + 40 <= n)
            fmtCode = le16(i + 32)
        }
      } else if (u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' &&
          u(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (n - dataOff).toLong).toInt // tolerate truncation
      }
      !badFmt && (fmtCode < 0 || dataOff < 0)
    }
    if (badFmt || dataOff < 0 || channels < 1) return -1L
    // IMA/DVI ADPCM (fmt 0x11, mono): block-compressed, decoded with the
    // standard step/index adaption — no codec library needed
    if (fmtCode == 0x11)
      return if (bits == 4 && channels == 1 && blockAlign > 4)
        walkImaAdpcm(b, dataOff, dataLen, blockAlign, spbExt, sink)
      else -1L
    // mode: 0 = PCM8, 1 = PCM16, 2 = µ-law, 3 = A-law, 4 = PCM24,
    // 5 = PCM32, 6 = float32, 7 = float64
    val mode = (fmtCode, bits) match {
      case (1, 8) => 0
      case (1, 16) => 1
      case (7, 8) => 2
      case (6, 8) => 3
      case (1, 24) => 4
      case (1, 32) => 5
      case (3, 32) => 6
      case (3, 64) => 7
      case _ => return -1L
    }
    val bytesPer = mode match {
      case 1 => 2
      case 4 => 3
      case 5 | 6 => 4
      case 7 => 8
      case _ => 1
    }
    // multi-channel input downmixes to mono, one averaged sample per
    // frame — rms/zcr/band energies of a stereo clip must match its
    // mono twin, not an interleaved zigzag of the channels
    val frames = dataLen / bytesPer / channels
    var f = 0
    while (f < frames) {
      var sum = 0.0
      var c = 0
      while (c < channels) {
        val p = dataOff + (f * channels + c) * bytesPer
        sum += (mode match {
          case 0 => (u(p) - 128) / 128.0
          case 1 => le16(p).toShort / 32768.0
          case 2 => UlawTable(u(p))
          case 3 => AlawTable(u(p))
          case 4 => // sign-extend the 24-bit little-endian sample
            (((u(p) | (u(p + 1) << 8) | (u(p + 2) << 16)) << 8) >> 8) /
              8388608.0
          case 5 => le32i(p) / 2147483648.0
          case 6 => // crafted NaN/Inf bit patterns would poison every
            // fold downstream — degrade them to silence
            val v = java.lang.Float.intBitsToFloat(le32i(p))
            if (java.lang.Float.isFinite(v)) v.toDouble else 0.0
          case _ =>
            val v = java.lang.Double.longBitsToDouble(le64(p))
            if (java.lang.Double.isFinite(v)) v else 0.0
        })
        c += 1
      }
      sink.accept(sum / channels)
      f += 1
    }
    frames.toLong
  }

  /** Decode mono IMA ADPCM blocks: 4-byte header (int16 predictor,
    * uint8 step index, reserved) then two 4-bit nibbles per byte, low
    * nibble first. Per-block output is capped at the fmt extension's
    * samplesPerBlock (when present and sane), so encoder pad nibbles in
    * a partially-filled final block are not decoded as samples. A
    * truncated final block decodes as far as the bytes go. Returns the
    * decoded sample count. */
  private def walkImaAdpcm(b: Array[Byte], dataOff: Int, dataLen: Int,
      blockAlign: Int, spbExt: Int, sink: Sink): Long = {
    def u(i: Int): Int = b(i) & 0xff
    val spbMax = (blockAlign - 4) * 2 + 1
    val spb = if (spbExt >= 1 && spbExt <= spbMax) spbExt else spbMax
    var count = 0L
    var block = dataOff
    val dataEnd = dataOff + dataLen
    while (block + 4 <= dataEnd) {
      var pred = ((u(block) | (u(block + 1) << 8)).toShort).toInt
      var index = math.max(0, math.min(88, u(block + 2)))
      sink.accept(pred / 32768.0) // the header carries sample 0 verbatim
      count += 1
      var blockSamples = 1
      val end = math.min(block + blockAlign, dataEnd)
      var p = block + 4
      while (p < end && blockSamples < spb) {
        val byte = u(p)
        var half = 0
        while (half < 2 && blockSamples < spb) {
          val nib = if (half == 0) byte & 0x0f else byte >> 4
          val step = ImaStepTable(index)
          var diff = step >> 3
          if ((nib & 1) != 0) diff += step >> 2
          if ((nib & 2) != 0) diff += step >> 1
          if ((nib & 4) != 0) diff += step
          pred = if ((nib & 8) != 0) pred - diff else pred + diff
          if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
          index += ImaIndexTable(nib & 7)
          if (index < 0) index = 0 else if (index > 88) index = 88
          sink.accept(pred / 32768.0)
          count += 1
          blockSamples += 1
          half += 1
        }
        p += 1
      }
      block += blockAlign
    }
    count
  }
}
