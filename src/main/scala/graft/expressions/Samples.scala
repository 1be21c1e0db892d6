package graft.expressions

/** Shared, validated WAV sample walk for the audio expressions — ONE
  * copy of the RIFF chunk walk, format dispatch and per-sample decode,
  * parameterized by a sink (a trait, not Function1, so the per-sample
  * call stays unboxed). [[AudioFeatures]] folds rms/peak/zcr through
  * it, [[AudioEmbedding]] folds Goertzel band energies.
  *
  * Coverage by WAV fmt code: 1 (PCM, 8-bit unsigned / 16-bit signed
  * LE) and the ITU-T G.711 companded codecs 7 (µ-law) / 6 (A-law),
  * expanded via 256-entry tables built once per JVM. Samples are
  * normalized to [-1, 1). */
private[graft] object Samples {

  trait Sink { def accept(x: Double): Unit }

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

  /** Decode every sample of a supported WAV into `sink`; returns the
    * sample count (0 for an empty data chunk — nothing fed), or -1 when
    * the bytes are not a supported WAV. All validation happens before
    * the first sink call. */
  def walkWav(b: Array[Byte], sink: Sink): Long = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) |
        (u(i + 3).toLong << 24)) & 0xffffffffL
    if (n < 12 || u(0) != 'R' || u(1) != 'I' || u(2) != 'F' || u(3) != 'F' ||
        u(8) != 'W' || u(9) != 'A' || u(10) != 'V' || u(11) != 'E') return -1L
    var fmtCode = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    // Long walk offset: a crafted 32-bit chunk size must advance past the
    // end of the blob (ending the loop), never overflow Int into a
    // negative index — poison rows degrade to NULL, they don't throw
    var iL = 12L
    while (iL + 8 <= n && (fmtCode < 0 || dataOff < 0)) {
      val i = iL.toInt
      val size = le32(i + 4)
      if (u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' && u(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > n) return -1L
        fmtCode = le16(i + 8)
        bits = le16(i + 22)
      } else if (u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' &&
          u(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (n - dataOff).toLong).toInt // tolerate truncation
      }
      iL += 8 + size + (size & 1)
    }
    if (dataOff < 0) return -1L
    // mode: 0 = PCM8, 1 = PCM16, 2 = µ-law, 3 = A-law
    val mode = (fmtCode, bits) match {
      case (1, 8) => 0
      case (1, 16) => 1
      case (7, 8) => 2
      case (6, 8) => 3
      case _ => return -1L
    }
    val bytesPer = if (mode == 1) 2 else 1
    val count = dataLen / bytesPer
    var k = 0
    while (k < count) {
      val x = mode match {
        case 0 => (u(dataOff + k) - 128) / 128.0
        case 1 => le16(dataOff + 2 * k).toShort / 32768.0
        case 2 => UlawTable(u(dataOff + k))
        case _ => AlawTable(u(dataOff + k))
      }
      sink.accept(x)
      k += 1
    }
    count.toLong
  }
}
