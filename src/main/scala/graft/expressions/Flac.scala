package graft.expressions

import scala.util.control.ControlThrowable

/** REAL FLAC sample decode — pure integer arithmetic from the public
  * format spec, no codec library: metadata-block walk to STREAMINFO,
  * then per-frame decode of every subframe type (CONSTANT, VERBATIM,
  * FIXED orders 0-4, LPC orders 1-32) with Rice/Rice2 residual coding,
  * escape partitions, wasted bits, and the three stereo decorrelation
  * modes (left/side, right/side, mid/side). FLAC is lossless, so the
  * decoded samples are bit-exact — this is a full decoder, not a
  * heuristic.
  *
  * Frame-header and frame CRCs (CRC-8 / CRC-16) are parsed but NOT
  * verified: corrupt bytes already degrade through bounds-checked reads
  * (the shared [[Samples.Sink]] contract is "never throw"), and
  * skipping verification keeps decode at full scan speed.
  *
  * Multi-channel frames downmix to mono by averaging each inter-channel
  * frame, matching [[Samples.walkWav]]'s contract, so a stereo FLAC's
  * features/embedding equal its mono twin's. */
private[graft] object Flac {

  // preallocated control-flow bail: corrupt/truncated bytes end the
  // decode without paying for a stack trace
  private object Bail extends ControlThrowable

  /** MSB-first bit reader over b[..endByte); every read bounds-checks
    * and bails, so crafted lengths can never index out of range. */
  private final class BitReader(b: Array[Byte], startByte: Int, endByte: Int) {
    private var pos: Long = startByte.toLong << 3
    private val end: Long = endByte.toLong << 3
    def bitsLeft: Long = end - pos
    def readBit(): Int = {
      if (pos >= end) throw Bail
      val bit = (b((pos >>> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      bit
    }
    def readBitsLong(n: Int): Long = {
      if (n == 0) return 0L
      if (pos + n > end) throw Bail
      var v = 0L
      var left = n
      while (left > 0) {
        val i = (pos >>> 3).toInt
        val off = (pos & 7).toInt
        val take = math.min(8 - off, left)
        v = (v << take) | (((b(i) & 0xff) >> (8 - off - take)) & ((1 << take) - 1))
        pos += take
        left -= take
      }
      v
    }
    def readBits(n: Int): Int = readBitsLong(n).toInt
    def readSigned(n: Int): Long = {
      val shift = 64 - n
      (readBitsLong(n) << shift) >> shift
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1 // readBit bails at end-of-buffer
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
  }

  /** Decode every sample of a FLAC stream into `sink` (downmixed to
    * mono, normalized to [-1, 1)); returns the decoded inter-channel
    * frame count, 0 for a legitimately empty stream (STREAMINFO with
    * zero declared samples and no frames), or -1 when the bytes are not
    * decodable FLAC. A stream that fails mid-way keeps what decoded so
    * far (like a truncated WAV data chunk). */
  def walk(b: Array[Byte], sink: Samples.Sink): Long = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    if (n < 4 + 4 + 34 || u(0) != 'f' || u(1) != 'L' || u(2) != 'a' ||
        u(3) != 'C' || (u(4) & 0x7f) != 0) return -1L
    // metadata blocks; the first is mandatorily STREAMINFO
    var off = 4
    var streamRate = -1; var streamCh = -1; var streamBps = -1
    var totalSamples = 0L
    var last = false
    var first = true
    while (!last) {
      if (off + 4 > n) return -1L
      last = (u(off) & 0x80) != 0
      val btype = u(off) & 0x7f
      val blen = (u(off + 1) << 16) | (u(off + 2) << 8) | u(off + 3)
      val body = off + 4
      if (body + blen > n) return -1L
      if (first) {
        if (btype != 0 || blen < 34) return -1L
        val s = body
        // packed at +10: 20-bit rate, 3-bit channels-1, 5-bit bps-1,
        // 36-bit total samples (same field walk as AudioHeaderMeta)
        streamRate = (u(s + 10) << 12) | (u(s + 11) << 4) | (u(s + 12) >> 4)
        streamCh = ((u(s + 12) >> 1) & 7) + 1
        streamBps = (((u(s + 12) & 1) << 4) | (u(s + 13) >> 4)) + 1
        totalSamples = ((u(s + 13) & 0x0f).toLong << 32) |
          (u(s + 14).toLong << 24) | (u(s + 15) << 16) |
          (u(s + 16) << 8) | u(s + 17)
        if (streamRate <= 0) return -1L
        first = false
      }
      off = body + blen
    }
    val r = new BitReader(b, off, n)
    var decoded = 0L
    var chBuf = Array.fill(streamCh)(new Array[Long](0))
    // decompression-bomb guard: a crafted stream of ~14-byte CONSTANT
    // frames can declare 65536 samples each (~5000 samples/byte), so
    // crafted megabytes would otherwise amplify into billions of sink
    // calls. Real encoders stay far below 4096 samples/byte (libFLAC
    // blocks are ≤4608, streamable-subset ≤16384 → ≤1200/byte even for
    // pure silence); only a hand-built stream of back-to-back
    // 65535-sample CONSTANT frames exceeds it, and such a stream is
    // indistinguishable from an attack. The floor admits small
    // single-frame files, the absolute ceiling (~5.8 h of 48 kHz mono)
    // bounds any row's decode work outright. totalSamples can't serve
    // as the cap — it is itself attacker-controlled. Hitting the cap
    // truncates like a short read (the decoded prefix is kept).
    val maxDecoded =
      math.min(math.max(4096L * n, 1L << 20), 1000000000L)
    try {
      while (r.bitsLeft >= 16 && decoded < maxDecoded &&
          (totalSamples == 0L || decoded < totalSamples)) {
        // frame header: 14-bit sync (11111111111110) + reserved 0 +
        // blocking-strategy bit
        if (r.readBits(8) != 0xff || (r.readBits(8) & 0xfe) != 0xf8) throw Bail
        val bsCode = r.readBits(4)
        val srCode = r.readBits(4)
        val chAsgn = r.readBits(4)
        val ssCode = r.readBits(3)
        if (r.readBit() != 0) throw Bail // reserved
        // UTF-8-style coded frame/sample number: length from byte 1
        val nb0 = r.readBits(8)
        var extra =
          if ((nb0 & 0x80) == 0) 0
          else if ((nb0 & 0xe0) == 0xc0) 1
          else if ((nb0 & 0xf0) == 0xe0) 2
          else if ((nb0 & 0xf8) == 0xf0) 3
          else if ((nb0 & 0xfc) == 0xf8) 4
          else if ((nb0 & 0xfe) == 0xfc) 5
          else if (nb0 == 0xfe) 6
          else throw Bail
        while (extra > 0) {
          if ((r.readBits(8) & 0xc0) != 0x80) throw Bail
          extra -= 1
        }
        val blockSize = bsCode match {
          case 0 => throw Bail // reserved
          case 1 => 192
          case c if c <= 5 => 576 << (c - 2)
          case 6 => r.readBits(8) + 1
          case 7 => r.readBits(16) + 1
          case c => 256 << (c - 8)
        }
        srCode match { // the rate itself comes from STREAMINFO
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case 15 => throw Bail
          case _ => ()
        }
        val bps = ssCode match {
          case 0 => streamBps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => throw Bail
        }
        r.readBits(8) // header CRC-8: parsed, not verified
        val channels =
          if (chAsgn < 8) chAsgn + 1
          else if (chAsgn <= 10) 2
          else throw Bail
        if (channels != streamCh || bps <= 0 || bps > 32) throw Bail
        if (chBuf(0).length < blockSize)
          chBuf = Array.fill(channels)(new Array[Long](blockSize))
        var ch = 0
        while (ch < channels) {
          // the side channel of a decorrelated pair carries one extra bit
          val sideBit = chAsgn match {
            case 8 | 10 => if (ch == 1) 1 else 0 // left/side, mid/side
            case 9 => if (ch == 0) 1 else 0      // side/right
            case _ => 0
          }
          decodeSubframe(r, chBuf(ch), blockSize, bps + sideBit)
          ch += 1
        }
        r.alignByte()
        r.readBits(16) // frame CRC-16: parsed, not verified
        chAsgn match {
          case 8 => // (left, side): right = left - side
            var i = 0
            while (i < blockSize) {
              chBuf(1)(i) = chBuf(0)(i) - chBuf(1)(i); i += 1
            }
          case 9 => // (side, right): left = right + side
            var i = 0
            while (i < blockSize) {
              chBuf(0)(i) = chBuf(1)(i) + chBuf(0)(i); i += 1
            }
          case 10 => // (mid, side): mid regains side's low bit
            var i = 0
            while (i < blockSize) {
              val side = chBuf(1)(i)
              val mid = (chBuf(0)(i) << 1) | (side & 1)
              chBuf(0)(i) = (mid + side) >> 1
              chBuf(1)(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }
        val scale = (1L << (bps - 1)).toDouble
        var i = 0
        while (i < blockSize) {
          var sum = 0.0
          var c = 0
          while (c < channels) { sum += chBuf(c)(i); c += 1 }
          sink.accept(sum / channels / scale)
          i += 1
        }
        decoded += blockSize
      }
      if (decoded == 0L && totalSamples > 0L) -1L // truncated: no frames
      else decoded
    } catch {
      // mid-stream corruption keeps the decoded prefix, like a
      // truncated WAV; corruption before the first frame completes → -1
      case Bail => if (decoded > 0) decoded else -1L
    }
  }

  private def decodeSubframe(r: BitReader, out: Array[Long],
      blockSize: Int, bits: Int): Unit = {
    if (r.readBit() != 0) throw Bail // padding bit
    val t = r.readBits(6)
    var wasted = 0
    if (r.readBit() == 1) { // unary-coded wasted-bits-per-sample
      wasted = 1
      while (r.readBit() == 0) wasted += 1
    }
    val eff = bits - wasted
    // 33 covers the side channel of 32-bit decorrelated stereo (side
    // samples carry one extra bit); all arithmetic below is Long-wide
    if (eff <= 0 || eff > 33) throw Bail
    if (t == 0) { // CONSTANT
      java.util.Arrays.fill(out, 0, blockSize, r.readSigned(eff) << wasted)
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = r.readSigned(eff) << wasted; i += 1 }
    } else if (t >= 8 && t <= 12) { // FIXED, polynomial order 0-4
      val order = t - 8
      if (order > blockSize) throw Bail
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff); i += 1 }
      decodeResidual(r, out, blockSize, order)
      i = order
      order match {
        case 0 => ()
        case 1 => while (i < blockSize) { out(i) += out(i - 1); i += 1 }
        case 2 => while (i < blockSize) {
          out(i) += 2 * out(i - 1) - out(i - 2); i += 1
        }
        case 3 => while (i < blockSize) {
          out(i) += 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3); i += 1
        }
        case _ => while (i < blockSize) {
          out(i) += 4 * out(i - 1) - 6 * out(i - 2) +
            4 * out(i - 3) - out(i - 4); i += 1
        }
      }
      shiftWasted(out, blockSize, wasted)
    } else if (t >= 32) { // LPC, order 1-32
      val order = t - 31
      if (order > blockSize) throw Bail
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff); i += 1 }
      val precision = r.readBits(4) + 1
      if (precision == 16) throw Bail // 1111 is invalid
      val shift = r.readSigned(5).toInt
      if (shift < 0) throw Bail
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      decodeResidual(r, out, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
      shiftWasted(out, blockSize, wasted)
    } else throw Bail // reserved subframe types
  }

  private def shiftWasted(out: Array[Long], blockSize: Int, wasted: Int): Unit =
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }

  /** Rice-coded residual into out[order, blockSize). */
  private def decodeResidual(r: BitReader, out: Array[Long],
      blockSize: Int, order: Int): Unit = {
    val method = r.readBits(2)
    if (method > 1) throw Bail
    val pbits = if (method == 0) 4 else 5 // RICE vs RICE2 parameter width
    val escape = (1 << pbits) - 1
    val po = r.readBits(4)
    val partitions = 1 << po
    if (blockSize % partitions != 0) throw Bail
    val psize = blockSize >> po
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = if (p == 0) psize - order else psize
      if (count < 0) throw Bail
      val param = r.readBits(pbits)
      if (param == escape) { // raw fixed-width partition
        val raw = r.readBits(5)
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0L else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) { // unary quotient + param low bits, zigzag
          val v = (r.readUnary().toLong << param) | r.readBitsLong(param)
          out(idx) = (v >>> 1) ^ -(v & 1L)
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }
}
