package graft

import org.apache.spark.sql.{functions => F}
import graft.expressions.{Flac, Samples}
import graft.pipeline.Multimodal

/** The FLAC decoder against a REFERENCE ENCODER written here from the
  * public spec: every subframe type (CONSTANT, VERBATIM, FIXED 0-4,
  * LPC), Rice residuals with partitions and escape codes, wasted bits,
  * all three stereo decorrelation modes, multi-frame streams, and
  * truncation. FLAC is lossless, so round trips must be bit-exact. */
class FlacSpec extends SparkSpec {

  // ---- reference encoder -------------------------------------------

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]
    private var cur = 0
    private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  private sealed trait Sub
  private case object Const extends Sub
  private case object Verb extends Sub
  private case class Fix(order: Int, param: Int, po: Int = 0) extends Sub
  private case class Lpc(coefs: Seq[Int], shift: Int, precision: Int,
      param: Int) extends Sub
  private case class Escape(rawBits: Int) extends Sub // raw-partition residual

  private def writeResidual(w: BitWriter, res: Array[Long], order: Int,
      blockSize: Int, param: Int, po: Int): Unit = {
    w.bits(0, 2) // method 0: 4-bit rice parameters
    w.bits(po, 4)
    val psize = blockSize >> po
    var idx = order
    for (p <- 0 until (1 << po)) {
      w.bits(param, 4)
      val count = if (p == 0) psize - order else psize
      for (_ <- 0 until count) {
        val x = res(idx); idx += 1
        val u = if (x >= 0) x << 1 else (-x << 1) - 1 // zigzag
        var q = (u >>> param).toInt
        while (q > 0) { w.bit(0); q -= 1 }
        w.bit(1)
        w.bits(u & ((1L << param) - 1), param)
      }
    }
  }

  private def fixedResidual(v: Array[Int], order: Int): Array[Long] = {
    val res = new Array[Long](v.length)
    for (i <- order until v.length) res(i) = order match {
      case 0 => v(i)
      case 1 => v(i) - v(i - 1).toLong
      case 2 => v(i) - 2L * v(i - 1) + v(i - 2)
      case 3 => v(i) - 3L * v(i - 1) + 3L * v(i - 2) - v(i - 3)
      case 4 => v(i) - 4L * v(i - 1) + 6L * v(i - 2) - 4L * v(i - 3) + v(i - 4)
    }
    res
  }

  private def subframe(w: BitWriter, s: Array[Int], bits: Int, sub: Sub,
      wasted: Int): Unit = {
    w.bit(0) // padding
    val t = sub match {
      case Const => 0
      case Verb => 1
      case Escape(_) => 8 // escape rides on an order-0 FIXED residual
      case Fix(o, _, _) => 8 + o
      case Lpc(c, _, _, _) => 32 + (c.length - 1)
    }
    w.bits(t, 6)
    if (wasted == 0) w.bit(0)
    else { // flag 1, then (wasted-1) zeros, then the terminating 1
      w.bit(1)
      for (_ <- 0 until wasted - 1) w.bit(0)
      w.bit(1)
    }
    val eff = bits - wasted
    val mask = (1L << eff) - 1
    val v = s.map(_ >> wasted)
    sub match {
      case Const => w.bits(v(0).toLong & mask, eff)
      case Verb => v.foreach(x => w.bits(x.toLong & mask, eff))
      case Escape(raw) => // order-0 FIXED whose one partition is raw
        w.bits(0, 2); w.bits(0, 4) // method 0, partition order 0
        w.bits(15, 4)              // 1111 = escape
        w.bits(raw, 5)
        val rawMask = (1L << raw) - 1
        v.foreach(x => w.bits(x.toLong & rawMask, raw))
      case Fix(o, p, po) =>
        for (i <- 0 until o) w.bits(v(i).toLong & mask, eff)
        writeResidual(w, fixedResidual(v, o), o, v.length, p, po)
      case Lpc(coefs, shift, prec, p) =>
        val o = coefs.length
        for (i <- 0 until o) w.bits(v(i).toLong & mask, eff)
        w.bits(prec - 1, 4)
        w.bits(shift.toLong & 0x1f, 5)
        val cmask = (1L << prec) - 1
        coefs.foreach(c => w.bits(c.toLong & cmask, prec))
        val res = new Array[Long](v.length)
        for (i <- o until v.length) {
          var acc = 0L
          for (j <- 0 until o) acc += coefs(j).toLong * v(i - 1 - j)
          res(i) = v(i) - (acc >> shift)
        }
        writeResidual(w, res, o, v.length, p, 0)
    }
  }

  /** Full stream: STREAMINFO + frames of stored (possibly decorrelated)
    * channels; bps is the stream bit depth (side channels get +1). */
  private def flac(chAsgn: Int, bps: Int,
      framesStored: Seq[Seq[Array[Int]]],
      mode: (Int, Int) => Sub = (_, _) => Verb,
      wasted: Int = 0, totalOverride: Long = -1): Array[Byte] = {
    val streamCh = if (chAsgn < 8) chAsgn + 1 else 2
    val total =
      if (totalOverride >= 0) totalOverride
      else framesStored.map(_.head.length.toLong).sum
    val w = new BitWriter
    // STREAMINFO (last metadata block)
    w.bits(0x664C6143L, 32) // fLaC
    w.bits(0x80, 8); w.bits(34, 24)
    w.bits(192, 16); w.bits(65535, 16) // block size bounds
    w.bits(0, 24); w.bits(0, 24)       // frame size bounds (unknown)
    w.bits(8000, 20); w.bits(streamCh - 1, 3); w.bits(bps - 1, 5)
    w.bits(total, 36)
    for (_ <- 0 until 16) w.bits(0, 8) // md5 (unchecked)
    framesStored.zipWithIndex.foreach { case (stored, fi) =>
      val bs = stored.head.length
      val bsCode = if (bs == 192) 1 else if (bs <= 256) 6 else 7
      val ssCode = bps match {
        case 8 => 1; case 12 => 2; case 16 => 4
        case 20 => 5; case 24 => 6; case 32 => 7
      }
      w.bits(0xff, 8); w.bits(0xf8, 8) // sync + fixed-blocksize strategy
      w.bits(bsCode, 4); w.bits(0, 4)  // block size code, rate from STREAMINFO
      w.bits(chAsgn, 4); w.bits(ssCode, 3); w.bit(0)
      w.bits(fi & 0x7f, 8)             // coded frame number (1-byte form)
      if (bsCode == 6) w.bits(bs - 1, 8)
      else if (bsCode == 7) w.bits(bs - 1, 16)
      w.bits(0, 8)                     // header CRC-8 (unchecked)
      stored.zipWithIndex.foreach { case (chS, ci) =>
        val sideBit = chAsgn match {
          case 8 | 10 => if (ci == 1) 1 else 0
          case 9 => if (ci == 0) 1 else 0
          case _ => 0
        }
        subframe(w, chS, bps + sideBit, mode(fi, ci), wasted)
      }
      w.align()
      w.bits(0, 16) // frame CRC-16 (unchecked)
    }
    w.bytes
  }

  private def decode(b: Array[Byte]): Option[Vector[Double]] = {
    val out = Vector.newBuilder[Double]
    val n = Flac.walk(b, new Samples.Sink {
      def accept(x: Double): Unit = out += x
    })
    if (n < 0) None else Some(out.result())
  }

  private def norm(samples: Seq[Int]): Vector[Double] =
    samples.map(_ / 32768.0).toVector

  // deterministic small-amplitude walk: Rice-friendly residuals
  private def walkSamples(n: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    var x = 0
    Array.fill(n) { x += rnd.nextInt(101) - 50; x = math.max(-4000, math.min(4000, x)); x }
  }

  // ---- round trips --------------------------------------------------

  test("CONSTANT subframe decodes exactly (frame layout from raw hex)") {
    val s = Array.fill(192)(4096)
    assert(decode(flac(0, 16, Seq(Seq(s)), (_, _) => Const))
      .contains(norm(s.toSeq)))
  }

  test("VERBATIM round-trips arbitrary samples bit-exactly") {
    val s = Array(0, 1, -1, 32767, -32768, 12345, -12345, 7, -8, 100,
      -100, 255, -256, 9999, -9999, 3)
    assert(decode(flac(0, 16, Seq(Seq(s)))).contains(norm(s.toSeq)))
  }

  test("FIXED orders 0-4 with Rice residuals round-trip losslessly") {
    for (order <- 0 to 4) {
      val s = walkSamples(64, 1000 + order)
      val got = decode(flac(0, 16, Seq(Seq(s)), (_, _) => Fix(order, 7)))
      assert(got.contains(norm(s.toSeq)), s"order $order")
    }
  }

  test("Rice partitions split the residual, first partition short") {
    val s = walkSamples(64, 5)
    // partition order 2: 4 partitions of 16, first has 16-2 residuals
    assert(decode(flac(0, 16, Seq(Seq(s)), (_, _) => Fix(2, 6, po = 2)))
      .contains(norm(s.toSeq)))
  }

  test("escape partitions carry raw fixed-width residuals") {
    val s = walkSamples(32, 9).map(_ >> 4) // fits 13-bit raw residuals
    assert(decode(flac(0, 16, Seq(Seq(s)), (_, _) => Escape(13)))
      .contains(norm(s.toSeq)))
  }

  test("LPC subframe round-trips losslessly") {
    val s = walkSamples(96, 7)
    // second-order predictor 2·s[i-1] − s[i-2] at shift 0, and a
    // fractional one (3·s[i-1] − 1·s[i-2]) >> 1
    for (lpc <- Seq(Lpc(Seq(2, -1), 0, 5, 8), Lpc(Seq(3, -1), 1, 5, 8)))
      assert(decode(flac(0, 16, Seq(Seq(s)), (_, _) => lpc))
        .contains(norm(s.toSeq)), lpc)
  }

  test("wasted bits restore the scaled samples") {
    val s = walkSamples(48, 11).map(_ & ~3) // low 2 bits zero
    assert(decode(flac(0, 16, Seq(Seq(s)), wasted = 2))
      .contains(norm(s.toSeq)))
  }

  test("stereo decorrelation modes all reconstruct the same downmix") {
    val l = walkSamples(64, 21)
    val r = walkSamples(64, 22)
    val side = l.indices.map(i => l(i) - r(i)).toArray
    val mid = l.indices.map(i => (l(i) + r(i)) >> 1).toArray
    val expected =
      l.indices.map(i => (l(i) + r(i)) / 2.0 / 32768.0).toVector
    val plain = flac(1, 16, Seq(Seq(l, r)))
    val leftSide = flac(8, 16, Seq(Seq(l, side)))
    val sideRight = flac(9, 16, Seq(Seq(side, r)))
    val midSide = flac(10, 16, Seq(Seq(mid, side)))
    for ((b, name) <- Seq((plain, "independent"), (leftSide, "left/side"),
        (sideRight, "right/side"), (midSide, "mid/side")))
      assert(decode(b).contains(expected), name)
  }

  test("multi-frame streams accumulate; truncation keeps the prefix") {
    val f1 = walkSamples(192, 31)
    val f2 = walkSamples(192, 32)
    val full = flac(0, 16, Seq(Seq(f1), Seq(f2)))
    assert(decode(full).contains(norm(f1.toSeq) ++ norm(f2.toSeq)))
    // cut mid-way through frame 2: frame 1 survives
    val cut = full.take(full.length - 60)
    assert(decode(cut).contains(norm(f1.toSeq)))
    // header-only with declared samples: truncated → not decodable
    val headerOnly = flac(0, 16, Seq.empty, totalOverride = 384)
    assert(decode(headerOnly).isEmpty)
    // header-only with zero declared samples: legitimately empty
    assert(decode(flac(0, 16, Seq.empty)).contains(Vector.empty))
  }

  test("32-bit stereo side channels decode (33-bit side width)") {
    val l = walkSamples(48, 61)
    val r = walkSamples(48, 62)
    val side = l.indices.map(i => l(i) - r(i)).toArray
    val expected =
      l.indices.map(i => (l(i) + r(i)) / 2.0 / 2147483648.0).toVector
    assert(decode(flac(8, 32, Seq(Seq(l, side)))).contains(expected))
  }

  test("decompression bomb: decoded output is capped, linear in input") {
    // back-to-back 65535-sample CONSTANT frames (~14 bytes each) with
    // unknown totalSamples: ~5000 samples/byte amplification must stop
    // at the 4096/byte cap, keeping the decoded prefix
    val silent = new Array[Int](65535)
    val bomb = flac(0, 16, Seq.fill(300)(Seq(silent)),
      (_, _) => Const, totalOverride = 0)
    val got = decode(bomb).get
    assert(got.nonEmpty && got.length < 300 * 65535)
    assert(got.length <= 4096L * bomb.length + 65535)
  }

  test("junk, non-FLAC, and mutated streams never throw") {
    val base = flac(0, 16, Seq(Seq(walkSamples(64, 41))))
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 200) {
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decode(m) // any outcome, no throw
    }
    for (len <- 0 until base.length by 7) decode(base.take(len))
    assert(decode("not flac at all".getBytes("US-ASCII")).isEmpty)
  }

  // ---- through the public API --------------------------------------

  test("FLAC features and embedding equal the same samples' WAV twin") {
    import spark.implicits._
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val s = walkSamples(256, 77)
    val data = s.flatMap(le16(_).toSeq)
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val fl = flac(0, 16, Seq(Seq(s)), (_, _) => Fix(2, 7))
    val rows = Seq((1L, wav), (2L, fl)).toDF("id", "content")
      .select(F.col("id"),
        Multimodal.audioFeatures(F.col("content")).as("f"),
        Multimodal.audioEmbedding(F.col("content"), 8).as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getStruct(1), r.getSeq[Float](2))))
      .toMap
    assert(rows(1L)._1 == rows(2L)._1) // features bit-identical
    assert(rows(1L)._2 == rows(2L)._2) // band embedding bit-identical
  }
}
