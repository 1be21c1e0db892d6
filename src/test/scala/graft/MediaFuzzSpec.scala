package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions._

/** Poison-row fuzz for every media parser/decoder: random bytes and
  * bit-flipped mutations of valid headers must return null (or a value)
  * — never throw. A 100 TB crawl corpus is full of truncated and
  * corrupt files, and one poison row must not kill a task (the review
  * of the RIFF walkers found exactly this class of bug: crafted chunk
  * sizes overflowing an Int walk offset into a negative array index).
  * Direct static calls — no Spark session, so the corpus can be large. */
class MediaFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7116L)

  private def parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    "HtmlText" -> ((b: Array[Byte]) => HtmlText.extract(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(b))),
    "Gunzip" -> (Gunzip.inflate(_)),
    "AudioFeatures" -> (AudioFeatures.parse(_)),
    "AudioHeaderMeta" -> (AudioHeaderMeta.parse(_)),
    "VideoHeaderMeta" -> (VideoHeaderMeta.parse(_)),
    "VideoFeatures" -> (VideoFeatures.parse(_)),
    "ImageHeaderMeta" -> (ImageHeaderMeta.parse(_)),
    "ImageFeatures" -> (ImageFeatures.parse(_)),
    "DecodeImage" -> (DecodeImage.parse(_)),
    "ImageHashA" -> (ImageHash.hash(_, dhash = false)),
    "ImageHashD" -> (ImageHash.hash(_, dhash = true)),
    "AudioHash" -> (AudioHash.hash(_)),
    "ImageEmbedding" -> (ImageEmbedding.embed(_, 8)),
    "AudioEmbedding" -> (AudioEmbedding.embed(_, 8)),
    "ResizeImage" -> (ResizeImage.resize(_, 16)),
    "WarcRecords" -> (WarcRecords.parse(_)),
    "HttpMessage" -> (HttpMessage.parse(_)),
    "Unzstd" -> (Unzstd.decompress(_)),
    "Unlz4" -> (Unlz4.decompress(_)),
    "Unsnappy" -> (Unsnappy.decompress(_)),
    "VideoHash" -> (VideoHash.hash(_)),
    "CdcChunks" -> (CdcChunks.split(_, 8)),
    "PdfMeta" -> (PdfMeta.parse(_)),
    "ZipEntries" -> (ZipOps.entries(_)),
    "ZipEntry" -> (ZipOps.entryBytes(_, "x")),
    "HtmlLinks" -> ((b: Array[Byte]) => HtmlLinks.extract(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(b))),
    "HtmlAnchors" -> ((b: Array[Byte]) => HtmlAnchors.extract(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(b))))

  private def assertNoThrow(tag: String, bytes: Array[Byte]): Unit =
    parsers.foreach { case (name, p) =>
      try p(bytes)
      catch {
        case e: Throwable => fail(
          s"$name threw on $tag input (${bytes.length} bytes): $e")
      }
    }

  test("random bytes never throw from any media parser") {
    for (i <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(96))
      rnd.nextBytes(b)
      assertNoThrow(s"random#$i", b)
    }
  }

  test("absurd-dimension headers triage to null and never reach a raster allocation") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // a ~100-byte PNG whose IHDR declares 46000×46000 (≈ 8.5 GB raster):
    // triage reports the declared dims (plausible header — that's how a
    // filter drops it), but decode/resize must return null from the
    // header-only pixel-count gate, never attempting the allocation
    val huge = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "0000B3B0" + "0000B3B0" + "0802000000" + "00000000" +
      "0000000F" + "49444154" + "7801" + "010400FBFF" + "000A141E" +
      "0068003D" + "E80CBB83" + "0000000049454E44AE426082")
    assert(ImageHeaderMeta.parseDims(huge) == ("image/png", 46000, 46000))
    assert(DecodeImage.parse(huge) == null)
    assert(ResizeImage.resize(huge, 16) == null)
    // beyond the per-side sanity bound (2^21 > 2^20): triage rejects too
    val absurd = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00200000" + "00200000" + "0802000000" + "00000000" +
      "0000000F" + "49444154" + "7801" + "010400FBFF" + "000A141E" +
      "0068003D" + "E80CBB83" + "0000000049454E44AE426082")
    assert(ImageHeaderMeta.parse(absurd) == null)
    assert(DecodeImage.parse(absurd) == null)
    // GIF logical screen maxes at 65535×65535 — accepted (within bound)
    val gifMax = "GIF89a".getBytes("US-ASCII") ++
      hexBytes("FFFFFFFF00FF")
    val m = ImageHeaderMeta.parseDims(gifMax)
    assert(m == ("image/gif", 65535, 65535))
  }

  test("mutated valid headers never throw from any media parser") {
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // valid seeds: WAV (PCM), AVI avih, PNG (real 1×1), BMP 2×2, GIF
    val seeds = Seq(
      hexBytes("52494646" + "64000000" + "57415645" +
        "666D7420" + "10000000" + "0100" + "0100" + "401F0000" +
        "401F0000" + "0100" + "0800" + "64617461" + "40000000" +
        "80" * 64),
      hexBytes("52494646" + "50000000" + "41564920" +
        "4C495354" + "44000000" + "6864726C" + "61766968" + "38000000" +
        "409C0000" + "00000000" * 3 + "FA000000" + "00000000" +
        "01000000" + "00000000" + "40010000" + "F0000000" + "00" * 16),
      hexBytes("89504E470D0A1A0A" + "0000000D" +
        "494844520000000100000001" + "0802000000" + "907753DE" +
        "0000000F" + "49444154" + "7801" + "010400FBFF" + "000A141E" +
        "0068003D" + "E80CBB83" + "0000000049454E44AE426082"),
      hexBytes("424D" + "46000000" + "00000000" + "36000000" +
        "28000000" + "02000000" + "02000000" + "0100" + "1800" +
        "00000000" + "10000000" + "00000000" * 4 +
        "0A141E" * 2 + "0000" + "0A141E" * 2 + "0000"),
      "GIF89a".getBytes("US-ASCII") ++ hexBytes("0300050000FF"),
      // WebP VP8L, MP3 (MPEG1 L3 + ID3v2), Ogg Vorbis BOS, float WAV,
      // FLAC with one CONSTANT frame
      hexBytes("52494646" + "12000000" + "57454250" +
        "5650384C" + "05000000" + "2F" + "63804A02" + "00"),
      hexBytes("494433" + "0400" + "00" + "00000000" +
        "FFFB" + "9000" + "0000" + "00" * 32),
      hexBytes("4F676753" + "00" + "02" + "00" * 8 + "07000000" +
        "00000000" + "00000000" + "01" + "1E" +
        "01" + "766F72626973" + "00000000" + "02" + "44AC0000" +
        "00" * 12 + "B8" + "01"),
      hexBytes("52494646" + "34000000" + "57415645" +
        "666D7420" + "10000000" + "0300" + "0100" + "401F0000" +
        "007D0000" + "0400" + "2000" + "64617461" + "10000000" +
        "0000003F" * 4),
      hexBytes("664C6143" + "80" + "000022" + "00C0" + "00C0" +
        "000000" + "000000" + "01F400F0" + "000000C0" + "00" * 16 +
        "FFF8" + "10" + "08" + "00" + "00" + "00" + "1000" + "0000"),
      // AAC ADTS (two 23-byte frames) and Ogg Opus (OpusHead BOS + EOS)
      hexBytes("FFF15080" + "02E000" + "00" * 16 +
        "FFF15080" + "02E000" + "00" * 16),
      hexBytes("4F676753" + "00" + "02" + "00" * 8 + "07000000" +
        "00000000" + "00000000" + "01" + "13" +
        "4F70757348656164" + "01" + "02" + "3801" + "80BB0000" + "0000" + "00" +
        "4F676753" + "00" + "04" + "E02E000000000000" + "07000000" +
        "01000000" + "00000000" + "00"),
      // WebM (EBML header + Segment/Info/Tracks) and MP4 (ftyp + moov)
      hexBytes("1A45DFA3874282847765626D18538067A71549A9668E2AD7B183" +
        "0F4240448984463B80001654AE6B8FAE8D838101E088B0820500BA8202D0"),
      hexBytes("000000186674797069736F6D0000020069736F6D69736F32" +
        "000001086D6F6F760000006C6D766864" + "00" * 12 + "000003E8" +
        "00002710" + "00" * 80 + "000000947472616B0000005C746B6864" +
        "00" * 12 + "00000001" + "00" * 60 + "0280000001680000" +
        "000000306D646961000000286D696E66000000207374626C" +
        "0000001873747473" + "00000000" + "00000001" + "000000FA" +
        "00000064"),
      // WARC two-record segment and a chunked HTTP response
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://a/x\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n" +
        "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
        .getBytes("UTF-8"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" +
        "6\r\nchunk1\r\nB;x=1\r\n and chunk2\r\n0\r\nX-T: t\r\n\r\n")
        .getBytes("UTF-8"),
      // zstd raw-block frame: magic, FHD, window, block header, body
      hexBytes("28B52FFD" + "00" + "00" + "510000") ++
        "hello zstd".getBytes("UTF-8"))
    for (seed <- seeds; i <- 0 until 120) {
      val b = seed.clone()
      // flip 1-4 random bytes (sizes, tags, payload — anything)
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      assertNoThrow(s"mutated#$i", b)
      // and truncate at a random point
      assertNoThrow(s"truncated#$i", b.take(rnd.nextInt(b.length + 1)))
    }
  }
}
