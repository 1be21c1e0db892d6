package graft

import org.apache.spark.sql.{functions => F}

import graft.expressions.AudioHash
import graft.pipeline.Dedup

/** Perceptual audio hash ([[graft.expressions.AudioHash]]) and the
  * banded near-dup pairs on it: independent-reference parity, the
  * volume-invariance property the construction promises, the null
  * contract, and banded == brute-force truth. */
class AudioHashSpec extends SparkSpec {

  private val rnd = new scala.util.Random(91)

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)

  /** 16-bit PCM mono WAV with the given raw sample values. */
  private def pcmWav(samples: Seq[Int]): Array[Byte] = {
    val data = samples.flatMap(le16(_).toSeq).toArray
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Independent reference from the definition: 65 index windows, mean
    * |sample| gradient signs, exact integers. */
  private def refHash(samples: Seq[Int]): Long = {
    val n = samples.length
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    samples.zipWithIndex.foreach { case (v, i) =>
      val w = (i.toLong * 65 / n).toInt
      sums(w) += math.abs(v.toLong)
      cnts(w) += 1
    }
    (0 until 64).foldLeft(0L) { (acc, k) =>
      if (BigInt(sums(k)) * cnts(k + 1) > BigInt(sums(k + 1)) * cnts(k))
        acc | (1L << k)
      else acc
    }
  }

  private def randSamples(n: Int): Seq[Int] =
    Seq.fill(n)(rnd.nextInt(30000) - 15000)

  test("native hash equals the independent reference on random clips") {
    for (_ <- 1 to 25) {
      val s = randSamples(65 + rnd.nextInt(400))
      assert(AudioHash.hash(pcmWav(s)) == refHash(s))
    }
  }

  test("volume scaling flips no bits; re-trimming a tail flips few") {
    // a clip with a SMOOTH loudness envelope (the signal class the
    // envelope hash is for — white noise has a flat envelope and every
    // comparison is a coin flip): two slow swells with a quiet tone
    val s = (0 until 650).map(i =>
      (math.sin(i * 0.0097) * 12000).toInt + ((i % 7) - 3) * 40)
    val base = AudioHash.hash(pcmWav(s)).longValue
    // halving every sample scales both sides of every comparison
    assert(AudioHash.hash(pcmWav(s.map(_ / 2))).longValue == base)
    // dropping a short tail shifts window boundaries slightly; the
    // smooth envelope keeps most gradient signs decisive
    val trimmed = AudioHash.hash(pcmWav(s.dropRight(6))).longValue
    assert(java.lang.Long.bitCount(base ^ trimmed) <= 10)
    // an unrelated clip lands far away
    val other = AudioHash.hash(pcmWav(randSamples(650))).longValue
    assert(java.lang.Long.bitCount(base ^ other) >= 16)
  }

  test("undecodable and sub-65-sample input hash to null") {
    assert(AudioHash.hash("not audio".getBytes) == null)
    assert(AudioHash.hash(pcmWav(randSamples(64))) == null)
    assert(AudioHash.hash(pcmWav(randSamples(65))) != null)
  }

  test("audioNearDupPairs equals brute-force all-pairs ground truth") {
    import spark.implicits._
    // 6 clusters of 5: shared base clip per cluster, small per-member
    // perturbation on a few samples
    val rows = (0L until 30L).map { id =>
      val cr = new scala.util.Random((id % 6).toInt)
      val base = Seq.fill(260)(cr.nextInt(30000) - 15000).toArray
      val m = (id / 6).toInt
      for (k <- 0 until m) base(k * 37 % 260) += 900
      (id, pcmWav(base.toSeq))
    } :+ ((40L, "junk".getBytes.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("doc_id", "media")
    val got = Dedup.audioNearDupPairs(df, "doc_id", "media", maxBits = 8)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val hashes = rows.collect {
      case (id, bytes) if AudioHash.hash(bytes) != null =>
        id -> AudioHash.hash(bytes).longValue
    }
    val want = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 8
    } yield (i1, i2, d)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("SQL function audio_hash is registered and matches the API") {
    import spark.implicits._
    val s = randSamples(130)
    val df = Seq(Tuple1(pcmWav(s))).toDF("media")
    df.createOrReplaceTempView("audiohash_t")
    val viaSql = spark.sql("SELECT audio_hash(media) FROM audiohash_t")
      .as[Long].head()
    assert(viaSql == refHash(s))
    val viaApi = df.select(
        graft.pipeline.Multimodal.audioHash(F.col("media")))
      .as[Long].head()
    assert(viaApi == viaSql)
  }
}
