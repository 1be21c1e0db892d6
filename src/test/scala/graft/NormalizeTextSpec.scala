package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.NormalizeText
import graft.pipeline.{Curation, TextAnalysis}

/** Unicode normalization ([[graft.expressions.NormalizeText]]): parity
  * with an independent regex-pipeline reference, the documented edge
  * contract, idempotence, SQL registration, and the curation `normalize`
  * stage collapsing byte-level variants into one dedup digest. */
class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String): String =
    NormalizeText.normalize(UTF8String.fromString(s)).toString

  /** Independent reference: the oracle recipe (NFC, then map the space
    * class, then collapse, then trim) as Java regexes. */
  private def refNorm(s: String): String = {
    val nfc = java.text.Normalizer.normalize(
      s, java.text.Normalizer.Form.NFC)
    nfc.replaceAll("[\\x00-\\x1f\\x7f\\u0085\\u00a0\\u1680" +
        "\\u2000-\\u200b\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff]", " ")
      .replaceAll(" +", " ")
      .replaceAll("^ | $", "")
  }

  test("one-pass fold equals the regex-pipeline reference") {
    val cases = Seq(
      "",
      "   ",
      "plain ascii text",
      "  leading and trailing  ",
      "tabs\tand\nnewlines\r\nandvertical",
      "é composes to é",       // NFC: decomposed -> composed
      "Å ring composes to Å",
      "nb sp em space thin space ideo　space",
      "zero​width and bom﻿ markers",
      "ctrlbell del nel ls  ps ",
      "mixed \t     runs collapse",
      "héllo already composed",
      "😀 surrogate pairs pass through 🎉")
    for (c <- cases) assert(norm(c) == refNorm(c), s"case: ${c.take(40)}")
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      // random BMP chars below the surrogate range, spanning the mapped
      // classes, combining marks, and ordinary letters
      val s = Seq.fill(rnd.nextInt(30))(rnd.nextInt(0x3200).toChar).mkString
      assert(norm(s) == refNorm(s), s"random: ${s.map(_.toInt)}")
    }
  }

  test("normalization is idempotent and canonicalizes variants together") {
    val variants = Seq(
      "the  quick\tbrown fox",
      "the quick brown fox",
      " the quick brown fox​ ",
      "the quick brown fox")
    val normed = variants.map(norm)
    assert(normed.toSet == Set("the quick brown fox"))
    for (v <- variants) assert(norm(norm(v)) == norm(v))
    // NFC variants of the same word unify too
    assert(norm("café") == norm("café"))
  }

  test("SQL function normalize_text is registered; NULL passes through") {
    import spark.implicits._
    val df = Seq(Some("  a  b  "), None).toDF("t")
    df.createOrReplaceTempView("norm_t")
    val got = spark.sql("SELECT normalize_text(t) FROM norm_t")
      .as[Option[String]].collect().toSet
    assert(got == Set(Some("a b"), None))
    val api = df.select(TextAnalysis.normalizeText(F.col("t")))
      .as[Option[String]].collect().toSet
    assert(api == got)
  }

  test("curate(normalize = true) collapses whitespace-variant duplicates") {
    import spark.implicits._
    val text = "good clean training text with enough words to pass " +
      "the quality gate and some more filler content here"
    val docs = Seq(
      (1L, text),
      (2L, text.replace(" training ", "  training ")), // variant
      (3L, "another good clean document with enough words to pass the " +
        "quality gate and different content entirely")).toDF("doc_id", "text")
    val kept = Curation.curate(docs, "doc_id", "text",
        minQuality = 0.0, langs = Seq("en"), chunkSize = 1000,
        chunkStride = 1000, normalize = true)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // 2's digest equals 1's only after normalize
    val keptRaw = Curation.curate(docs, "doc_id", "text",
        minQuality = 0.0, langs = Seq("en"), chunkSize = 1000,
        chunkStride = 1000)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(keptRaw == Set(1L, 2L, 3L)) // without it they stay distinct
  }
}
