package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.{Relevance, TextAnalysis}

/** Corpus-level curation operators: CCNet-style line dedup, URL
  * canonicalization/dedup, BM25 relevance, unigram-LM NLL, and
  * target-mixture resampling. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ dedupLines

  test("dedupLines keeps each line's first (id, position) occurrence only") {
    val docs = Seq(
      (1L, "alpha\nshared\nbeta"),
      (2L, "shared\ngamma"),
      (3L, "gamma\nshared\ndelta\ndelta")).toDF("id", "text")
    val out = TextAnalysis.dedupLines(docs, "id", "text")
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha\nshared\nbeta") // first doc keeps everything
    assert(out(2L) == "gamma")               // lost 'shared' to doc 1
    // lost 'gamma' to doc 2 and 'shared' to doc 1; intra-doc repeat of
    // 'delta' keeps only its first position
    assert(out(3L) == "delta")
  }

  test("dedupLines: a doc losing every line survives with empty text") {
    val docs = Seq((1L, "x\ny"), (2L, "x\ny")).toDF("id", "text")
    val out = TextAnalysis.dedupLines(docs, "id", "text")
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "x\ny" && out(2L) == "")
  }

  // ------------------------------------------------------------ c4Filter

  test("c4Filter: line rules — terminal punct, 5 words, javascript") {
    val docs = Seq(
      (1L, "This first sentence is long enough to keep.\n" + // kept
        "Too short.\n" +                                     // < 5 words
        "This line has no terminal punctuation at all\n" +   // no punct
        "Please enable javascript to view this content.\n" + // javascript
        "A second proper sentence closes with a bang!\n" +   // kept (!)
        "He said \"the quote rule also terminates lines\"")  // kept (")
    ).toDF("id", "text")
    val out = TextAnalysis.c4Filter(docs, "id", "text")
      .select("id", "clean_text", "n_kept_lines")
      .as[(Long, String, Long)].collect()
    assert(out.length == 1)
    assert(out.head._3 == 3L)
    assert(out.head._2 ==
      "This first sentence is long enough to keep.\n" +
      "A second proper sentence closes with a bang!\n" +
      "He said \"the quote rule also terminates lines\"")
  }

  test("c4Filter: page rules — lorem ipsum, curly brace, 3-line floor") {
    val good = "One valid sentence stands right here.\n" +
      "Two valid sentences stand right here.\n" +
      "Three valid sentences stand right here."
    val docs = Seq(
      (1L, good),
      (2L, good + "\nLorem Ipsum dolor sit amet text included."), // dropped
      (3L, good + "\nif (x) { return; }"),                        // dropped
      (4L, "Only two sentences survive in this document.\n" +
        "The second one is also long enough here.")               // < 3 kept
    ).toDF("id", "text")
    val kept = TextAnalysis.c4Filter(docs, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  // -------------------------------------------------------- gopherQuality

  /** Independent driver-side recomputation of the Gopher Table-A1
    * statistics (same word = space token / line = non-blank definitions
    * as the column recipe, written from the paper, not from the code). */
  private def gopherRef(text: String):
      (Long, Double, Double, Double, Double, Double, Long, Boolean) = {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val words = text.split(" ", -1).filter(_.nonEmpty)
    val n = words.length.toLong
    val meanLen = if (n > 0) r6(words.map(_.length.toLong).sum.toDouble / n) else 0.0
    val sym = "#|\\.\\.\\.|…".r.findAllIn(text).size
    val symR = if (n > 0) r6(sym.toDouble / n) else 0.0
    val lines = text.split("\n", -1).filter(_.trim.nonEmpty)
    val nl = lines.length
    val bullet = if (nl > 0) r6(lines.count(l =>
      "^[•*-]".r.findFirstIn(l.replaceAll("^ +", "")).isDefined).toDouble / nl)
      else 0.0
    val ell = if (nl > 0) r6(lines.count(l =>
      "(\\.\\.\\.|…)$".r.findFirstIn(l.replaceAll(" +$", "")).isDefined)
      .toDouble / nl) else 0.0
    val alpha = if (n > 0) r6(words.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / n) else 0.0
    val hits = TextAnalysis.gopherStopwords
      .count(sw => words.map(_.toLowerCase).contains(sw)).toLong
    val passes = n >= 50 && n <= 100000 && meanLen >= 3.0 && meanLen <= 10.0 &&
      symR <= 0.1 && bullet <= 0.9 && ell <= 0.3 && alpha >= 0.8 && hits >= 2
    (n, meanLen, symR, bullet, ell, alpha, hits, passes)
  }

  test("gopherQuality matches an independent recomputation on crafted docs") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the of and that have quality with teeth."
    val docs = Seq(
      1L -> "the quick brown fox jumps #\n• bullet line here\nto be continued ...",
      2L -> base,                                            // clean: passes
      3L -> (base + "\n" + (1 to 20).map(i => s"• item $i").mkString("\n")),
      4L -> (base + " " + (1 to 20).map(_ => "#").mkString(" ")),
      5L -> (base + "\n" + (1 to 9).map(_ => "trailing off ...").mkString("\n")),
      6L -> "", 7L -> "   \n  \n ")
    val got = docs.toDF("id", "text")
      .select(F.col("id"), TextAnalysis.gopherQuality(F.col("text")).as("g"))
      .select("id", "g.n_words", "g.mean_word_len", "g.symbol_word_ratio",
        "g.bullet_line_frac", "g.ellipsis_line_frac", "g.alpha_word_frac",
        "g.stopword_hits", "g.passes")
      .as[(Long, Long, Double, Double, Double, Double, Double, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8,
        r._9)).toMap
    for ((id, text) <- docs)
      assert(got(id) == gopherRef(text), s"doc $id")
    // and the rule variety actually fires: 2 passes, the others fail
    assert(got(2L)._8)
    assert(Seq(1L, 3L, 4L, 5L, 6L).forall(id => !got(id)._8))
  }

  // ----------------------------------------------------- gopherRepetition

  /** Independent driver-side recomputation of the Gopher Table-A1
    * repetition statistics (written from the paper's definitions and
    * this library's documented tie/coverage choices, not from the
    * column recipe). */
  private def gopherRepRef(text: String): Seq[Double] = {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def unitStats(units: Seq[String]): (Double, Double) = {
      val counts = units.groupBy(identity).map { case (k, v) => k -> v.size }
      val dup = units.filter(u => counts(u) > 1)
      (if (units.nonEmpty) r6(dup.size.toDouble / units.size) else 0.0,
        if (units.map(_.length).sum > 0)
          r6(dup.map(_.length.toLong).sum.toDouble / units.map(_.length.toLong).sum)
        else 0.0)
    }
    val words = text.split(" ", -1).filter(_.nonEmpty)
    def grams(n: Int): Seq[String] =
      if (words.length >= n) words.sliding(n).map(_.mkString(" ")).toSeq
      else Seq.empty
    def top(n: Int): Double = {
      val g = grams(n)
      if (g.isEmpty || text.isEmpty) 0.0
      else {
        val counts = g.groupBy(identity).map { case (k, v) => k -> v.size }
        val best = counts.values.max
        val str = counts.filter(_._2 == best).keys.min
        r6(best.toLong * str.length.toDouble / text.length)
      }
    }
    def dupN(n: Int): Double = {
      val g = grams(n)
      val counts = g.groupBy(identity).map { case (k, v) => k -> v.size }
      val tot = words.map(_.length.toLong).sum
      if (tot == 0) 0.0
      else {
        val covered = words.indices.filter(j =>
          (math.max(0, j - n + 1) to math.min(j, words.length - n))
            .exists(i => i >= 0 && i < g.length && counts(g(i)) > 1))
        r6(covered.map(words(_).length.toLong).sum.toDouble / tot)
      }
    }
    val (dlf, dlcf) = unitStats(text.split("\n", -1).filter(_.nonEmpty).toSeq)
    val (dpf, dpcf) = unitStats(text.split("\n\n", -1).filter(_.nonEmpty).toSeq)
    Seq(dlf, dlcf, dpf, dpcf, top(2), top(3), top(4),
      dupN(5), dupN(6), dupN(7), dupN(8), dupN(9), dupN(10))
  }

  test("gopherRepetition matches an independent recomputation") {
    val rep9 = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      // all-distinct words, long enough that even the count-1 top grams
      // stay under their char-fraction thresholds
      1L -> (1 to 80).map(i => s"w$i").mkString(" "),
      2L -> (rep9 + " and then " + rep9 + " again closes it"), // dup 5..9-gram
      3L -> "data data data data data data and some other words", // top n-gram
      4L -> "alpha beta\nrepeat me\nrepeat me\ngamma delta",      // dup lines
      5L -> ("first paragraph here\n\nsecond paragraph text\n\n" +
        "second paragraph text"),                                 // dup paras
      6L -> "", 7L -> "one two")
    val got = docs.toDF("id", "text")
      .select(F.col("id"),
        TextAnalysis.gopherRepetition(F.col("text")).as("g"))
      .select("id", "g.*")
      .collect().map(r => r.getLong(0) ->
        (1 to 13).map(i => r.getDouble(i)).toSeq).toMap
    for ((id, text) <- docs)
      assert(got(id) == gopherRepRef(text), s"doc $id")
    // and the planted shapes actually trip their rules
    val byId = docs.toDF("id", "text")
      .select(F.col("id"),
        TextAnalysis.gopherRepetition(F.col("text")).getField("passes"))
      .as[(Long, Boolean)].collect().toMap
    assert(byId(1L) && byId(6L))
    // 7L: a 2-word doc's single 2-gram covers ALL its characters — the
    // top-gram statistic counts the most frequent gram even at count 1
    assert(Seq(2L, 3L, 4L, 5L, 7L).forall(id => !byId(id)))
  }

  test("gopherRepetition top-gram tie breaks to the smallest gram") {
    // "b b" and "a a" both occur twice; the smaller string wins
    val text = "b b x b b y a a z a a"
    val top2 = Seq(text).toDF("text")
      .select(TextAnalysis.topNgramCharFrac(F.col("text"), 2))
      .as[Double].collect().head
    // count 2 · len("a a")=3 / len(text)=21
    assert(top2 == BigDecimal(2.0 * 3 / 21)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("gopherRepetition is bounded on a 50k-word highly-duplicated doc") {
    // The straggler case from the r14 audit: a pathological document
    // where every 5..10-gram is duplicated, so coverage ≈ W for every
    // n. A recipe that looks positions up inside a fold re-evaluates a
    // whole-document transform per element — O(W²) per n, ~1.5·10¹⁰
    // element evaluations here, hours on one executor thread. The
    // argument-to-argument coverage recipe is O(n·W log W); the bound
    // is loose (box noise) but the quadratic shape misses it by orders
    // of magnitude.
    val text = Array.tabulate(50000)(i => s"tok${i % 37}").mkString(" ")
    val t0 = System.nanoTime()
    val row = Seq(text).toDF("text")
      .select(TextAnalysis.gopherRepetition(F.col("text")).as("g"))
      .select("g.*").collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    // period 37 → every 5..10-gram occurs ~1350×: full char coverage
    assert(row.getDouble(7) == 1.0 && row.getDouble(12) == 1.0, row)
    assert(secs < 60.0,
      f"gopherRepetition took $secs%.1f s on the straggler document")
  }

  test("c4SpanDedup is bounded on a 50k-line highly-duplicated doc") {
    // straggler-audit class: the span builder must slice a BOUND
    // attribute, not the split expression — the capture re-splits the
    // whole document per span, O(lines · text) ≈ 10¹⁰ chars here
    val text = Array.tabulate(50000)(i => s"line ${i % 7} text").mkString("\n")
    val t0 = System.nanoTime()
    val row = TextAnalysis.c4SpanDedup(
        Seq((1L, text)).toDF("id", "text"), "id", "text")
      .select("clean_text", "n_dropped_units").as[(String, Long)]
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    // 7 distinct lines, every later repetition's spans are duplicates:
    // only a prefix survives
    assert(row._2 > 49000, s"expected most lines dropped, got ${row._2}")
    assert(secs < 60.0, f"c4SpanDedup took $secs%.1f s on the straggler doc")
  }

  test("chunk is bounded on a 200k-token doc") {
    // same class: chunk slices must read the bound token attribute —
    // the capture re-tokenizes the 1.4 MB document per chunk
    val text = Array.tabulate(200000)(i => s"t${i % 31}").mkString(" ")
    val t0 = System.nanoTime()
    val n = TextAnalysis.chunk(Seq((1L, text)).toDF("id", "text"),
      "id", "text", 64, 64).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 3125, s"expected 3125 chunks, got $n")
    assert(secs < 60.0, f"chunk took $secs%.1f s on the 200k-token doc")
  }

  // ----------------------------------------------------------- sentences

  test("sentences: terminators, attached quotes, tails, degenerate runs") {
    def seg(text: String): Seq[String] =
      Seq(text).toDF("t").select(TextAnalysis.sentences(F.col("t")))
        .as[Seq[String]].collect().head
    assert(seg("One. Two! Three?") == Seq("One.", "Two!", "Three?"))
    assert(seg("He said \"stop\". Then left.") ==
      Seq("He said \"stop\".", "Then left."))
    assert(seg("\"A quoted end.\" Next") == Seq("\"A quoted end.\"", "Next"))
    assert(seg("Wait... what?") == Seq("Wait...", "what?"))
    assert(seg("no terminator at all") == Seq("no terminator at all"))
    assert(seg("") == Seq.empty)
    assert(seg("...") == Seq.empty)            // documented: no non-terminator lead
    assert(seg("...but then text.") == Seq("but then text."))
  }

  // ------------------------------------------------------ finewebQuality

  test("finewebQuality: each rule trips on its planted shape") {
    val docs = Seq(
      1L -> ("Good line one is long enough to pass easily.\n" +
        "Good line two is also long enough to pass."),
      2L -> ("One fine long sentence ends with a period here.\n" +
        "A1.\nB2!\nC3?\nD4."),                               // short lines
      3L -> ("This duplicated boilerplate line is long enough.\n" +
        "This duplicated boilerplate line is long enough.\n" +
        "A different long closing line also ends properly."), // dup chars
      4L -> (("Only this very first line terminates with punctuation." +:
        (1 to 9).map(i =>
          s"unpunctuated filler line number $i with some padding"))
        .mkString("\n")),                                     // punct floor
      5L -> "")
    val got = docs.toDF("id", "text")
      .select(F.col("id"),
        TextAnalysis.finewebQuality(F.col("text")).as("g"))
      .select("id", "g.*")
      .as[(Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1L) == (1.0, 0.0, 0.0, true))
    assert(got(2L) == (1.0, 0.8, 0.0, false))           // 4/5 short
    val lines3 = docs.toMap.apply(3L).split("\n")
    val dup3 = BigDecimal(2.0 * lines3(0).length /
        lines3.map(_.length).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L) == (1.0, 0.0, dup3, false))          // 2 dup lines' chars
    assert(got(4L) == (0.1, 0.0, 0.0, false))           // 1/10 < 0.12
    assert(got(5L) == (0.0, 0.0, 0.0, false))           // empty: no lines
  }

  test("finewebQuality: apostrophe and quote count as terminal punctuation") {
    val got = Seq(
      1L -> "He finished with a quoted phrase like \"this\"",
      2L -> "And this line trails off with an apostrophe'",
      3L -> "But a colon is not terminal punctuation here:")
      .toDF("id", "text")
      .select(F.col("id"), TextAnalysis.finewebQuality(F.col("text"))
        .getField("line_punct_frac"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0 && got(3L) == 0.0)
  }

  // --------------------------------------------------------- c4SpanDedup

  test("c4SpanDedup: corpus-wide first span occurrence wins, losers drop") {
    val footer = "shared footer one\nshared footer two\nshared footer three"
    val docs = Seq(
      (3L, s"unique c line\n$footer"),
      (1L, s"unique a line\n$footer\nunique a tail"),
      (2L, s"unique b line\n$footer"))
    val out = TextAnalysis.c4SpanDedup(docs.toDF("id", "text"), "id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1 (smallest id) keeps the footer; docs 2 and 3 lose its 3 lines
    assert(out(1L) == (s"unique a line\n$footer\nunique a tail", 0L))
    assert(out(2L) == ("unique b line", 3L))
    assert(out(3L) == ("unique c line", 3L))
  }

  test("c4SpanDedup: within-document repetition keeps the first occurrence") {
    val block = "block line x\nblock line y\nblock line z"
    val docs = Seq((1L, s"head\n$block\nmid\n$block\ntail"))
    val out = TextAnalysis.c4SpanDedup(docs.toDF("id", "text"), "id", "text")
      .as[(Long, String, Long)].collect().head
    assert(out._2 == s"head\n$block\nmid\ntail" && out._3 == 3L)
  }

  test("c4SpanDedup: short docs have no spans and pass through; ties by position") {
    val docs = Seq(
      (1L, "just\ntwo"),                  // < 3 lines: no spans
      (2L, "a\nb\nc\na\nb\nc"))           // overlapping self-dup
    val out = TextAnalysis.c4SpanDedup(docs.toDF("id", "text"), "id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("just\ntwo", 0L))
    // spans: (a b c)@0 dup of @3 -> drop 3,4,5; (b c a)@1, (c a b)@2 unique
    assert(out(2L) == ("a\nb\nc", 3L))
  }

  // ------------------------------------------------------ canonicalizeUrl

  private def canon(u: String): String =
    Seq(u).toDF("u").select(TextAnalysis.canonicalizeUrl(F.col("u")))
      .as[String].head()

  test("canonicalizeUrl: case, www, default ports, fragment, slash") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b/#frag") ==
      "http://example.com/A/b")
    assert(canon("HTTPS://Example.COM:443/") == "https://example.com")
    // non-default port survives; path/query case preserved
    assert(canon("https://example.com:8080/Path?Q=V") ==
      "https://example.com:8080/Path?Q=V")
  }

  test("canonicalizeUrl: tracking params at every position") {
    assert(canon("https://x.com/p?utm_source=a&id=1") == "https://x.com/p?id=1")
    assert(canon("https://x.com/p?id=1&utm_source=a") == "https://x.com/p?id=1")
    assert(canon("https://x.com/p?a=1&gclid=g&b=2") == "https://x.com/p?a=1&b=2")
    assert(canon("https://x.com/p?utm_a=1&utm_b=2") == "https://x.com/p")
    assert(canon("https://x.com/p?fbclid=f") == "https://x.com/p")
    // utm-ish value inside another param's VALUE is untouched
    assert(canon("https://x.com/p?q=utm_source") == "https://x.com/p?q=utm_source")
  }

  test("urlDedup groups by canonical form with min-id keeper") {
    val docs = Seq(
      (10L, "http://www.a.com:80/x/"),
      (20L, "HTTP://A.com/x"),
      (30L, "http://a.com/y")).toDF("id", "url")
    val rows = TextAnalysis.urlDedup(docs, "id", "url")
      .select("id", "url_canon", "keep_id")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(10L) == (("http://a.com/x", 10L)))
    assert(rows(20L) == (("http://a.com/x", 10L)))
    assert(rows(30L) == (("http://a.com/y", 30L)))
  }

  // ------------------------------------------------------------------ bm25

  test("bm25 matches a hand-computed score on a tiny corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),
      (2L, "dog bird"),
      (3L, "fish fish fish")).toDF("id", "text")
    val out = Relevance.bm25(docs, "text", Seq("cat"), k1 = 1.2, b = 0.75)
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    // N=3, df=1, avgdl=8/3; idf = ln(1 + (3-1+0.5)/1.5) = ln(8/3)
    val idf = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5)
    val tf = 2.0; val dl = 3.0; val avgdl = 8.0 / 3.0
    val exp = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(out(1L) - exp) < 1e-6)
    assert(out(2L) == 0.0 && out(3L) == 0.0)
  }

  test("bm25 is higher for rarer matched terms (idf ordering)") {
    val docs = (1 to 20).map(i =>
      (i.toLong, if (i == 1) "rare common" else "common filler"))
      .toDF("id", "text")
    val out = Relevance.bm25(docs, "text", Seq("rare", "common"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L)) // doc 1 matches both; rare contributes more
  }

  // ------------------------------------------------------------ unigramNll

  test("unigramNll matches hand-computed add-one smoothed NLL") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c")).toDF("id", "text")
    // counts: a=3, b=1, c=1; total=5; vocab=4 (all in); denom=5+4+1=10
    val out = Relevance.unigramNll(docs, "id", "text", vocabSize = 4)
      .select("id", "nll").as[(Long, Double)].collect().toMap
    val lpA = math.log(4.0 / 10.0); val lpB = math.log(2.0 / 10.0)
    val lpC = math.log(2.0 / 10.0)
    assert(math.abs(out(1L) - (-(lpA + lpA + lpB) / 3.0)) < 1e-6)
    assert(math.abs(out(2L) - (-(lpA + lpC) / 2.0)) < 1e-6)
  }

  test("unigramNll: OOV tokens score below any in-vocab token") {
    val docs = Seq(
      (1L, "x x x x y"), // x dominates; y falls outside vocabSize=1
      (2L, "x x x x x")).toDF("id", "text")
    val out = Relevance.unigramNll(docs, "id", "text", vocabSize = 1)
      .select("id", "nll").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L)) // the OOV 'y' raises doc 1's NLL
  }

  test("unigramNll: empty document scores 0.0 with 0 tokens") {
    val docs = Seq((1L, ""), (2L, "a b")).toDF("id", "text")
    val out = Relevance.unigramNll(docs, "id", "text", vocabSize = 4)
      .select("id", "n_tokens", "nll").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L)._1 == 2L && out(2L)._2 > 0.0)
  }

  // ------------------------------------------------------------ dedupSpans

  test("spanHashes: distinct positional hashes equal the shingle set") {
    val texts = Seq("a b c d e f g", "x y x y x y", "one two three",
      "a a a a a", "p q r s t u v w")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(
      F.array_distinct(pipeline.Dedup.spanHashes(F.col("text"), 3)).as("sp"),
      pipeline.Dedup.shingleHashes(F.col("text"), 3).as("sh"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (sp, sh) => assert(sp == sh) }
  }

  test("spanHashes: short docs yield no windows (unlike shingle fallback)") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val n = df.select(F.size(pipeline.Dedup.spanHashes(F.col("text"), 3)))
      .as[Int].head()
    assert(n == 0)
  }

  test("dedupSpans cuts later occurrences of a shared span, keeps first") {
    val shared = "s1 s2 s3 s4 s5 s6" // 6 tokens, minLen 5 → starts 0,1
    val docs = Seq(
      (1L, s"$shared tail one two"),
      (2L, s"head $shared x y z"),
      (3L, "no overlap here at all")).toDF("id", "text")
    val out = pipeline.Dedup.dedupSpans(docs, "id", "text", minLen = 5)
      .select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == s"$shared tail one two")   // first host untouched
    assert(out(2L) == "head x y z")              // shared span excised
    assert(out(3L) == "no overlap here at all")
  }

  test("dedupSpans handles intra-doc repetition and the maxSpans cap") {
    // 'w1..w5' repeated 4 times: windows at every start are duplicated;
    // only the first copy's tokens survive
    val rep = (1 to 4).flatMap(_ => Seq("w1", "w2", "w3", "w4", "w5"))
      .mkString(" ")
    val docs = Seq((1L, rep)).toDF("id", "text")
    val out = pipeline.Dedup.dedupSpans(docs, "id", "text", minLen = 5)
      .select("clean_text").as[String].head()
    assert(out == "w1 w2 w3 w4 w5")
    // capped variant still returns and stays bounded
    val capped = pipeline.Dedup.dedupSpans(docs, "id", "text", minLen = 5,
      maxSpans = 2).select("clean_text").as[String].head()
    assert(capped.startsWith("w1 w2 w3 w4 w5"))
  }

  // ------------------------------------------------------------------ dsir

  test("dsirLogWeight ranks target-like documents above source-like") {
    val corpus = ((1 to 10).map(i => (i.toLong, "alpha beta gamma")) ++
      (11 to 20).map(i => (i.toLong, "delta epsilon zeta"))).toDF("id", "text")
    val target = Seq.fill(5)("alpha beta gamma").map(Tuple1(_)).toDF("text")
    val out = Relevance.dsirLogWeight(corpus, "id", "text", target, "text",
      buckets = 64).select("id", "dsir_logw").as[(Long, Double)]
      .collect().toMap
    assert(out(1L) > out(11L))
    assert(out(1L) > 0.0 && out(11L) < 0.0)
  }

  test("dsirSample is deterministic and prefers target-like docs") {
    val corpus = ((1 to 20).map(i => (i.toLong, "alpha beta gamma")) ++
      (21 to 40).map(i => (i.toLong, "delta epsilon zeta"))).toDF("id", "text")
    val target = Seq(Tuple1("alpha beta gamma")).toDF("text")
    def pick() = Relevance.dsirSample(corpus, "id", "text", target, "text",
      k = 10, buckets = 64, seed = 3L).select("id").as[Long].collect().toSeq
    val a = pick()
    assert(a == pick())                       // deterministic
    assert(a.count(_ <= 20L) >= 8, a.toString) // mostly target-like
  }

  // ------------------------------------------------------------ plan shape

  test("bm25 scoring is narrow: broadcast stats, zero scoring shuffles") {
    val docs = (1 to 100).map(i => (i.toLong, s"token doc $i")).toDF("id", "text")
    val plan = Relevance.bm25(docs, "text", Seq("token", "doc"))
      .queryExecution.executedPlan.toString
    // the only exchanges feed the 1-row stats aggregate + its broadcast;
    // no hashpartitioning on the corpus-sized scoring side
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("unigramNll scoring is a narrow fold: no shuffle in the scored plan") {
    val docs = (1 to 100).map(i => (i.toLong, s"token doc $i")).toDF("id", "text")
    val plan = Relevance.unigramNll(docs, "id", "text", vocabSize = 8)
      .queryExecution.executedPlan.toString
    // the model collapsed to a map literal at fit time; scoring never
    // exchanges
    assert(!plan.contains("Exchange"), plan)
  }

  test("resampleToMixture corpus pass is filter + broadcast join only") {
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) "x" else "y")).toDF("id", "src")
    val plan = TextAnalysis.resampleToMixture(docs, "id", "src",
      Map("x" -> 0.5, "y" -> 0.5)).queryExecution.executedPlan.toString
    // the corpus side never hash-exchanges; cuts arrive by broadcast
    val corpusExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the tiny counts aggregate is allowed its exchange; the corpus scan
    // side joins broadcast
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(corpusExchanges <= 2, plan)
  }

  // ------------------------------------------------------ resampleToMixture

  test("resampleToMixture hits the target recipe without upsampling") {
    // srcA huge, srcB the binding constraint, srcC dropped (no target)
    val docs = ((1 to 4000).map(i => (i.toLong, "srcA")) ++
      (4001 to 4300).map(i => (i.toLong, "srcB")) ++
      (4301 to 4400).map(i => (i.toLong, "srcC"))).toDF("id", "src")
    val out = TextAnalysis.resampleToMixture(docs, "id", "src",
      Map("srcA" -> 0.5, "srcB" -> 0.5))
      .groupBy("src").agg(F.count(F.lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // T = min(4000/0.5, 300/0.5) = 600 → each stratum targets 300 rows
    assert(!out.contains("srcC"))
    assert(out("srcB") == 300L)           // binding stratum keeps all
    val a = out("srcA").toDouble
    assert(a > 240 && a < 360, s"srcA=$a") // md5 buckets ≈ 300 of 4000
  }

  test("resampleToMixture is deterministic across runs") {
    val docs = (1 to 1000).map(i =>
      (i.toLong, if (i % 3 == 0) "x" else "y")).toDF("id", "src")
    def ids() = TextAnalysis.resampleToMixture(docs, "id", "src",
      Map("x" -> 0.5, "y" -> 0.5), seed = 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids() == ids())
  }

  // ------------------------------------------- filterByDomainBlocklist

  test("domain blocklist: exact host, subdomain, look-alike, no host") {
    val rows = Seq(
      (1L, "https://bad.example/x"),        // exact → dropped
      (2L, "https://sub.bad.example/x"),    // subdomain → dropped
      (3L, "https://notbad.example/x"),     // suffix needs a dot → kept
      (4L, "https://WWW.BAD.example:443/x"),// case + www → dropped
      (5L, "plain text, no url"),           // no host → kept
      (6L, "https://so.me.vs/x"),           // dot quoted: soxme ≠ so.me
      (7L, "https://soxme.vs/x"),
      (8L, "https://good.example/x"))
    val kept = TextAnalysis.filterByDomainBlocklist(
      rows.toDF("id", "url"), "url", Seq("bad.example", "so.me.vs"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L, 7L, 8L))
  }

  test("domain blocklist plan is a narrow filter: no join, no shuffle") {
    val rows = (1 to 100).map(i => (i.toLong, s"https://h$i.example/p"))
    val plan = TextAnalysis.filterByDomainBlocklist(
      rows.toDF("id", "url"), "url", Seq("h7.example"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  // ------------------------------------------------------------- bigramNll

  test("bigramNll matches a hand-computed transition score") {
    // corpus: "a b" ×3 and "a c" ×1 → uni: a=4, b=3, c=1;
    // bigrams: "a b"=3, "a c"=1; V=4 → denom adds 5
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("id", "text")
    val out = Relevance.bigramNll(docs, "id", "text", vocabSize = 4,
      bigramTop = 4).select("id", "nll").as[(Long, Double)].collect().toMap
    val ab = -math.log((3 + 1.0) / (math.max(4, 3) + 5.0)) // c1=uni(a)=4
    val ac = -math.log((1 + 1.0) / (math.max(4, 1) + 5.0))
    assert(math.abs(out(1L) - BigDecimal(ab).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(4L) - BigDecimal(ac).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1L) < out(4L)) // the common transition is cheaper
  }

  test("bigramNll: word salad scores worse than natural transitions") {
    val natural = (1 to 30).map(_ => "the cat sat on the mat").mkString(" ")
    val salad = "mat the on cat the sat " * 2 + "sat mat the on on cat"
    val docs = (Seq((1L, natural)) ++ (2 to 20).map(i =>
      (i.toLong, natural)) :+ (99L, salad)).toDF("id", "text")
    val out = Relevance.bigramNll(docs, "id", "text")
      .select("id", "nll").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(99L), out.toString)
  }

  test("bigramNll: short docs score 0.0 with their token count") {
    val docs = Seq((1L, ""), (2L, "solo"), (3L, "a b")).toDF("id", "text")
    val out = Relevance.bigramNll(docs, "id", "text")
      .select("id", "n_tokens", "nll").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0.0)) && out(2L) == ((1L, 0.0)))
    assert(out(3L)._2 > 0.0)
  }

  test("bigramNll scoring is a narrow fold: no shuffle in the scored plan") {
    val docs = (1 to 100).map(i => (i.toLong, s"token doc $i")).toDF("id", "text")
    val plan = Relevance.bigramNll(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ------------------------------------------------------ compressionRatio

  test("deflateSize round-trips through Inflater for text and binary") {
    val texts = Seq("hello deflate world " * 10, "短い非ASCIIテキスト", "x")
    val sizes = texts.toDF("t")
      .select(TextAnalysis.deflateSize(F.col("t"))).as[Long].collect()
    texts.zip(sizes).foreach { case (t, n) =>
      val bytes = t.getBytes("UTF-8")
      // independent recompute + inflate round-trip proves it's a real
      // zlib stream of exactly the reported size
      val d = new java.util.zip.Deflater(6)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](65536)
      val len = d.deflate(buf); d.end()
      assert(len.toLong == n)
      val inf = new java.util.zip.Inflater()
      inf.setInput(buf, 0, len)
      val out = new Array[Byte](bytes.length + 16)
      val got = inf.inflate(out); inf.end()
      assert(out.take(got).toSeq == bytes.toSeq)
    }
  }

  test("compressionRatio orders repetitive < natural < random") {
    val rnd = new scala.util.Random(3)
    val rows = Seq(
      (1L, "the cat sat on the mat " * 200),                  // repetitive
      (2L, Seq.fill(800)(s"w${rnd.nextInt(5000)}").mkString(" ")), // varied
      (3L, Array.fill(4096)(rnd.nextPrintableChar()).mkString),    // random
      (4L, ""))                                               // empty
    val out = rows.toDF("id", "text")
      .select(F.col("id"), TextAnalysis.compressionRatio(F.col("text")).as("r"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).get < out(2L).get && out(2L).get < out(3L).get,
      out.toString)
    assert(out(1L).get < 0.1)   // long-period boilerplate crushes
    assert(out(3L).get > 0.7)   // near-random barely compresses
    assert(out(4L).isEmpty)     // empty → null, not 0/0
  }

  test("deflate_size is SQL-callable via extensions") {
    val n = spark.sql("SELECT deflate_size('aaaaaaaaaaaaaaaaaaaaaaaa') AS n")
      .as[Long].head()
    assert(n > 0 && n < 24)
  }

  // --------------------------------------------------------- hashed TF-IDF

  test("HashedTf bucket is bit-identical to the conv(md5) recipe") {
    // 200 varied tokens (unicode, empty-adjacent, long), dim not a power
    // of two — the native bucket must equal the SQL-composed one
    val toks = (0 until 200).map(i => s"tok$i-é中${"x" * (i % 17)}")
    val df = toks.toDF("tok")
    val composed = df.select(
      (F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast(org.apache.spark.sql.types.LongType) % 97).as("b"))
      .as[Long].collect()
    val native = toks.map(t => graft.expressions.HashedTf.bucket(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), 97).toLong)
    assert(composed.toSeq == native.toSeq)
  }

  test("tfidfVector matches a hand-computed tiny corpus") {
    // dim 4; find two tokens in distinct buckets, one shared, one rare
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "")).toDF("id", "text")
    val out = Relevance.tfidfVector(docs, "id", "text", dim = 64)
      .as[(Long, Seq[Double])].collect().toMap
    def bucket(t: String) = graft.expressions.HashedTf.bucket(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), 64)
    val (ba, bb, bc) = (bucket("a"), bucket("b"), bucket("c"))
    assert(Set(ba, bb, bc).size == 3) // no collision at dim 64 for these
    val n = 3.0
    def idf(df: Int) = math.log((n + 1) / (df + 1.0)) + 1.0
    // doc 1: tf(a)=2, tf(b)=1; df(a)=2, df(b)=1
    val w1a = 2.0 * idf(2); val w1b = 1.0 * idf(1)
    val l21 = math.sqrt(w1a * w1a + w1b * w1b)
    assert(math.abs(out(1L)(ba) - w1a / l21) < 1e-12)
    assert(math.abs(out(1L)(bb) - w1b / l21) < 1e-12)
    assert(out(1L).count(_ != 0.0) == 2)
    // unit norm for non-empty docs; zero vector for the empty doc
    val l2 = math.sqrt(out(2L).map(x => x * x).sum)
    assert(math.abs(l2 - 1.0) < 1e-12)
    assert(out(3L).forall(_ == 0.0) && out(3L).size == 64)
  }

  test("tfidfEmbedding feeds the ANN stack: cosine of identical docs = 1") {
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "q r s t")).toDF("id", "text")
    val emb = Relevance.tfidfEmbedding(docs, "id", "text", dim = 32)
    val pairs = graft.pipeline.Dedup.embeddingCosinePairs(
      emb, "id", "tfidf", threshold = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("tfidf scoring is narrow: idf folded to a literal, no scoring shuffle") {
    val docs = (1 to 100).map(i => (i.toLong, s"token doc $i")).toDF("id", "text")
    val plan = Relevance.tfidfVector(docs, "id", "text", dim = 16)
      .queryExecution.executedPlan.toString
    // the df aggregate ran at fit time (collected); the returned plan is
    // one narrow projection over the corpus
    assert(!plan.contains("Exchange"), plan)
  }

  test("textFormat: category recipes, priority order, null/edge contracts") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val cases = Seq(
      ("""{"a": 1, "b": [2, 3]}""", "json"),
      ("""[1, 2, 3]""", "json"),
      ("name,age,city\nbob,3,x\nsue,4,y", "csv"),
      ("a,b\n1,2\n3", "prose"),            // ragged → not csv
      ("# Head\n- one\n- two\nplain", "markdown"),
      ("```\nx\n```\n# t\ntext here", "markdown"),
      ("int f(int x) { return (x + 1); }\nint g() { return f(2); }", "code"),
      ("Just an ordinary sentence about nothing much at all.", "prose"),
      ("", "prose"),
      // dense JSON stays json even though it passes the code density
      ("""{"x":{"y":[1,2,{"z":3}]}}""", "json"))
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.textFormat(F.col("t"))).as[String].collect().toSeq
    assert(got === cases.map(_._2), cases.map(_._1).zip(got).toString)
    // NULL in, NULL out
    assert(Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.textFormat(F.col("t"))).head().isNullAt(0))
  }

  test("percentileBins: interpolated boundaries, ties low, null, narrow scan") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    // sorted 1..8: q(.25)=2.75, q(.5)=4.5, q(.75)=6.25 → pairs per bin
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val bins = TextAnalysis.percentileBins(df, "score", 4)
      .as[(Long, Double, Int)].collect().sortBy(_._1).map(_._3).toSeq
    assert(bins === Seq(0, 0, 1, 1, 2, 2, 3, 3))
    // a score exactly on a boundary goes to the LOWER bin
    val tied = (Seq.fill(4)(1.0) ++ Seq.fill(4)(2.0)).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    val tb = TextAnalysis.percentileBins(tied, "score", 2)
      .as[(Long, Double, Int)].collect()
    assert(tb.filter(_._2 == 1.0).forall(_._3 == 0))
    // null scores bin NULL; result deterministic across partitionings
    val withNull = df.unionByName(Seq((99L, Option.empty[Double]))
      .toDF("id", "score"))
    val nb = TextAnalysis.percentileBins(withNull.repartition(5), "score", 4)
    assert(nb.where(F.col("id") === 99).head().isNullAt(2))
    assert(nb.where(F.col("id") =!= 99).as[(Long, Double, Int)].collect()
      .sortBy(_._1).map(_._3).toSeq === bins)
    // binning stage is a narrow scan (the one job is the percentile agg)
    val plan = TextAnalysis.percentileBins(df, "score", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"), plan)
    // empty frame / all-NULL scores: NULL bins, not a crash
    assert(TextAnalysis.percentileBins(df.where(F.lit(false)), "score", 4)
      .count() === 0)
    val allNull = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "score")
    val nulls = TextAnalysis.percentileBins(allNull, "score", 4)
    assert(nulls.count() === 2 && nulls.where(F.col("bin").isNull).count() === 2)
  }
}
