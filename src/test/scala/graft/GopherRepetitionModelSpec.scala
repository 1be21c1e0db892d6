package graft

import scala.util.Random
import org.apache.spark.sql.{functions => F}
import graft.pipeline.TextAnalysis

/** Random differential net for the Gopher repetition statistics: two
  * implementations of the same 13 statistics coexist — the native
  * Catalyst expression ([[graft.expressions.GopherRepetition]], the one
  * `q_gopher_repetition` runs) and the retained column-DSL recipes
  * ([[TextAnalysis.topNgramCharFrac]] / [[TextAnalysis.dupNgramCharFrac]]
  * / [[TextAnalysis.duplicateLineStats]]) — and only the fixed-doc
  * recomputation in CorpusOpsSpec pinned them together. This net runs
  * seeded random unicode-hostile documents (combining marks, astral
  * code points, zero-width joiners, pathological whitespace, planted
  * duplicate lines/paragraphs/phrases, degenerate single-word runs)
  * through BOTH engines plus a third, driver-side reimplementation
  * written directly from the paper's definitions with code-point
  * lengths and UTF-8 tie order, and requires bit-identical doubles.
  *
  * Deepen with GRAFT_MODEL_SEEDS_EXTRA (comma-separated extra seeds)
  * and GRAFT_FUZZ_ROUNDS (documents per seed). */
class GopherRepetitionModelSpec extends SparkSpec {
  import spark.implicits._

  private def extraSeeds: Seq[Int] =
    sys.env.get("GRAFT_MODEL_SEEDS_EXTRA").toSeq
      .flatMap(_.split(',')).filter(_.nonEmpty).map(_.trim.toInt)
  private def rounds: Int =
    sys.env.get("GRAFT_FUZZ_ROUNDS").map(_.toInt).getOrElse(60)

  // ------------------------------------------------ document generator

  /** Words that stress every length/order assumption: combining marks
    * (é composed vs decomposed — equal-looking, unequal strings), an
    * astral math letter and an emoji (2 UTF-16 units, 1 code point — a
    * UTF-16 `.length` anywhere shows up immediately), a zero-width
    * joiner, and U+FFFD (sorts BELOW astral code points in UTF-8 byte
    * order but ABOVE their surrogate pairs in UTF-16 order — a tie
    * broken with String.compareTo shows up immediately). */
  private val vocab = Vector("tok", "é", "é", "中文", "𝒳",
    "😀", "a‍b", "ß", "�", "w")

  private def genDoc(rnd: Random): String = {
    def word() = {
      val w = vocab(rnd.nextInt(vocab.size))
      if (rnd.nextBoolean()) w + rnd.nextInt(4) else w
    }
    def phrase(n: Int) = Seq.fill(n)(word()).mkString(" ")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val nLines = rnd.nextInt(14)
    var i = 0
    while (i < nLines) {
      rnd.nextInt(10) match {
        case 0 => lines += "" // empty line → paragraph boundary wobble
        case 1 if lines.nonEmpty => // planted duplicate line
          lines += lines(rnd.nextInt(lines.length))
        case 2 => // degenerate run: one word repeated (top-gram bait)
          val w = word()
          lines += Seq.fill(2 + rnd.nextInt(9))(w).mkString(" ")
        case 3 => // repeated phrase block (dup 5..10-gram bait)
          val p = phrase(3 + rnd.nextInt(6))
          lines += s"$p ${word()} $p"
        case 4 => // pathological whitespace: double spaces, edges
          lines += s" ${phrase(1 + rnd.nextInt(3))}  ${word()} "
        case _ => lines += phrase(rnd.nextInt(7))
      }
      i += 1
    }
    // paragraph separators sometimes stack ("\n\n\n" splits unevenly)
    lines.mkString(Seq("\n", "\n", "\n\n", "\n\n\n")(rnd.nextInt(4)))
  }

  // --------------------------- driver reference (paper + doc choices)

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  private def cp(s: String): Int = s.codePointCount(0, s.length)
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def ref(text: String): Seq[Double] = {
    def unitStats(units: Seq[String]): (Double, Double) = {
      val counts = units.groupBy(identity).map { case (k, v) => k -> v.size }
      val tot = units.map(cp(_).toLong).sum
      val dup = units.filter(counts(_) > 1)
      (if (units.nonEmpty) r6(dup.size.toDouble / units.size) else 0.0,
        if (tot > 0) r6(dup.map(cp(_).toLong).sum.toDouble / tot) else 0.0)
    }
    val words = text.split(" ", -1).filter(_.nonEmpty).toSeq
    def grams(n: Int): Seq[String] =
      if (words.length >= n) words.sliding(n).map(_.mkString(" ")).toSeq
      else Seq.empty
    def top(n: Int): Double = {
      val g = grams(n)
      if (g.isEmpty || cp(text) == 0) 0.0
      else {
        val counts = g.groupBy(identity).map { case (k, v) => k -> v.size }
        val best = counts.values.max
        val str = counts.filter(_._2 == best).keys
          .reduce((a, b) => if (utf8Lt(a, b)) a else b)
        r6(best.toLong * cp(str).toDouble / cp(text))
      }
    }
    def dupN(n: Int): Double = {
      val tot = words.map(cp(_).toLong).sum
      if (tot == 0) return 0.0
      val g = grams(n)
      val counts = g.groupBy(identity).map { case (k, v) => k -> v.size }
      val covered = words.indices.filter { j =>
        (math.max(0, j - n + 1) to j).exists(i =>
          i + n <= words.length && counts(g(i)) > 1)
      }
      r6(covered.map(j => cp(words(j)).toLong).sum.toDouble / tot)
    }
    val (dlf, dlcf) = unitStats(text.split("\n", -1).filter(_.nonEmpty).toSeq)
    val (dpf, dpcf) =
      unitStats(text.split("\n\n", -1).filter(_.nonEmpty).toSeq)
    Seq(dlf, dlcf, dpf, dpcf, top(2), top(3), top(4),
      dupN(5), dupN(6), dupN(7), dupN(8), dupN(9), dupN(10))
  }

  // ------------------------------------------------------------ tests

  private def seeds: Seq[Int] = Seq(7, 20260816) ++ extraSeeds

  test("native expression == column recipes == driver ref on random " +
      "unicode-hostile documents") {
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val docs = (0 until rounds).map(i => (i.toLong, genDoc(rnd)))
      val df = docs.toDF("id", "text")
      // one pass computes all three implementations side by side
      val cols = Seq(F.col("id"),
        TextAnalysis.gopherRepetition(F.col("text")).as("native"),
        TextAnalysis.duplicateLineStats(F.col("text")).as("dl")) ++
        (2 to 4).map(n =>
          TextAnalysis.topNgramCharFrac(F.col("text"), n).as(s"top$n")) ++
        (5 to 10).map(n =>
          TextAnalysis.dupNgramCharFrac(F.col("text"), n).as(s"dup$n"))
      val rows = df.select(cols: _*).collect()
      for (row <- rows) {
        val id = row.getLong(0)
        val native = row.getStruct(1)
        val nat = (0 until 13).map(native.getDouble)
        val expect = ref(docs(id.toInt)._2)
        assert(nat == expect,
          s"seed $seed doc $id: native $nat != ref $expect\n" +
            s"text=${docs(id.toInt)._2.replace("\n", "\\n")}")
        // column-DSL recipes agree where they exist: line stats,
        // top 2/3/4-gram, duplicate 5..10-gram coverage
        val dl = row.getStruct(2)
        assert(dl.getDouble(1) == nat(0) && dl.getDouble(2) == nat(1),
          s"seed $seed doc $id: duplicateLineStats diverges")
        for ((n, k) <- (2 to 4).zipWithIndex)
          assert(row.getDouble(3 + k) == nat(4 + k),
            s"seed $seed doc $id: topNgramCharFrac($n) diverges")
        for ((n, k) <- (5 to 10).zipWithIndex)
          assert(row.getDouble(6 + k) == nat(7 + k),
            s"seed $seed doc $id: dupNgramCharFrac($n) diverges")
      }
    }
  }

  test("the three implementations agree on crafted boundary documents") {
    val docs = Seq(
      "", " ", "  ", "\n", "\n\n", "\n\n\n", "\n\n\n\n",
      "😀", "😀 😀", "😀 😀 😀 😀 😀 😀 😀 😀 😀 😀 😀 😀",
      "é é é é",   // composed vs decomposed é
      "� 𝒳 � 𝒳 � 𝒳",     // UTF-8 vs UTF-16 order trap
      "a‍b a‍b a‍b",
      "x\n\nx\n\nx", "x\nx\nx",
      "p q r s t u p q r s t u",        // exact 6-gram repeat
      Seq.fill(11)("w").mkString(" "))   // one word repeated 11×
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(F.col("id"),
      TextAnalysis.gopherRepetition(F.col("text")).as("g"))
      .collect()
    for (row <- rows) {
      val id = row.getLong(0).toInt
      val nat = (0 until 13).map(row.getStruct(1).getDouble)
      assert(nat == ref(docs(id)), s"doc $id: ${docs(id)}")
    }
  }
}
