package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the COMPLETE Gopher repetition
  * ruleset (Rae et al. 2021 Table A1) in one imperative pass per
  * document: duplicate line / paragraph (character) fractions, top
  * 2/3/4-gram character fractions, duplicate 5..10-gram character
  * COVERAGE fractions, and the combined `passes` verdict — the same
  * 14-field struct, statistics rounded to 6 dp (HALF_UP, matching
  * `F.round`) BEFORE thresholding so SQL oracles reproduce values and
  * verdict bit-exactly.
  *
  * WHY NATIVE: the column-DSL recipe for these statistics needs each
  * heavy intermediate (the gram sort, the neighbor compare, the
  * coverage mask) MANY times, and Catalyst inlines every reference —
  * higher-order functions are CodegenFallback, so each duplicated
  * subtree re-evaluates interpreted per row. On a pathological
  * highly-duplicated 50k-word document that recipe costs minutes on
  * one executor thread (CorpusOpsSpec pins the bound); this expression
  * is O(words · n) with real hash maps — milliseconds — and rides
  * inside whole-stage codegen as a single opaque call, the
  * custom-Expression tier the 100 TB straggler posture calls for.
  *
  * Semantics pinned to the paper + this library's documented choices:
  * words split on single spaces, lines on `\n`, paragraphs on `\n\n`
  * (empties dropped); duplicate-unit stats count every occurrence of a
  * repeated unit; the top gram counts overlapping occurrences and ties
  * break to the smallest gram in UTF-8 byte order; duplicate-n-gram
  * coverage counts each covered word position once; all lengths are
  * Unicode code points (matching `F.length`). Null text → null row. */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition needs string, got ${other.catalogString}")
  }

  override def dataType: DataType = GopherRepetition.schema
  override def prettyName: String = "gopher_repetition"

  override def nullSafeEval(input: Any): Any =
    apply(input.asInstanceOf[UTF8String])

  def apply(u: UTF8String): InternalRow = {
    val text = u.toString
    val out = new Array[Any](14)
    val stats = GopherRepetition.compute(text)
    var i = 0
    while (i < 13) { out(i) = stats(i); i += 1 }
    out(13) =
      stats(0) <= 0.3 && stats(2) <= 0.3 &&
        stats(1) <= 0.2 && stats(3) <= 0.2 &&
        stats(4) <= 0.2 && stats(5) <= 0.18 && stats(6) <= 0.16 &&
        stats(7) <= 0.15 && stats(8) <= 0.14 && stats(9) <= 0.13 &&
        stats(10) <= 0.12 && stats(11) <= 0.11 && stats(12) <= 0.1
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherRep", this,
      classOf[GopherRepetition].getName)
    defineCodeGen(ctx, ev, c => s"$ref.apply($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : GopherRepetition = copy(child = newChild)
}

object GopherRepetition {

  val schema: StructType = StructType(Seq(
    "dup_line_frac", "dup_line_char_frac",
    "dup_para_frac", "dup_para_char_frac",
    "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
    "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
    "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")
    .map(StructField(_, DoubleType, nullable = false)) :+
    StructField("passes", BooleanType, nullable = false))

  /** `F.round(_, 6)` on doubles: BigDecimal.valueOf + HALF_UP. */
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Code points, matching `F.length` on strings. */
  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** UTF-8 byte order — the tie order `array_sort` gives UTF8Strings. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def unitStats(units: Array[String]): (Double, Double) = {
    if (units.isEmpty) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    units.foreach(x => counts.merge(x, 1, Integer.sum))
    var dupUnits = 0L
    var dupChars = 0L
    var totChars = 0L
    units.foreach { x =>
      val c = cp(x)
      totChars += c
      if (counts.get(x) > 1) { dupUnits += 1; dupChars += c }
    }
    (r6(dupUnits.toDouble / units.length),
      if (totChars > 0) r6(dupChars.toDouble / totChars) else 0.0)
  }

  /** The 13 statistics in struct order (passes is derived by eval). */
  private[expressions] def compute(text: String): Array[Double] = {
    val words = text.split(" ", -1).filter(_.nonEmpty)
    val (dlf, dlcf) = unitStats(text.split("\n", -1).filter(_.nonEmpty))
    val (dpf, dpcf) = unitStats(text.split("\n\n", -1).filter(_.nonEmpty))
    val textChars = cp(text)
    val wordCp = words.map(cp)
    val prefix = new Array[Long](words.length + 1)
    var i = 0
    while (i < words.length) { prefix(i + 1) = prefix(i) + wordCp(i); i += 1 }
    val totWordChars = prefix(words.length)

    def grams(n: Int): Array[String] =
      if (words.length < n) Array.empty
      else Array.tabulate(words.length - n + 1) { j =>
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(j + k)); k += 1
        }
        sb.toString
      }

    def top(n: Int): Double = {
      val g = grams(n)
      if (g.isEmpty || textChars == 0) return 0.0
      val counts = new java.util.HashMap[String, Int]()
      g.foreach(x => counts.merge(x, 1, Integer.sum))
      var best: String = null
      var bestC = 0
      counts.forEach { (k, c) =>
        if (c > bestC || (c == bestC && utf8Lt(k, best))) { best = k; bestC = c }
      }
      r6(bestC.toLong * cp(best).toDouble / textChars)
    }

    def dupCov(n: Int): Double = {
      if (totWordChars == 0) return 0.0
      val g = grams(n)
      if (g.isEmpty) return 0.0
      val counts = new java.util.HashMap[String, Int]()
      g.foreach(x => counts.merge(x, 1, Integer.sum))
      var dupChars = 0L
      var curEnd = -1 // last covered 0-based word index
      var j = 0
      while (j < g.length) {
        if (counts.get(g(j)) > 1) {
          val from = math.max(j, curEnd + 1)
          val to = j + n - 1
          if (to >= from) dupChars += prefix(to + 1) - prefix(from)
          curEnd = to
        }
        j += 1
      }
      r6(dupChars.toDouble / totWordChars)
    }

    Array(dlf, dlcf, dpf, dpcf, top(2), top(3), top(4),
      dupCov(5), dupCov(6), dupCov(7), dupCov(8), dupCov(9), dupCov(10))
  }
}
