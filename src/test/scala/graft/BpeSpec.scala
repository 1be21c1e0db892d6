package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.Bpe

/** BPE tokenizer: trainer correctness vs hand-computation and a local
  * reference, apply semantics (greedy rank order), train/apply
  * round-trips, determinism, and the narrow encode plan. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference trainer: same algorithm, plain Scala. */
  private def localTrain(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val table = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    var seqs = table.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val counts = seqs.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => (p, c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        seqs = seqs.map { case (s, c) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
              b += (best._1 + best._2); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), c)
        }
        k += 1
      }
    }
    out.result()
  }

  test("train matches the hand-computed merges on a tiny corpus") {
    // words: aaab ×2, ab ×1 → (a,a) count 4 beats (a,b) count 3; after
    // merging, (a,b) count 3 beats (aa,a) count 2
    val df = Seq("aaab aaab ab").toDF("text")
    val m = Bpe.train(df, "text", numMerges = 2)
    assert(m.merges == Seq(("a", "a"), ("a", "b")))
  }

  test("train stops early when no pairs remain") {
    val m = Bpe.train(Seq("ab ab").toDF("text"), "text", numMerges = 100)
    assert(m.merges == Seq(("a", "b"))) // one merge exhausts the corpus
  }

  test("train equals the local reference on a random corpus") {
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(2000)(
      Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(5)).toChar).mkString)
    val df = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val m = Bpe.train(df, "text", numMerges = 30)
    assert(m.merges == localTrain(words, 30))
  }

  test("train is deterministic across partitionings") {
    val texts = (1 to 500).map(i => s"w${i % 40} common${i % 7} tail$i")
    def run(parts: Int) =
      Bpe.train(texts.toDF("text").repartition(parts), "text", 25).merges
    assert(run(1) == run(16))
  }

  test("encode applies merges greedily by rank, not position") {
    // (b,c) outranks (a,b): "abc" → a + bc, and (a,bc) is no merge
    val m = Bpe.Model(Seq(("b", "c"), ("a", "b")))
    val got = Seq("abc").toDF("t")
      .select(Bpe.encode(F.col("t"), m)).as[Seq[String]].head()
    assert(got == Seq("a", "bc"))
    // chained ranks collapse fully: ab then ab+c
    val m2 = Bpe.Model(Seq(("a", "b"), ("ab", "c")))
    val got2 = Seq("abc abc").toDF("t")
      .select(Bpe.encode(F.col("t"), m2)).as[Seq[String]].head()
    assert(got2 == Seq("abc", "abc"))
  }

  test("encode round-trips: subwords concatenate back to the words") {
    val texts = Seq("the quick brown fox", "aaab ab aaab", "解析 テキスト")
    val df = texts.toDF("text")
    val m = Bpe.train(df, "text", numMerges = 10)
    val enc = df.select(F.col("text"),
      Bpe.encode(F.col("text"), m).as("toks"))
      .as[(String, Seq[String])].collect()
    enc.foreach { case (text, toks) =>
      assert(toks.mkString == text.split(" ").filter(_.nonEmpty).mkString)
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("trained encode compresses the corpus it was fit on") {
    val df = Seq.fill(50)("internationalization internationalization token")
      .toDF("text")
    val m = Bpe.train(df, "text", numMerges = 40)
    val n = df.select(Bpe.tokenCount(F.col("text"), m)).as[Int].head()
    // 'internationalization' collapses to one symbol under 40 merges
    assert(n <= 3, s"token count $n")
  }

  test("encode is a narrow projection: no exchange, codegen survives") {
    val m = Bpe.Model(Seq(("a", "b")))
    val df = (1 to 100).map(_ => "ab cab").toDF("text")
    val plan = df.select(Bpe.encode(F.col("text"), m).as("t"))
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), plan.toString)
    // evaluate through the codegen path (addReferenceObj round-trip):
    // "ab" → [ab], "cab" → [c, ab] — 3 subwords per row
    val counts = df.select(F.size(Bpe.encode(F.col("text"), m)))
      .as[Int].collect()
    assert(counts.forall(_ == 3))
  }
}
