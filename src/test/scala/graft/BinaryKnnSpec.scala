package graft

import org.apache.spark.sql.{functions => F}

import graft.expressions.BinarySign
import graft.pipeline.Similarity

/** Binary (1-bit) embedding quantization + Hamming-prefiltered top-k
  * ([[graft.expressions.BinarySign]], `Similarity.binaryTopK`): code
  * parity across the three evaluation paths, exactness at full rerank,
  * recall at realistic rerank, determinism, and SQL registration. */
class BinaryKnnSpec extends SparkSpec {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, d: Int, center: Float): Seq[Float] =
    Seq.fill(d)(center + rnd.nextFloat() - 0.5f)

  private lazy val corpus: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(31)
    // two loose clusters + noise, d = 96 (crosses the word boundary)
    (0L until 200L).map { i =>
      val center = if (i % 2 == 0) 0.3f else -0.3f
      (i, randVec(rnd, 96, center))
    }
  }

  test("packLocal == expression path == composed SQL recipe") {
    val df = corpus.toDF("id", "vec")
    val native = df.select(F.col("id"),
      Similarity.binaryQuantize(F.col("vec")).as("code"))
      .as[(Long, Seq[Long])].collect().toMap
    // driver twin
    for ((id, v) <- corpus.take(20))
      assert(native(id) === BinarySign.packLocal(v).toSeq, s"id=$id")
    // SQL recipe: per-word sum of 1 << (i % 64) over positive components
    df.createOrReplaceTempView("bq_in")
    val sql = spark.sql("""
      SELECT id, w, sum(CASE WHEN element_at(vec, CAST(i + 1 AS INT)) > 0
                   THEN shiftleft(CAST(1 AS BIGINT), CAST(i % 64 AS INT))
                   ELSE CAST(0 AS BIGINT) END) AS word
      FROM bq_in
      LATERAL VIEW posexplode(sequence(0, size(vec) - 1)) t AS _, i
      LATERAL VIEW explode(array(CAST(i / 64 AS INT))) tw AS w
      GROUP BY id, w""").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for ((id, words) <- sql) assert(native(id) === words, s"id=$id")
    // zeros and negatives clear; empty vec -> one zero word
    assert(BinarySign.packLocal(Seq(0f, -1f, 1f)).toSeq === Seq(4L))
    assert(BinarySign.packLocal(Seq.empty).toSeq === Seq(0L))
  }

  test("hammingDist equals popcount truth") {
    val pairs = Seq(
      (Seq(0L, 0L), Seq(0L, 0L), 0L),
      (Seq(-1L, 0L), Seq(0L, 0L), 64L),
      (Seq(5L, 3L), Seq(6L, 1L), 3L))
    for ((a, b, want) <- pairs) {
      val got = Seq((a, b)).toDF("a", "b")
        .select(Similarity.hammingDist(F.col("a"), F.col("b")))
        .as[Long].head()
      assert(got === want, s"$a vs $b")
    }
  }

  test("binaryTopK at full rerank equals brute force exactly") {
    val df = corpus.toDF("id", "vec")
    val q = corpus(7)._2
    val exact = Similarity.bruteForceTopK(df.where(F.col("id") =!= 7),
      "id", "vec", q, 10).as[(Long, Double)].collect().toSeq
    val binary = Similarity.binaryTopK(df.where(F.col("id") =!= 7),
      "id", "vec", q, 10, rerank = corpus.size)
      .as[(Long, Double)].collect().toSeq
    assert(binary === exact)
  }

  test("recall at realistic rerank; deterministic across partitionings") {
    val df = corpus.toDF("id", "vec")
    val q = corpus(4)._2
    val truth = Similarity.bruteForceTopK(df, "id", "vec", q, 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val got = Similarity.binaryTopK(df, "id", "vec", q, 10, rerank = 80)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(truth.intersect(got).size >= 8, s"recall too low: $got vs $truth")
    val again = Similarity.binaryTopK(df.repartition(13), "id", "vec", q,
      10, rerank = 80).as[(Long, Double)].collect().map(_._1).toSet
    assert(again === got)
  }

  test("BinaryIndex: fitted == unfitted; pruned scan; save/load round trip") {
    val df = corpus.toDF("id", "vec")
    val q = corpus(9)._2
    val unfitted = Similarity.binaryTopK(df, "id", "vec", q, 10, rerank = 60)
      .as[(Long, Double)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("bidx").toString
    Similarity.BinaryIndex.fit(df, "id", "vec").save(dir)
    val loaded = Similarity.BinaryIndex.load(spark, dir)
    val fitted = Similarity.binaryTopK(loaded, q, 10, rerank = 60)
      .as[(Long, Double)].collect().toSeq
    assert(fitted === unfitted)
    // the Hamming pass reads only (id, __code) — the float column
    // stays on disk (parquet column pruning)
    val qCode = graft.expressions.BinarySign.packLocal(q)
    val hammingPlan = loaded.coded
      .select(F.col("id"),
        Similarity.hammingDist(F.col("__code"),
          F.typedlit(qCode.toSeq)).as("__h"))
      .orderBy(F.col("__h"), F.col("id")).limit(60)
      .queryExecution.executedPlan.toString
    assert(hammingPlan.contains("ReadSchema") && !hammingPlan.contains("vec:"),
      hammingPlan)
  }

  test("hardNegatives: positives excluded before ranking, dense ranks") {
    val queries = Seq((0L, Seq(1f, 0f, 0f))).toDF("qid", "qvec")
    val corpus = Seq(
      (10L, Seq(1f, 0f, 0f)),    // perfect match — but labeled positive
      (11L, Seq(0.9f, 0.1f, 0f)),
      (12L, Seq(0.5f, 0.5f, 0f)),
      (13L, Seq(0f, 1f, 0f))).toDF("id", "vec")
    val positives = Seq((0L, 10L)).toDF("qid", "id")
    val got = Similarity.hardNegatives(queries, corpus, positives, k = 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq
      .sortBy(_._3)
    // the positive is gone; rank 1 is the best true negative
    assert(got === Seq((0L, 11L, 1), (0L, 12L, 2)))
    // deterministic across partitionings
    val again = Similarity.hardNegatives(queries, corpus.repartition(3),
      positives, k = 2).select("qid", "id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(again === got)
  }

  test("SQL registration: binary_sign") {
    val r = spark.sql(
      "SELECT binary_sign(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)))")
      .head().getSeq[Long](0)
    assert(r === Seq(1L))
  }
}
