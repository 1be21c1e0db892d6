package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.{Relevance, Similarity}

/** Reciprocal-rank fusion (`Relevance.rrfFuse`): hand-computed scores,
  * missing-id semantics, partitioning determinism, and a real hybrid
  * (lexical BM25 + binary ANN) composition. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fusion with a missing id") {
    // list A ranks 10,20,30; list B ranks 20,10 (30 absent from B)
    val a = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("id", "score")
    val b = Seq((20L, 9.0), (10L, 8.0)).toDF("id", "score")
    val got = Relevance.rrfFuse(Seq(a, b), "id", "score", topK = 3)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(10L) - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(30L) - 1.0 / 63) < 1e-15)
    // ties in input scores break by id: equal scores rank by id asc
    val tied = Seq((5L, 1.0), (4L, 1.0)).toDF("id", "score")
    val t = Relevance.rrfFuse(Seq(tied), "id", "score", topK = 2)
      .as[(Long, Double)].collect().toMap
    assert(t(4L) > t(5L))
  }

  test("bit-identical across partitionings, three lists") {
    val rnd = new scala.util.Random(9)
    val lists = (0 until 3).map { s =>
      rnd.shuffle((0L until 100L).toList).take(40)
        .map(id => (id, rnd.nextDouble())).toDF("id", "score")
    }
    val one = Relevance.rrfFuse(lists, "id", "score", 25)
      .as[(Long, Double)].collect().toSeq
    val other = Relevance.rrfFuse(lists.map(_.repartition(7)), "id",
      "score", 25).as[(Long, Double)].collect().toSeq
    assert(one === other)
  }

  test("hybrid search: lexical and vector lists fuse; both-lists doc wins") {
    val docs = Seq(
      (1L, "spark shuffle exchange partition", Seq(0.9f, 0.1f, 0.0f)),
      (2L, "cooking pasta with tomato sauce", Seq(0.85f, 0.2f, 0.1f)),
      (3L, "spark partition tuning guide", Seq(-0.9f, 0.0f, 0.4f)),
      (4L, "gardening in spring weather", Seq(-0.8f, -0.1f, 0.3f)))
      .toDF("id", "text", "vec")
    val lexical = Relevance.bm25(docs, "text", Seq("spark", "partition"))
      .select(F.col("id"), F.col("bm25").as("score"))
      .orderBy(F.col("score").desc, F.col("id")).limit(3)
    val vector = Similarity.binaryTopK(docs, "id", "vec",
      Seq(0.9f, 0.15f, 0.05f), k = 3, rerank = 4)
      .select(F.col("id"), F.col("cosine").as("score"))
    val fused = Relevance.rrfFuse(Seq(lexical, vector), "id", "score", 4)
      .as[(Long, Double)].collect()
    // doc 1 tops both lists (lexical hit AND closest vector) → wins
    assert(fused.head._1 === 1L)
  }

  test("cms_agg streams: complete-mode matrix equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val toks = Seq.fill(30)("hot") ++ (0 until 20).map(i => s"cold$i")
    val input = MemoryStream[String]
    val q = input.toDS().toDF("tok")
      .groupBy()
      .agg(graft.expressions.ColumnBridge.column(
        graft.expressions.CmsAgg(
          graft.expressions.ColumnBridge.expression(F.col("tok")), 4, 256)
          .toAggregateExpression()).as("m"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream")
      .start()
    input.addData(toks.take(25): _*)
    q.processAllAvailable()
    input.addData(toks.drop(25): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").head().getSeq[Long](0)
    val batch = graft.pipeline.Sketches.cmsSketch(
      toks.toDF("tok"), "tok", 4, 256)
    assert(streamed.toSeq === batch.toSeq)
  }
}
