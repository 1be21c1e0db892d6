package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.LongType

/** The fused pair-emitting banding aggregate (SmallestPairs) must emit
  * exactly the pairs the unfused CollectSmallest + posexplode/slice
  * expansion produced — including when the cap binds — so the minhash
  * pipeline's results are unchanged operator-internally. */
class SmallestPairsSpec extends SparkSpec {

  import spark.implicits._

  private def fusedPairs(rows: Seq[(Long, Int)], cap: Int): Set[(Long, Long)] = {
    val df = rows.toDF("rid", "bucket")
    df.groupBy("bucket")
      .agg(graft.expressions.ColumnBridge.column(
        graft.expressions.SmallestPairs(
          graft.expressions.ColumnBridge.expression(F.col("rid")),
          cap).toAggregateExpression()).as("prs"))
      .select(F.explode(F.col("prs")).as("pr"))
      .select(F.col("pr.id1"), F.col("pr.id2"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Reference: cap-smallest ids per bucket (duplicates kept), ordered
    * pairs, distinct across buckets. */
  private def referencePairs(rows: Seq[(Long, Int)], cap: Int): Set[(Long, Long)] =
    rows.groupBy(_._2).values.flatMap { bucket =>
      val ids = bucket.map(_._1).sorted.take(cap)
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        yield (ids(i), ids(j))
    }.toSet

  test("equals the unfused expansion on random buckets, cap binding") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(8)))
      .distinct // unique rid per bucket, the LSH banding contract
    for (cap <- Seq(1, 2, 3, 7, 64)) {
      assert(fusedPairs(rows, cap) === referencePairs(rows, cap),
        s"cap=$cap")
    }
  }

  test("empty and singleton buckets emit no pairs") {
    assert(fusedPairs(Seq((5L, 0)), 16) === Set.empty)
    assert(fusedPairs(Seq((5L, 0), (9L, 1)), 16) === Set.empty)
  }

  test("minhash pipeline takes the fused aggregate for long ids") {
    // identical texts ⟹ identical signatures ⟹ guaranteed shared
    // buckets: the banding MUST emit (1,2), and doc 3 shares nothing
    val docs = Seq((1L, "aaa bbb ccc ddd eee fff"),
      (2L, "aaa bbb ccc ddd eee fff"),
      (3L, "zzz yyy xxx www vvv uuu")).toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.minhashDedupPairs(
      docs, "doc_id", "text", threshold = 0.9, k = 3,
      numHashes = 16, bands = 4)
    assert(pairs.queryExecution.optimizedPlan.toString
      .contains("smallest_pairs"),
      "long-id banding must use the fused pair aggregate")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && !got.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
