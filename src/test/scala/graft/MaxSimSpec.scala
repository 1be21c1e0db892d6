package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.Similarity

/** ColBERT-style MaxSim late interaction
  * ([[graft.expressions.MaxSim]], `Similarity.maxSimTopK`): local
  * double-loop reference parity (incl. negative maxima, nulls, empty
  * matrices), retrieval sanity, plan shape, SQL registration. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def refCos(a: Seq[Float], b: Seq[Float]): Double = {
    if (a.length != b.length) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) dot / d else 0.0
  }

  private def refScore(docs: Seq[Seq[Float]], query: Seq[Seq[Float]]): Double =
    query.map { q =>
      if (docs.isEmpty) 0.0 else docs.map(d => refCos(d, q)).max
    }.sum

  test("expression equals the local double-loop reference") {
    val rnd = new scala.util.Random(17)
    def mat(rows: Int, d: Int) =
      Seq.fill(rows)(Seq.fill(d)(rnd.nextFloat() * 2 - 1))
    val cases = Seq(
      (mat(5, 16), mat(3, 16)),
      (mat(1, 8), mat(1, 8)),
      // all-negative cosines: true max stays negative
      (Seq(Seq(-1f, 0f), Seq(0f, -1f)), Seq(Seq(1f, 1f))),
      // empty doc matrix → 0
      (Seq.empty[Seq[Float]], mat(2, 4)))
    for ((docs, query) <- cases) {
      val got = Seq(Tuple1(docs)).toDF("vecs")
        .select(Similarity.maxSim(F.col("vecs"), F.typedlit(query)))
        .as[Double].head()
      assert(math.abs(got - refScore(docs, query)) < 1e-12,
        s"docs=$docs query=$query")
    }
    // the negative-max case really is negative
    assert(refScore(Seq(Seq(-1f, 0f), Seq(0f, -1f)), Seq(Seq(1f, 1f))) < 0)
  }

  test("retrieval: the doc containing the query tokens wins; plan is narrow") {
    val rnd = new scala.util.Random(3)
    val query = Seq(Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat()))
    val docs = (0L until 50L).map { i =>
      val vecs =
        if (i == 42L) query ++ Seq(Seq.fill(16)(rnd.nextFloat()))
        else Seq.fill(3)(Seq.fill(16)(rnd.nextFloat() * 2 - 1))
      (i, vecs)
    }.toDF("id", "vecs")
    val top = Similarity.maxSimTopK(docs, "id", "vecs", query, 5)
    assert(top.as[(Long, Double)].head()._1 === 42L)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Join") && !plan.contains("Exchange hashpartitioning"),
      plan)
  }

  test("null contracts and SQL registration") {
    val viaSql = spark.sql(
      """SELECT max_sim(
           array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))),
           array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                 array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))),
         max_sim(CAST(NULL AS ARRAY<ARRAY<FLOAT>>),
           array(array(CAST(1.0 AS FLOAT))))""").head()
    assert(math.abs(viaSql.getDouble(0) - 1.0) < 1e-12)
    assert(viaSql.isNullAt(1))
  }
}
