package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.Classifier

/** Deterministic distributed logistic regression: local-reference
  * parity, learning on separable data, partitioning invariance, and the
  * narrow scoring plan. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000L

  /** Local reference: identical integer-quantized GD, plain Scala. */
  private def local(rows: Seq[(Double, Double, Double)], iters: Int,
      lrNum: Long = 1L, lrDen: Long = 10L): (Long, Long, Long) = {
    var (wa, wb, wc) = (0L, 0L, 0L)
    val n = rows.size
    def sig(m: Double) = 0.5 + m / (2.0 * (1.0 + math.abs(m)))
    for (_ <- 0 until iters) {
      var (ga, gb, gc) = (0L, 0L, 0L)
      rows.foreach { case (x1, x2, y) =>
        val m = wc.toDouble / Scale +
          wa.toDouble / Scale * x1 + wb.toDouble / Scale * x2
        val err = sig(m) - y
        ga += math.floor(err * x1 * Scale).toLong
        gb += math.floor(err * x2 * Scale).toLong
        gc += math.floor(err * Scale).toLong
      }
      wa -= (lrNum * ga) / (lrDen * n)
      wb -= (lrNum * gb) / (lrDen * n)
      wc -= (lrNum * gc) / (lrDen * n)
    }
    (wa, wb, wc)
  }

  test("trainLogistic equals the local integer reference") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(500) {
      val y = if (rnd.nextBoolean()) 1.0 else 0.0
      (y + rnd.nextGaussian() * 0.3, rnd.nextDouble(), y)
    }
    val df = rows.toDF("x1", "x2", "y")
    val m = Classifier.trainLogistic(df, "y", Seq("x1", "x2"), iters = 4)
    val (wa, wb, wc) = local(rows, 4)
    assert(m.weightsScaled == Seq(wa, wb) && m.biasScaled == wc,
      s"got ${m.weightsScaled}/${m.biasScaled}, want ($wa,$wb)/$wc")
  }

  test("the trained model separates linearly separable data") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 400).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, y * 2 - 1 + rnd.nextGaussian() * 0.2, y)
    }
    val df = rows.toDF("id", "x1", "y")
    val m = Classifier.trainLogistic(df, "y", Seq("x1"), iters = 20)
    val scored = df.select(F.col("id"), F.col("y"),
      Classifier.score(m).as("s")).as[(Long, Double, Double)].collect()
    val acc = scored.count { case (_, y, s) =>
      (s >= 0.5) == (y == 1.0) }.toDouble / scored.length
    assert(acc >= 0.95, s"accuracy $acc")
    assert(m.weights.head > 0) // positive feature → positive weight
  }

  test("training is bit-identical across partitionings") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(300)((rnd.nextDouble(), rnd.nextDouble(),
      if (rnd.nextBoolean()) 1.0 else 0.0))
    def run(parts: Int) = {
      val m = Classifier.trainLogistic(
        rows.toDF("x1", "x2", "y").repartition(parts),
        "y", Seq("x1", "x2"), iters = 3)
      (m.weightsScaled, m.biasScaled)
    }
    assert(run(1) == run(16))
  }

  test("scoring is a narrow projection: weights ride as literals") {
    val df = (1 to 100).map(i => (i.toLong, i * 0.01, 0.0)).toDF("id", "x1", "y")
    val m = Classifier.trainLogistic(df, "y", Seq("x1"), iters = 2)
    val plan = df.select(Classifier.score(m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }
}
