package graft

import org.apache.spark.sql.{functions => F}
import graft.pipeline.Pq

/** Product quantization: fit parity against a local integer reference,
  * encode determinism across partitionings, ADC exactness, degraded
  * inputs, and top-k recall on separable data. */
class PqSpec extends SparkSpec {

  private val Scale = 1000000L

  private def quant(v: Seq[Float], offset: Double): Array[Long] =
    v.map(x => math.floor((x.toDouble + offset) * Scale).toLong).toArray

  /** Local single-threaded reference of fit + encode (same integer
    * arithmetic, same tie-breaks), independent of Spark. */
  private def referenceFitEncode(rows: Seq[(Long, Seq[Float])], m: Int,
      k: Int, iters: Int, offset: Double): (Array[Array[Array[Long]]], Map[Long, Seq[Int]]) = {
    val d = rows.head._2.length
    val subDim = d / m
    val q = rows.map { case (id, v) => id -> quant(v, offset) }.toMap
    val init = rows.sortBy(_._1).take(k).map(r => q(r._1))
    var cb = Array.tabulate(m) { j =>
      Array.tabulate(k) { c =>
        init(math.min(c, init.length - 1)).slice(j * subDim, (j + 1) * subDim)
      }
    }
    def assign(qv: Array[Long]): Seq[Int] = (0 until m).map { j =>
      var best = 0; var bd = Long.MaxValue
      for (c <- 0 until k) {
        var s = 0L
        for (t <- 0 until subDim) {
          val diff = qv(j * subDim + t) - cb(j)(c)(t); s += diff * diff
        }
        if (s < bd) { bd = s; best = c }
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(m, k, subDim)(0L)
      val counts = Array.fill(m, k)(0L)
      rows.foreach { case (id, _) =>
        val code = assign(q(id))
        for (j <- 0 until m) {
          counts(j)(code(j)) += 1
          for (t <- 0 until subDim) sums(j)(code(j))(t) += q(id)(j * subDim + t)
        }
      }
      cb = Array.tabulate(m) { j =>
        Array.tabulate(k) { c =>
          if (counts(j)(c) == 0) cb(j)(c)
          else Array.tabulate(subDim)(t => sums(j)(c)(t) / counts(j)(c))
        }
      }
    }
    (cb, rows.map { case (id, _) => id -> assign(q(id)) }.toMap)
  }

  private def randomRows(n: Int, d: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(id => id -> Seq.fill(d)(rnd.nextFloat() * 2 - 1))
  }

  test("fit + encode equal the local integer reference") {
    import spark.implicits._
    val rows = randomRows(80, 16, seed = 11)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", m = 4, k = 5, iters = 3)
    val (refCb, refCodes) =
      referenceFitEncode(rows, m = 4, k = 5, iters = 3, offset = 2.0)
    assert(model.codebooks == refCb.map(_.map(_.toSeq).toSeq).toSeq)
    val got = df.select(F.col("id"), Pq.encode(model, F.col("vec")).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == refCodes)
  }

  test("fit is invariant to partitioning and row order") {
    import spark.implicits._
    val rows = randomRows(60, 8, seed = 23)
    val a = Pq.fit(rows.toDF("id", "vec").repartition(1), "id", "vec", 2, 4, 2)
    val b = Pq.fit(scala.util.Random.shuffle(rows).toDF("id", "vec")
      .repartition(7), "id", "vec", 2, 4, 2)
    assert(a == b)
  }

  test("adc equals the exact quantized distance to reconstructed centroids") {
    import spark.implicits._
    val rows = randomRows(40, 8, seed = 5)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", m = 2, k = 4, iters = 2)
    val query = rows(17)._2
    val table = model.adcTable(query)
    val got = df.select(F.col("id"),
        Pq.adc(model, query, Pq.encode(model, F.col("vec"))).as("dist"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qq = quant(query, 2.0)
    val codes = df.select(F.col("id"),
        Pq.encode(model, F.col("vec")).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (id, _) =>
      val code = codes(id)
      val want = (0 until 2).map { j =>
        val c = model.codebooks(j)(code(j))
        (0 until 4).map { t =>
          val diff = qq(j * 4 + t) - c(t); diff * diff
        }.sum
      }.sum
      assert(got(id) == want, s"id $id")
      assert((0 until 2).map(j => table(j)(code(j))).sum == want)
    }
  }

  test("wrong-length and out-of-range inputs degrade to NULL") {
    import spark.implicits._
    val rows = randomRows(10, 8, seed = 9)
    val model = Pq.fit(rows.toDF("id", "vec"), "id", "vec", 2, 2, 1)
    // wrong-dim vector → NULL code
    val shortVec = Seq((1L, Seq(0.1f, 0.2f)))
      .toDF("id", "vec")
      .select(Pq.encode(model, F.col("vec")).as("code")).collect()
    assert(shortVec(0).isNullAt(0))
    // wrong-length / out-of-range codes → NULL distance
    val q = rows.head._2
    val bad = Seq((1L, Seq(0, 1, 0)), (2L, Seq(5, 0)), (3L, Seq(-1, 0)))
      .toDF("id", "code")
      .select(Pq.adc(model, q, F.col("code")).as("dist")).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("topK finds the planted neighborhood on separable blobs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // two tight blobs far apart; queries from blob A must return blob A
    def blob(center: Float, fromId: Long, n: Int) =
      (0 until n).map(i => (fromId + i,
        Seq.fill(16)(center + rnd.nextFloat() * 0.02f)))
    val rows = blob(-0.5f, 0L, 30) ++ blob(0.5f, 100L, 30)
    val df = rows.toDF("id", "vec")
    val model = Pq.fit(df, "id", "vec", m = 4, k = 4, iters = 3)
    val codes = df.select(F.col("id"), Pq.encode(model, F.col("vec")).as("code"))
    val top = Pq.topK(model, codes, "id", "code", rows(3)._2, 10)
      .collect().map(_.getLong(0))
    assert(top.length == 10 && top.forall(_ < 100L),
      s"expected blob-A ids, got ${top.mkString(",")}")
    // plan shape: the scan must be a TakeOrderedAndProject, not a sort
    val plan = Pq.topK(model, codes, "id", "code", rows(3)._2, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("codes stay in range and compress 16x at realistic parameters") {
    import spark.implicits._
    val rows = randomRows(256, 64, seed = 77)
    val df = rows.toDF("id", "vec")
    // m=16, k=256: the literal-argmin alternative would be 4096
    // codegen'd fold expressions — the native loop takes it in stride
    val model = Pq.fit(df, "id", "vec", m = 16, k = 256, iters = 1)
    val codes = df.select(Pq.encode(model, F.col("vec")).as("code"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 16 && c.forall(x => x >= 0 && x < 256)))
  }
}
