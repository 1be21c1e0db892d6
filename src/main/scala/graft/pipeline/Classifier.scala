package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Model-based quality scoring trained IN the engine: deterministic
  * distributed logistic regression — the FineWeb-Edu-style classifier
  * gate, fit with full-batch gradient descent where each iteration is
  * ONE map-side-combined aggregate over the corpus (the only
  * corpus-sized stage; the weight update is k+1 integers on the
  * driver).
  *
  * Exactness contract (the scaled-integer discipline of
  * [[Graphs.pageRank]] / [[Clustering.kmeans]] applied to learning):
  *
  *  - weights live as integer millionths; the float view `W / 10⁶` is
  *    exact IEEE division both engines reproduce;
  *  - the link is the RATIONAL "fast sigmoid"
  *    `p = 0.5 + m / (2·(1 + |m|))` — plain arithmetic, bit-identical
  *    everywhere, unlike `exp` whose libm differs across engines;
  *  - per-row gradient contributions quantize to integer millionths
  *    (`floor(err · x · 10⁶)`) before the SUM, so accumulation is
  *    order-free integer addition;
  *  - the update `W -= (lrNum · G) / (lrDen · n)` is integer division
  *    truncating toward zero — the shared semantics of Scala `Long`
  *    division, Spark `div`, and DuckDB `//`.
  *
  * A SQL oracle therefore unrolls training EXACTLY, iteration by
  * iteration. Callers scale features to O(1) magnitudes (per-row
  * quantized contributions must stay far under 2⁶³/n; ratios and
  * length/1000-style features do). */
object Classifier {
  private val Scale = 1000000L

  /** Trained model: integer-millionth weights, bias LAST. */
  final case class LogisticModel(featureCols: Seq[String],
      weightsScaled: Seq[Long], biasScaled: Long) {
    def weights: Seq[Double] = weightsScaled.map(_.toDouble / Scale)
    def bias: Double = biasScaled.toDouble / Scale
  }

  /** `0.5 + m / (2·(1 + |m|))` — strictly increasing, range (0, 1). */
  private def fastSigmoid(m: Column): Column =
    F.lit(0.5) + m / (F.lit(2.0) * (F.lit(1.0) + F.abs(m)))

  /** Margin in the documented composition order: bias first, then one
    * `+ wⱼ·xⱼ` per feature in `featureCols` order (left-associated —
    * the order a SQL restatement uses). */
  private def margin(m: LogisticModel): Column =
    m.featureCols.zip(m.weightsScaled).foldLeft(
      F.lit(m.biasScaled.toDouble / Scale): Column) { case (acc, (c, w)) =>
      acc + F.lit(w.toDouble / Scale) * F.col(c)
    }

  /** Fit `iters` full-batch GD steps from zero weights with learning
    * rate `lrNum/lrDen`. `labelCol` must be 0.0/1.0. One aggregate job
    * per iteration. */
  def trainLogistic(df: DataFrame, labelCol: String,
      featureCols: Seq[String], iters: Int = 3,
      lrNum: Long = 1L, lrDen: Long = 10L): LogisticModel = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(iters >= 1 && iters <= 1000, s"iters must be in [1,1000], got $iters")
    require(lrNum > 0 && lrDen > 0, "learning rate must be positive")
    val n = df.count()
    require(n > 0, "empty training frame")
    val w = new Array[Long](featureCols.size + 1) // bias last, all zero
    var it = 0
    while (it < iters) {
      val model = LogisticModel(featureCols, w.init.toSeq, w.last)
      val err = fastSigmoid(margin(model)) -
        F.col(labelCol).cast(DoubleType)
      val aggs = featureCols.map(c =>
        F.sum(F.floor(err * F.col(c) * Scale).cast(LongType))) :+
        F.sum(F.floor(err * Scale).cast(LongType))
      val g = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      var j = 0
      while (j < w.length) {
        w(j) = w(j) - (lrNum * g.getLong(j)) / (lrDen * n)
        j += 1
      }
      it += 1
    }
    LogisticModel(featureCols, w.init.toSeq, w.last)
  }

  /** Narrow scoring column: the model's probability, rounded to 6 so
    * engines and oracles hash-match. No join, no shuffle. */
  def score(model: LogisticModel): Column =
    F.round(fastSigmoid(margin(model)), 6)
}
