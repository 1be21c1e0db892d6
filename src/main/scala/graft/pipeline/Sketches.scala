package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

import graft.expressions.{CmsAgg, ColumnBridge}

/** Mergeable-sketch operators. HLL distinct counts and quantile
  * sketches ride on Spark's own `approx_count_distinct` /
  * `approx_percentile` (q_approx_distinct / q_approx_quantile); this
  * object adds the frequency side: a Count-Min sketch aggregate and the
  * exact heavy-hitter scan it enables.
  *
  * The 100 TB shape of `heavyHitters`: a naive `groupBy(token)` over a
  * corpus's tokens shuffles EVERY token occurrence — the full corpus,
  * reorganized, to find the handful of terms above threshold. Here pass
  * 1 folds the corpus into one `depth × width` counter matrix
  * (map-side partial aggregation does almost all the work; only
  * per-partition sketches move), and pass 2 re-scans with a NARROW
  * probe of the broadcast sketch, shuffling only rows whose estimate
  * clears the threshold. Count-Min never under-counts, so the
  * prefilter has NO false negatives and the final exact count + HAVING
  * makes the result EXACTLY `{token : true_count ≥ minCount}` — the
  * sketch affects cost, never the answer (a plain GROUP BY … HAVING
  * oracle restates it). */
object Sketches {

  /** Count-Min sketch of a string column as one aggregate job: the
    * row-major `depth × width` counter matrix ([[CmsAgg]] — merge is
    * element-wise addition, so the matrix is bit-identical under any
    * partitioning). Sized ~`depth·width·8` bytes on the driver; keep
    * `width` at the default few-K for a prefilter (error ≤ 2n/width
    * with probability 1 − 2^−depth). */
  def cmsSketch(df: DataFrame, col: String, depth: Int = 4,
      width: Int = 4096, md5Buckets: Boolean = true): Array[Long] = {
    val sketch = ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(F.col(col)), depth, width, md5Buckets)
        .toAggregateExpression())
    df.agg(sketch.as("m")).head().getSeq[Long](0).toArray
  }

  /** Narrow Count-Min point estimate of a token column against a
    * fitted sketch: `min` over the depth rows of the broadcast-literal
    * matrix, each bucket the same md5 recipe the aggregate used
    * (restatable in SQL: `conv(substr(md5(tok || '#' || d), 1, 15),
    * 16, 10) % width`). Never under the true count. */
  def cmsEstimate(tok: Column, sketch: Array[Long], depth: Int = 4,
      width: Int = 4096, md5Buckets: Boolean = true): Column = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    val lit = F.typedlit(sketch.toSeq)
    val rows = (0 until depth).map { d =>
      val bucket =
        if (md5Buckets)
          F.conv(F.substring(
            F.md5(F.concat(tok, F.lit("#" + d))), 1, 15), 16, 10)
            .cast(LongType) % width
        else // the fast production recipe — must match CmsAgg.bucket
          F.pmod(F.xxhash64(F.concat(tok, F.lit("#" + d))), F.lit(width.toLong))
      F.element_at(lit, (F.lit(d * width) + bucket + 1).cast(IntegerType))
    }
    if (rows.length == 1) rows.head else F.least(rows: _*)
  }

  /** EXACT heavy hitters of a string column: every value occurring at
    * least `minCount` times, with its exact count — computed in two
    * passes (sketch fold + estimate-gated exact count, see the object
    * doc) so the shuffle carries only plausible candidates instead of
    * the whole corpus. Returns (item, cnt), exact and deterministic:
    * identical to `GROUP BY item HAVING count(*) >= minCount`. */
  def heavyHitters(df: DataFrame, col: String, minCount: Long,
      depth: Int = 4, width: Int = 4096,
      md5Buckets: Boolean = true): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val sk = cmsSketch(df, col, depth, width, md5Buckets)
    df.where(F.col(col).isNotNull &&
        cmsEstimate(F.col(col), sk, depth, width, md5Buckets) >= minCount)
      .groupBy(F.col(col).as("item"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .where(F.col("cnt") >= minCount)
  }
}
