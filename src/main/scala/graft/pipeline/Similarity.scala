package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single narrow scan + TakeOrdered,
  * exact, O(n·d) per query. Scale path: sign-bit LSH bucketing (random
  * hyperplanes derived deterministically from xxhash64, no RNG state to
  * ship) or IVF-style seed partitioning — both turn top-k into a bucket
  * scan, trading recall for a ~buckets× scan reduction.
  */
object Similarity {

  /** Dot product of two float-array columns (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    F.aggregate(F.zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      F.lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  /** Cosine similarity — evaluated by the native
    * [[graft.expressions.CosineSim]] expression (one allocation-free
    * pass over both vectors inside whole-stage codegen); bit-identical
    * to the composed form below (PipelineSpec parity). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.CosineSim(
        graft.expressions.ColumnBridge.expression(a),
        graft.expressions.ColumnBridge.expression(b)))

  /** The `functions._`-composed reference form of [[cosine]]. */
  private[graft] def cosineComposed(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))
  }

  /** Exact brute-force top-k by cosine against one query vector.
    * `orderBy(desc).limit(k)` plans as TakeOrderedAndProject: per-partition
    * top-k then a k-row merge on the driver — no full sort, no shuffle of
    * the corpus. */
  def bruteForceTopK(corpus: DataFrame, id: String, vec: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = F.typedlit(query)
    corpus.select(F.col(id), cosine(F.col(vec), q).as("cosine"))
      .orderBy(F.col("cosine").desc, F.col(id))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component: plane `p`,
    * dimension `d` → value in [-0.5, 0.5). xxhash64-derived, so every
    * executor materializes identical planes with zero coordination. */
  private def planeComponent(p: Int, d: Column): Column =
    (F.pmod(F.xxhash64(F.lit(p), d), F.lit(1000000L)).cast(DoubleType) /
      1000000.0) - 0.5

  /** Sign-bit LSH bucket id: for each of `planes` hyperplanes, the sign of
    * the projection; packed into a long. Vectors in the same bucket are
    * likely cosine-close (random-hyperplane LSH). */
  def signBits(vec: Column, planes: Int): Column = {
    val proj = (0 until planes).map { p =>
      val s = F.aggregate(
        F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1),
          (x, i) => x.cast(DoubleType) * planeComponent(p, i)),
        F.lit(0.0), (acc, x) => acc + x)
      F.when(s >= 0, F.shiftleft(F.lit(1L), p)).otherwise(F.lit(0L))
    }
    proj.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: scan only the query's bucket (and
    * optionally Hamming-1 neighbor buckets via `probes`). Recall < 1,
    * corpus scan ÷ 2^planes. */
  def lshTopK(corpus: DataFrame, id: String, vec: String,
      query: Seq[Float], k: Int, planes: Int = 6, probes: Int = 1): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", signBits(F.col(vec), planes))
    val qdf = corpus.sparkSession.range(1)
      .select(F.typedlit(query).as("qv"))
      .select(signBits(F.col("qv"), planes).as("qb")).collect()
    val qBucket = qdf(0).getLong(0)
    val targets: Seq[Long] =
      if (probes <= 1) Seq(qBucket)
      else qBucket +: (0 until planes).map(p => qBucket ^ (1L << p))
    val q = F.typedlit(query)
    bucketed.where(F.col("__bucket").isin(targets: _*))
      .select(F.col(id), cosine(F.col(vec), q).as("cosine"))
      .orderBy(F.col("cosine").desc, F.col(id))
      .limit(k)
  }

  /** IVF (inverted-file) approximate top-k against a PRE-FIT [[IvfIndex]]:
    * the query runs zero fitting jobs — it ranks the quantizer centroids
    * driver-side (nlist tiny) and scans only the `nprobe` nearest lists
    * (corpus scan ÷ nlist·nprobe⁻¹, or a partition-pruned read when the
    * assignment is stored partitioned by list — see [[IvfIndex.fit]]). */
  def ivfTopK(index: IvfIndex, query: Seq[Float], k: Int,
      nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.linalg.Vectors
    val qv = Vectors.dense(query.map(_.toDouble).toArray)
    val probeLists = index.centers.zipWithIndex
      .sortBy { case (c, _) => Vectors.sqdist(c, qv) }
      .take(nprobe).map(_._2.toLong).toSeq
    val q = F.typedlit(query)
    index.assigned.where(F.col("__list").isin(probeLists: _*))
      .select(F.col(index.id), cosine(F.col(index.vec), q).as("cosine"))
      .orderBy(F.col("cosine").desc, F.col(index.id))
      .limit(k)
  }

  /** One-shot convenience: fit + single query. For repeated queries fit
    * the index once ([[IvfIndex.fit]]) — refitting the quantizer per
    * query is the one thing an IVF index must never do. */
  def ivfTopK(corpus: DataFrame, id: String, vec: String,
      query: Seq[Float], k: Int, nlist: Int, nprobe: Int): DataFrame =
    ivfTopK(IvfIndex.fit(corpus, id, vec, nlist), query, k, nprobe)

  /** Fit-once IVF index (queried via [[ivfTopK]]). Holds the centroid
    * list assignment of every corpus vector plus the quantizer centroids;
    * queries never re-fit. */
  /** Symmetric per-vector int8 scalar quantization: embeddings shrink 4×
    * (the standard storage/IO lever before ANN at 100 TB — scan 25 TB
    * instead of 100). The per-vector scale rides along; reconstruction
    * error is bounded by scale/2 per component. Narrow map, no shuffle.
    * Returns struct(q: array<tinyint>, scale: double). */
  def quantizeInt8(vec: Column): Column =
    graft.expressions.ColumnBridge.column(
      graft.expressions.QuantizeInt8(
        graft.expressions.ColumnBridge.expression(vec)))

  /** The `functions._`-composed reference form of [[quantizeInt8]] —
    * kept for the parity test. NOTE its lambda embeds the array_max
    * subtree, re-evaluating the scale per ELEMENT (O(d²) per row) —
    * the reason the pipeline path is the native expression. */
  private[graft] def quantizeInt8Composed(vec: Column): Column = {
    val scale =
      F.array_max(F.transform(vec, x => F.abs(x.cast(DoubleType)))) / 127.0
    F.struct(
      F.when(scale > 0, F.transform(vec,
          x => F.round(x.cast(DoubleType) / scale, 0).cast(ByteType)))
        .otherwise(F.transform(vec, _ => F.lit(0).cast(ByteType))).as("q"),
      scale.as("scale"))
  }

  /** Inverse of [[quantizeInt8]]: approximate float reconstruction. */
  def dequantizeInt8(qv: Column): Column =
    F.transform(qv.getField("q"),
      x => x.cast(DoubleType) * qv.getField("scale"))

  final class IvfIndex private[pipeline] (
      /** corpus + `__list` (long) — the coarse-quantizer cell id. */
      val assigned: DataFrame,
      val centers: Array[org.apache.spark.ml.linalg.Vector],
      val id: String, val vec: String) {
    /** Pin the assignment (local/bench analogue of writing it out
      * partitioned by `__list`). */
    def persist(): IvfIndex = { assigned.persist(); this }
    def unpersist(): IvfIndex = { assigned.unpersist(); this }
  }

  object IvfIndex {
    /** Observability for tests: total quantizer fits ever run — queries
      * against a fitted index must not move it. */
    val fits = new java.util.concurrent.atomic.AtomicLong

    /** Fit the coarse quantizer ONCE (optionally on a sample — at 100 TB
      * k-means never sees the full corpus) and assign every vector to its
      * nearest centroid list in one narrow map. The scale deployment
      * writes `assigned` out partitioned by `__list` so a probe becomes a
      * partition-pruned scan; locally `persist()` serves the same role. */
    def fit(corpus: DataFrame, id: String, vec: String, nlist: Int = 16,
        sampleFraction: Double = 1.0, seed: Long = 42): IvfIndex = {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      fits.incrementAndGet()
      val fv = corpus.select(F.col(id), F.col(vec))
        .withColumn("__fv", array_to_vector(F.col(vec)))
      val train =
        if (sampleFraction >= 1.0) fv
        else fv.sample(withReplacement = false, sampleFraction, seed)
      val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
        .setFeaturesCol("__fv").setPredictionCol("__list")
        .fit(train.select("__fv"))
      new IvfIndex(model.transform(fv).drop("__fv"),
        model.clusterCenters, id, vec)
    }
  }

  /** All-pairs k-NN join (each left row → top-k right rows by cosine)
    * via LSH co-bucketing; exact within bucket. For the exact small-side
    * case broadcast the right side and use bruteForce per-row instead. */
  def knnJoin(left: DataFrame, right: DataFrame, idL: String, idR: String,
      vecL: String, vecR: String, k: Int, planes: Int = 4): DataFrame = {
    val l = left.select(F.col(idL).as("lid"), F.col(vecL).as("lv"))
      .withColumn("bucket", signBits(F.col("lv"), planes))
    val r = right.select(F.col(idR).as("rid"), F.col(vecR).as("rv"))
      .withColumn("bucket", signBits(F.col("rv"), planes))
    val joined = l.join(r, "bucket")
      .withColumn("cosine", cosine(F.col("lv"), F.col("rv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lid").orderBy(F.col("cosine").desc, F.col("rid"))
    joined.withColumn("__rank", F.row_number().over(w))
      .where(F.col("__rank") <= k)
      .select(F.col("lid"), F.col("rid"), F.col("cosine"))
  }
}
