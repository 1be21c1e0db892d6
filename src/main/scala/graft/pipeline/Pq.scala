package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._
import graft.expressions.{ColumnBridge, PqAdc, PqEncode}

/** Product quantization (Jégou et al. 2011) over embedding columns —
  * the compression layer that makes 100 TB embedding search
  * memory-bound-feasible: a d-dim float vector (4·d bytes) becomes `m`
  * centroid indexes (m bytes at k ≤ 256), a 16× shrink at d=64, m=16,
  * and a query then scans CODES with integer table lookups instead of
  * floats (asymmetric distance, ADC). Composes with
  * [[Similarity.IvfIndex]]: coarse lists prune the scan, PQ shrinks
  * what's left.
  *
  * Exactness contract (the [[Clustering]] discipline in every stage):
  * components quantize ONCE to scaled integers, codebooks come out of
  * integer Lloyd updates (sum // count, floor), assignment ties break
  * to the lowest centroid index, and ADC is integer adds — results are
  * bit-identical across partitionings and engines, so an SQL oracle
  * unrolls fit, encode, AND the query scan exactly.
  *
  * Scale shape of [[fit]]: per iteration, assignment is ONE narrow
  * codegen'd pass (the same [[graft.expressions.PqEncode]] loop a
  * 100 TB encode run uses — no literal-expansion blowup at m·k=4096)
  * and the update is one posexplode + map-side-combined integer SUM
  * collecting m·k·subDim rows. [[encode]] and [[topK]]'s scan are
  * narrow; [[topK]] plans as TakeOrderedAndProject (no full sort). */
object Pq {
  private val Scale = 1000000L

  /** A fitted quantizer: `m` codebooks of `k` centroids in the shared
    * quantized integer space (`floor((x + offset) · 10⁶)`). */
  final case class Model(m: Int, k: Int, subDim: Int, offset: Double,
      codebooks: Seq[Seq[Seq[Long]]]) {
    require(codebooks.length == m && codebooks.forall(_.length == k) &&
      codebooks.forall(_.forall(_.length == subDim)), "bad codebook shape")

    /** Exact integer ADC table for one query: `table[j][c]` = squared
      * distance from the query's j-th sub-vector to centroid c. */
    def adcTable(query: Seq[Float]): Seq[Seq[Long]] = {
      require(query.length == m * subDim,
        s"query dim ${query.length} != ${m * subDim}")
      val q = query.map(x => math.floor((x.toDouble + offset) * Scale).toLong)
      Seq.tabulate(m) { j =>
        Seq.tabulate(k) { c =>
          var s = 0L
          var t = 0
          while (t < subDim) {
            val diff = q(j * subDim + t) - codebooks(j)(c)(t)
            s += diff * diff
            t += 1
          }
          s
        }
      }
    }
  }

  /** Narrow encode: vector → `m` codebook indexes (`array<int>`). */
  def encode(model: Model, vec: Column): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec),
      model.codebooks, model.offset))

  /** Narrow ADC distance of a code column to `query` (integer squared
    * distance in the quantized space; smaller = nearer). */
  def adc(model: Model, query: Seq[Float], code: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(code),
      model.adcTable(query)))

  /** Fixed-iteration per-subspace Lloyd's. Init = sub-vectors of the
    * `k` smallest ids (deterministic); an emptied cluster keeps its
    * previous centroid; `offset` must make components non-negative
    * (2.0 covers unit-normalized embeddings) so integer division is
    * floor division in every engine. */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      iters: Int = 2, offset: Double = 2.0): Model = {
    require(m >= 1 && m <= 64, s"m must be in [1,64], got $m")
    require(k >= 1 && k <= 256, s"k must be in [1,256], got $k")
    require(iters >= 1 && iters <= 100, s"iters must be in [1,100], got $iters")
    val base = df.select(F.col(idCol).as("id"),
        Clustering.quantize(F.col(vecCol), offset).as("q"),
        F.col(vecCol).as("v"))
      .localCheckpoint(false)

    val init = base.orderBy(F.col("id")).limit(k)
      .select(F.col("q")).collect().map(_.getSeq[Long](0))
    require(init.nonEmpty, "pq fit needs at least one row")
    val d = init.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    require(init.forall(_.length == d), "ragged vector dims")
    // rows with any other dimension are IGNORED (matching PqEncode's
    // wrong-length → NULL degrade) rather than poisoning the update
    // aggregate with null cluster ids
    val sized = base.where(F.size(F.col("v")) === d)

    // codebooks[j][c] = centroid c of subspace j; short corpora (< k
    // rows) repeat the last init vector so shapes stay rectangular
    var codebooks: Array[Array[Array[Long]]] = Array.tabulate(m) { j =>
      Array.tabulate(k) { c =>
        val row = init(math.min(c, init.length - 1))
        row.slice(j * subDim, (j + 1) * subDim).toArray
      }
    }
    def toSeq(cb: Array[Array[Array[Long]]]): Seq[Seq[Seq[Long]]] =
      cb.map(_.map(_.toSeq).toSeq).toSeq

    var it = 0
    while (it < iters) {
      // ONE narrow assignment pass + ONE (j, cluster, pos) aggregate:
      // pos → subspace by index arithmetic, cluster via element_at
      val enc = encode(Model(m, k, subDim, offset, toSeq(codebooks)),
        F.col("v"))
      val stats = sized.select(enc.as("code"),
          F.posexplode(F.col("q")).as(Seq("pos", "x")))
        .select(
          (F.col("pos") / subDim).cast(IntegerType).as("j"),
          F.element_at(F.col("code"),
            (F.col("pos") / subDim).cast(IntegerType) + 1).as("c"),
          (F.col("pos") % subDim).as("spos"), F.col("x"))
        .groupBy("j", "c", "spos")
        .agg(F.sum(F.col("x")).as("s"), F.count(F.lit(1)).as("n"))
        .collect()
      val next = codebooks.map(_.map(_.clone())) // empty cluster → previous
      stats.foreach { r =>
        val (j, c, sp) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next(j)(c)(sp) = r.getLong(3) / r.getLong(4) // non-negative → floor
      }
      codebooks = next
      it += 1
    }
    Model(m, k, subDim, offset, toSeq(codebooks))
  }

  /** Top-k nearest codes to `query` by ADC: a narrow integer-lookup
    * scan + TakeOrderedAndProject, ties broken by id. Returns
    * (idCol, dist). */
  def topK(model: Model, codes: DataFrame, idCol: String, codeCol: String,
      query: Seq[Float], k: Int): DataFrame =
    codes.select(F.col(idCol),
        adc(model, query, F.col(codeCol)).as("dist"))
      .where(F.col("dist").isNotNull)
      .orderBy(F.col("dist"), F.col(idCol))
      .limit(k)
}
