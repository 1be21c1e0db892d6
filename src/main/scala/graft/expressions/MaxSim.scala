package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ColBERT-style late-interaction relevance (Khattab & Zaharia 2020):
  * `max_sim(docVecs, queryVecs)` scores a document's token-embedding
  * matrix against a query's — for every query vector, the best cosine
  * over the document's vectors, summed:
  * {{{ Σ_q max_d cos(q, d) }}}
  * The retrieval model between single-vector cosine (one embedding per
  * doc, loses token detail) and cross-encoders (pairwise inference,
  * can't scan): still a NARROW per-row scan an engine can run over a
  * corpus, with top-k via TakeOrderedAndProject — no shuffle, no UDF.
  *
  * Cost per row is |Q|·|D|·dim multiply-adds in one allocation-free
  * codegen'd loop. Empty doc matrices score 0 per query vector (max
  * over nothing = 0 — the [[CosineSim]] degenerate-contract value);
  * null element vectors contribute cosine 0 like CosineSim; a NULL
  * matrix on either side → NULL. */
case class MaxSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"max_sim needs two array<array<float|double>>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private lazy val lFloat = left.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rFloat = right.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "max_sim"

  override def nullSafeEval(docs: Any, query: Any): Any =
    MaxSim.score(docs.asInstanceOf[ArrayData], lFloat,
      query.asInstanceOf[ArrayData], rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, q) =>
      s"graft.expressions.MaxSim.score($d, $lFloat, $q, $rFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MaxSim = copy(left = newLeft, right = newRight)
}

object MaxSim {

  /** Σ over query vectors of the max cosine against the doc vectors. */
  def score(docs: ArrayData, dFloat: Boolean,
      query: ArrayData, qFloat: Boolean): Double = {
    val nq = query.numElements()
    val nd = docs.numElements()
    var total = 0.0
    var qi = 0
    while (qi < nq) {
      // true max (can be negative, per the paper); no usable doc
      // vector → 0 for this query vector
      var best = Double.NegativeInfinity
      var found = false
      if (!query.isNullAt(qi)) {
        val q = query.getArray(qi)
        var di = 0
        while (di < nd) {
          if (!docs.isNullAt(di)) {
            val c = CosineSim.cosine(docs.getArray(di), dFloat, q, qFloat)
            if (!found || c > best) { best = c; found = true }
          }
          di += 1
        }
      }
      total += (if (found) best else 0.0)
      qi += 1
    }
    total
  }
}
