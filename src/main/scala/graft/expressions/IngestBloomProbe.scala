package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** The ingest-split gate of the GraphStore merge, as ONE codegen'd
  * expression: `ingest_bloom_probe(dirKey, rowHash)` answers "might this
  * row already exist in its target directory?" —
  *
  *   existing(dirKey) && blooms.get(dirKey).forall(_.mightContainLong(h))
  *
  * i.e. a row whose directory does not exist, or whose directory bloom
  * definitely excludes its hash, is NEW without any store read; only
  * `true` rows pay the verify anti-join. Replaces the interpreted Scala
  * UDF that evaluated this per row with boxing and closure dispatch
  * (guide §4: prefer native expressions in per-row hot paths) — THE
  * per-row gate of continuous ingest.
  *
  * The directory-key set and per-directory blooms arrive as broadcasts
  * (one copy per executor, exactly what the UDF closure shipped); the
  * probe maps are materialized lazily per deserialized instance with
  * UTF8String keys so the per-row lookup allocates nothing.
  *
  * Null semantics match the UDF: a NULL key or hash yields FALSE (row
  * treated as definitely new), never NULL — the split below negates the
  * result, and a NULL would silently drop the row from BOTH branches. */
case class IngestBloomProbe(key: Expression, hash: Expression,
    existing: Broadcast[Set[String]],
    blooms: Broadcast[Map[String, BloomFilter]])
    extends BinaryExpression {

  override def left: Expression = key
  override def right: Expression = hash
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "ingest_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, hash.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (k, h) => TypeCheckResult.TypeCheckFailure(
        s"ingest_bloom_probe needs (string, bigint), got " +
          s"${k.catalogString}, ${h.catalogString}")
    }

  @transient private lazy val existingSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    existing.value.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }
  @transient private lazy val bloomMap
      : java.util.HashMap[UTF8String, BloomFilter] = {
    val m = new java.util.HashMap[UTF8String, BloomFilter]()
    blooms.value.foreach { case (k, b) =>
      m.put(UTF8String.fromString(k), b)
    }
    m
  }

  /** The per-row probe (also the codegen entry point). */
  def probe(k: UTF8String, h: Long): Boolean = {
    if (!existingSet.contains(k)) return false
    val b = bloomMap.get(k)
    b == null || b.mightContainLong(h)
  }

  override def eval(input: InternalRow): Any = {
    val k = key.eval(input)
    if (k == null) return false
    val h = hash.eval(input)
    if (h == null) return false
    probe(k.asInstanceOf[UTF8String], h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ibp", this,
      classOf[IngestBloomProbe].getName)
    val kEv = key.genCode(ctx)
    val hEv = hash.genCode(ctx)
    val code =
      code"""
        ${kEv.code}
        boolean ${ev.value} = false;
        if (!${kEv.isNull}) {
          ${hEv.code}
          if (!${hEv.isNull}) {
            ${ev.value} = $ref.probe(${kEv.value}, ${hEv.value});
          }
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IngestBloomProbe =
    copy(key = newLeft, hash = newRight)
}
