package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving key: `zorder_key(c1, …, ck)` packs the
  * low bits of 2–4 non-negative integral columns into one long whose
  * ordering clusters rows that are close in EVERY dimension — sort or
  * range-partition by it and a multi-column box predicate touches only
  * the files/row-groups whose min/max straddle the box, instead of the
  * single-sort-column layout where a predicate on any OTHER column
  * scans everything (the data-skipping layout of Delta's OPTIMIZE
  * ZORDER and friends).
  *
  * Bit budget: ⌊64/k⌋ low bits per column (32/21/16 for k = 2/3/4),
  * column i's bit b landing at output bit `b·k + i` — LSB-first
  * round-robin, the standard Morton layout. Inputs must already be
  * non-negative (scale/offset upstream; `Tables.writeZordered` does
  * linear min-max scaling); bits above the budget are ignored. Any
  * NULL input → NULL key. The k = 2 path is the magic-number spread —
  * five mask/shift rounds per operand — and restates in SQL, so an
  * oracle can regenerate keys bit-exactly. */
case class ZorderKey(children: Seq[Expression]) extends Expression {
  require(children.size >= 2 && children.size <= 4,
    s"zorder_key takes 2-4 columns, got ${children.size}")

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(c => c.dataType != LongType && c.dataType != IntegerType)
      .map(c => TypeCheckResult.TypeCheckFailure(
        s"zorder_key needs integral columns, got ${c.dataType.catalogString}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Integer => n.longValue()
        case other => other.asInstanceOf[Long]
      }
      i += 1
    }
    ZorderKey.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val args = evals.map(e => s"(long) ${e.value}").mkString(", ")
    val code = code"""
      ${evals.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expressions.ZorderKey.interleave${children.size}($args);
      }
    """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZorderKey = copy(children = newChildren)
}

object ZorderKey {

  /** Spread the low 32 bits of `v` to the even bit positions — the
    * standard five-round magic-number dilation, restatable in SQL. */
  def spread2(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave2(a: Long, b: Long): Long =
    spread2(a) | (spread2(b) << 1)

  def interleave3(a: Long, b: Long, c: Long): Long = {
    var out = 0L
    var bit = 0
    while (bit < 21) {
      out |= ((a >> bit) & 1L) << (bit * 3)
      out |= ((b >> bit) & 1L) << (bit * 3 + 1)
      out |= ((c >> bit) & 1L) << (bit * 3 + 2)
      bit += 1
    }
    out
  }

  def interleave4(a: Long, b: Long, c: Long, d: Long): Long = {
    var out = 0L
    var bit = 0
    while (bit < 16) {
      out |= ((a >> bit) & 1L) << (bit * 4)
      out |= ((b >> bit) & 1L) << (bit * 4 + 1)
      out |= ((c >> bit) & 1L) << (bit * 4 + 2)
      out |= ((d >> bit) & 1L) << (bit * 4 + 3)
      bit += 1
    }
    out
  }

  def interleave(vals: Array[Long]): Long = vals.length match {
    case 2 => interleave2(vals(0), vals(1))
    case 3 => interleave3(vals(0), vals(1), vals(2))
    case _ => interleave4(vals(0), vals(1), vals(2), vals(3))
  }
}
